"""Paginated HTTP JSON ingest utility (driver-side, pre-engine).

Capability parity with the reference HTTP client (reference
``etl/http.py``): GET with N retries and exponential backoff 1s/2s/4s
(``:36-79``), page loop following ``next`` links — absolute or relative
— accumulating each page's ``results`` list (``:85-124``), and a
``1/rps`` sleep between page fetches (``:120-121``,
``etl/config.py:125``).

This is ingest plumbing, not a relational operator: the network is the
bottleneck by design (rate-limited API), so it stays driver-side and
hands records to Spark via ``spark.createDataFrame``. At real scale the
unit of parallelism is (endpoint, year): run many ingests concurrently
from a scheduler, one Spark load per year partition. The transport is
injectable so tests run fully offline.
"""

from __future__ import annotations

import json
import time
import urllib.parse
import urllib.request
from collections.abc import Callable

# Defaults live in config.Settings (env-overridable frozen object,
# ≅ reference etl/config.py:124-126); None params below resolve there.

Transport = Callable[[str], str]  # url -> response body (raises on failure)


def _urllib_transport(url: str) -> str:
    from ipeds_etl_spark.config import get_settings

    timeout = get_settings().request_timeout_seconds
    with urllib.request.urlopen(url, timeout=timeout) as resp:  # noqa: S310
        if resp.status >= 400:
            raise OSError(f"HTTP {resp.status} for {url}")
        return resp.read().decode("utf-8")


def get_with_retries(
    url: str,
    transport: Transport = _urllib_transport,
    max_retries: int | None = None,
    sleep: Callable[[float], None] = time.sleep,
) -> str:
    """GET with exponential backoff (1s, 2s, 4s…); raises after the last
    attempt fails."""
    if max_retries is None:
        from ipeds_etl_spark.config import get_settings

        max_retries = get_settings().max_retries
    last_exc: Exception | None = None
    for attempt in range(max_retries):
        try:
            return transport(url)
        except Exception as exc:  # noqa: BLE001 — retry any transport failure
            last_exc = exc
            if attempt < max_retries - 1:
                sleep(2.0**attempt)
    raise last_exc  # type: ignore[misc]


def fetch_endpoint_pages(
    base_url: str,
    endpoint_path: str,
    year: int,
    transport: Transport = _urllib_transport,
    rps: float | None = None,
    sleep: Callable[[float], None] = time.sleep,
) -> list[list[dict]]:
    """Fetch ALL pages for one (endpoint, year); returns the per-page
    ``results`` lists (page structure preserved for the raw layer).

    Follows ``next`` links, absolute or relative; rate-limits between
    page fetches.
    """
    if rps is None:
        from ipeds_etl_spark.config import get_settings

        rps = get_settings().rate_limit_rps
    path = endpoint_path.replace("{year}", str(year)).lstrip("/")
    url: str | None = urllib.parse.urljoin(base_url.rstrip("/") + "/", path)
    pages: list[list[dict]] = []
    while url:
        body = get_with_retries(url, transport=transport, sleep=sleep)
        data = json.loads(body)
        pages.append(list(data.get("results", [])))
        nxt = data.get("next")
        url = urllib.parse.urljoin(url, nxt) if nxt else None
        if url:
            sleep(1.0 / rps)
    return pages
