"""Sentinel-null cleaning and safe casts — the reference's signature scalar semantics.

Capability parity (behavior, not code) with the reference record mapper:

* ``is_missing`` / ``clean_sentinels``  ≅ reference ``etl/mappers/directory.py:30-52``
  (``_is_missing``): IPEDS sentinel codes -1 (missing), -2 (not
  applicable), -3 (suppressed) — as numbers or as trimmed strings —
  plus NULL and empty/whitespace-only strings all normalize to NULL.
  Policy documented at reference ``architecture.md:178-184``.
* ``safe_int`` ≅ ``_to_int`` (``directory.py:70-87``): int or NULL,
  tolerates surrounding whitespace, malformed input → NULL, never an
  error. Python ``int("12.5")`` raises → reference yields NULL; we
  pin the same behavior with an integer-regex guard (a bare
  ``cast('12.5' as int)`` would give 12 — documented corner, tested).
* ``safe_double`` ≅ ``_to_float`` (``directory.py:89-105``).
* ``safe_str`` ≅ ``_to_str`` (``directory.py:108-119``): trimmed
  string; empty-after-trim → NULL.
* ``coalesce_pick`` ≅ ``_pick`` (``directory.py:55-67``): first
  candidate column whose value is NOT missing — each branch is
  sentinel-cleaned *before* coalescing, so a sentinel in the preferred
  key falls through to a real value in a fallback key.
* ``stable_hash`` ≅ ``_stable_json_hash`` (``etl/raw_io.py:57-70``):
  deterministic content hash of a record built from canonical
  (key-sorted, compact) JSON. The reference uses sha1; DuckDB (our
  correctness oracle) lacks sha1, so the engine standardizes on
  sha2-256 — the semantic contract (stable under field reordering,
  changes iff content changes) is unchanged.

All of these are Column-in/Column-out builders over built-in functions:
they inline into whole-stage codegen and cost nothing extra at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: IPEDS sentinel codes meaning missing / not-applicable / suppressed.
#: The float string forms cover numeric DOUBLE columns whose values
#: stringify as "-1.0" (the reference's check is numeric ``v in
#: (-1,-2,-3)`` for numbers; known documented corner: the *string*
#: "-1.0" is also treated as a sentinel here, where the reference's
#: string check is exact-match on "-1"/"-2"/"-3").
SENTINEL_STRINGS = ("-1", "-2", "-3", "-1.0", "-2.0", "-3.0")
SENTINEL_INTS = (-1, -2, -3)

#: Regex accepted by ``safe_int``: optional sign, digits only (after trim).
_INT_RE = r"^[+-]?\d+$"


def is_missing(col: Column) -> Column:
    """Boolean Column: value is missing per IPEDS policy.

    True for NULL, empty/whitespace-only strings, and the sentinel
    codes -1/-2/-3 whether numeric or stringified (trimmed).
    Legitimate negatives (e.g. -4, or -122.4 longitude) are NOT missing.
    """
    s = F.trim(col.cast("string"))
    return col.isNull() | (s == "") | s.isin(*SENTINEL_STRINGS)


def clean_sentinels(col: Column) -> Column:
    """NULL out missing values, otherwise pass the value through unchanged."""
    return F.when(is_missing(col), F.lit(None)).otherwise(col)


def safe_int(col: Column) -> Column:
    """Sentinel-cleaned integer cast: int or NULL, never an error.

    Matches Python ``int(str)`` strictness: ``" 42 "`` → 42 but
    ``"12.5"``/``"1e3"``/``"abc"`` → NULL.
    """
    s = F.trim(clean_sentinels(col).cast("string"))
    return F.when(s.rlike(_INT_RE), s).otherwise(F.lit(None)).cast("int")


def safe_long(col: Column) -> Column:
    """``safe_int`` at BIGINT width."""
    s = F.trim(clean_sentinels(col).cast("string"))
    return F.when(s.rlike(_INT_RE), s).otherwise(F.lit(None)).cast("bigint")


def safe_double(col: Column) -> Column:
    """Sentinel-cleaned double cast: float or NULL, never an error.

    ``try_cast`` keeps null-on-malformed behavior even under an ANSI session.
    """
    return F.trim(clean_sentinels(col).cast("string")).try_cast("double")


def safe_str(col: Column) -> Column:
    """Sentinel-cleaned trimmed string: NULL if empty after trim."""
    return clean_sentinels(F.trim(col.cast("string")))


def coalesce_pick(*cols: Column) -> Column:
    """First non-missing candidate, with per-branch sentinel cleaning.

    The cleaning must happen inside each branch: a sentinel value in the
    preferred column is *skipped* and a later real value wins.
    """
    if not cols:
        raise ValueError("coalesce_pick requires at least one candidate column")
    return F.coalesce(*[clean_sentinels(c) for c in cols])


def canonical_json(*cols: Column | str, names: list[str] | None = None) -> Column:
    """Canonical JSON string of a record: fields in sorted-name order.

    ``to_json(struct(...))`` serializes fields in struct order, so we
    sort explicitly — hash stability under input field reordering is
    the contract.
    """
    if names is None:
        names = [c if isinstance(c, str) else str(c) for c in cols]
    pairs = sorted(zip(names, cols), key=lambda kv: kv[0])
    struct = F.struct(*[(F.col(c) if isinstance(c, str) else c).alias(n) for n, c in pairs])
    return F.to_json(struct)


def stable_hash(*cols: Column | str, names: list[str] | None = None) -> Column:
    """Deterministic sha2-256 hex content hash of the named columns.

    Stable under field-order permutation (fields are name-sorted before
    serialization); changes iff any value changes.
    """
    return F.sha2(canonical_json(*cols, names=names), 256)
