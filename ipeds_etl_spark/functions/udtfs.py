"""Python UDTF surface demo (Spark 4 ``pyspark.sql.functions.udtf``).

The engine's production paths never use row-at-a-time Python — chunking
ships as the pure-Column ``docs_chunk_windows`` query and media work as
Arrow ``mapInPandas``. This module exists to round out the API surface
(SURVEY §2.8: UDF/UDAF/UDTF): some user logic genuinely is an arbitrary
Python generator per row, and the table-function form is how Spark 4
expresses it. Keep such UDTFs OFF hot paths; they run one Python row at
a time (no Arrow batching for UDTFs as of Spark 4.1).
"""

from __future__ import annotations

from pyspark.sql.functions import lit, udtf


@udtf(returnType="chunk_id: int, chunk_text: string, n_tokens: int")
class ChunkDocument:
    """Yield overlapping whitespace-token chunks of one document.

    Equivalent semantics to the production ``docs_chunk_windows``
    Column pipeline (size/stride windows over the token array); kept
    deliberately tiny so tests can cross-check the two forms row for
    row.
    """

    def eval(self, text: str, size: int, stride: int):  # noqa: D102
        if text is None:
            return
        toks = [t for t in text.split() if t]
        if not toks:
            return
        i = 0
        cid = 0
        while i < len(toks):
            window = toks[i : i + size]
            yield cid, " ".join(window), len(window)
            if i + size >= len(toks):
                break
            i += stride
            cid += 1


def chunk_document(text_col, size: int, stride: int):
    """Lateral-join-ready invocation: ``df.lateralJoin(chunk_document(
    df.text, 128, 64))`` or ``ChunkDocument(lit(...))`` directly."""
    return ChunkDocument(text_col, lit(size), lit(stride))
