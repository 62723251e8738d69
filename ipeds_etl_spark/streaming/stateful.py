"""Custom stateful streaming operator via ``applyInPandasWithState``.

``running_user_stats`` maintains per-user running totals across
micro-batches — the operator shape Spark's built-ins can't express
(neither an aggregate nor a window: state carries arbitrary Python
values and emits on every batch). This is the engine's template for
custom stateful ops:

* state = (n_events, total_value) per user key, kept in the state
  store (checkpointed, partitioned by the same hash shuffle a groupBy
  would use);
* each micro-batch's rows for a key arrive as pandas DataFrames; the
  handler folds them into state and emits one updated row;
* a processing-time timeout expires idle keys so state stays bounded
  even without a watermark (the knob for unbounded key spaces).

The handler is self-contained (no module-global references) so it
ships by value to Python workers under any session.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("total_value", T.DoubleType(), True),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType(), False),
        T.StructField("total", T.DoubleType(), True),
    ]
)


def running_user_stats(events: DataFrame, idle_timeout_ms: int = 0) -> DataFrame:
    """Per-user running (n_events, total_value), updated each batch."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms
        else GroupStateTimeout.NoTimeout
    )
    ms = idle_timeout_ms

    def handler(key, pdfs, state: GroupState):
        import pandas as _pd

        (user_id,) = key
        if state.hasTimedOut:
            state.remove()
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        if ms:
            state.setTimeoutDuration(ms)
        yield _pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "total_value": [total]}
        )

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            handler,
            outputStructType=STATS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )
