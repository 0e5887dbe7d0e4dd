"""Custom stateful streaming operators via applyInPandasWithState.

The built-in windowed/session aggregations (streaming/events.py) cover the
declarative cases; this module shows the engine's escape hatch for operator
semantics Spark lacks: arbitrary per-key state machines over Arrow batches.

``streaming_seen_filter`` — stateful exactly-once-per-key emission
(streaming dedup): the first event per (user_id, event_type) passes, later
ones are dropped. State per key is one tiny counter; GroupStateTimeout can
evict idle keys in production.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupStateTimeout

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("first_event_id", T.LongType()),
        T.StructField("n_seen", T.LongType()),
    ]
)
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("first_event_id", T.LongType()),
        T.StructField("n_seen", T.LongType()),
    ]
)


def _make_dedup_fn():
    """Ship the state function as a CLOSURE, not a module-level function:
    cloudpickle serializes module-level functions by reference (an import
    of this module), which Python workers cannot resolve when the driver
    runs from outside the repo (the sources/readers.py _make_repairer
    lesson — caught here by running the full suite from a non-repo cwd)."""
    import pandas as _pd

    def _dedup_fn(key, pdfs, state):
        first_id, n_seen = state.get if state.exists else (None, 0)
        emitted_first = state.exists
        for pdf in pdfs:
            pdf = pdf.sort_values("event_id")
            if first_id is None and len(pdf):
                first_id = int(pdf["event_id"].iloc[0])
            n_seen += len(pdf)
        state.update((first_id, n_seen))
        if not emitted_first and first_id is not None:
            yield _pd.DataFrame(
                [(key[0], key[1], first_id, n_seen)],
                columns=[
                    "user_id",
                    "event_type",
                    "first_event_id",
                    "n_seen",
                ],
            )

    return _dedup_fn


def streaming_seen_filter(events: DataFrame) -> DataFrame:
    """Emit one row per (user_id, event_type): the first event seen.

    Update-mode stateful dedup; the batch twin is first_per_group (J9/W1).
    """
    return events.groupBy("user_id", "event_type").applyInPandasWithState(
        _make_dedup_fn(),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
