"""Streaming twins of the sketch operators (operators/sketches.py).

HLL registers are *mergeable state*: ``max(rho)`` per (window, bucket) is
exactly the aggregate Structured Streaming can maintain incrementally
under a watermark — the register table streams out, and the float
estimate is a read-time batch step over the sink (estimation is cheap;
state is what must stay bounded). This is the standard lambda-free
design: one plan produces state identical to the batch operator, proven
by the stream-vs-batch equality test.

``deduplicated_events`` is the ingestion-side exactly-once guard:
watermarked ``dropDuplicatesWithinWatermark`` on the natural key, state
evicted once the watermark passes — the streaming answer to the batch
anti-join insert-if-absent (sources/writers.py) for at-least-once
upstream feeds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from synthea2omop_etl_spark.llm_ops.hashing import hmod
from synthea2omop_etl_spark.operators.sketches import HLL_M, _rho


def windowed_hll_registers(
    events: DataFrame,
    value_col: str = "user_id",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-window HLL register table: (window_start, bucket, max_rho).

    State per window is ≤ m registers no matter how many events arrive —
    the property that makes distinct-count-per-window viable on an
    unbounded stream. Registers match the batch operator bit-for-bit.
    """
    h = hmod(F.col(value_col).cast("string"))
    rest = F.floor(h / HLL_M)
    return (
        events.withWatermark("ts", watermark)
        .select(
            F.col("ts"),
            (h % HLL_M).alias("bucket"),
            _rho(rest).alias("rho"),
        )
        .groupBy(F.window("ts", window).alias("w"), "bucket")
        .agg(F.max("rho").alias("max_rho"))
        .select(F.col("w.start").alias("window_start"), "bucket", "max_rho")
    )


def deduplicated_events(
    events: DataFrame, key: str = "event_id", watermark: str = "2 hours"
) -> DataFrame:
    """Drop duplicate arrivals of the same event within the watermark.

    State is bounded by the watermark horizon (keys older than
    max(event time) - watermark are evicted), so an at-least-once
    upstream (file redelivery, producer retries) becomes exactly-once
    downstream without unbounded key state.
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        [key]
    )
