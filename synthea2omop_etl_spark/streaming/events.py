"""Structured Streaming ingest over the events table.

The reference is strictly batch (SURVEY.md §2.10) — this module is the
engine's beyond-parity streaming path: the same events analytics
(windowed counts, sessionization) expressed as an incremental streaming
plan with watermarked late-data handling.

- ``read_events_stream`` — file-source stream over the events parquet
  directory (schema pinned from a static read; TIMESTAMP(NANOS) converted
  exactly like the batch loader so batch and stream agree).
- ``windowed_event_counts`` — tumbling-window counts per event_type with a
  watermark; the streaming twin of queries.q_events_hourly.
- ``sessionized_stats`` — session_window (30-min gap) per user; the
  streaming twin of queries.q_sessionize.

Tests run these with trigger(availableNow=True) into a memory sink and
compare against the batch answers — the exactly-once story at scale is the
checkpointed file source + idempotent sink, identical plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_events_stream(
    spark: SparkSession, events_parquet: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    static = spark.read.parquet(events_parquet)
    reader = spark.readStream.schema(static.schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(events_parquet)
    if isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn(
            "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
        )
    elif isinstance(df.schema["ts"].dataType, T.TimestampNTZType):
        # tz-naive micros parquet reads as TIMESTAMP_NTZ; watermarks and
        # epoch math expect TIMESTAMP. Pin the session tz to UTC before
        # the cast (same rationale as sources.testdata.load_table): under
        # a non-UTC session the NTZ→TZ cast would shift the instant and
        # the stream would disagree with its batch twin and the oracle.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window counts + value sums per event_type.

    The watermark bounds state: windows older than max(event time) -
    watermark are finalized and evicted — the streaming answer to the
    reference's batch GROUP BY date_trunc.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sessionized_stats(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Per-user session aggregation via the built-in session_window —
    dynamic-gap stateful aggregation without custom state code."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.session_window("ts", gap).alias("sw"), F.col("user_id")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )
