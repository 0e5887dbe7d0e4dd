"""Watermarked stream-stream joins.

The reference is strictly batch (SURVEY.md §2.10); its closest shape is the
batch INSERT..SELECT correlating encounters with their patients. This module
is the missing Structured Streaming join surface: two *unbounded* sides
joined with event-time range conditions, state bounded by watermarks.

Semantics (and why the range condition is mandatory): a stream-stream join
must buffer rows from each side until the other side can no longer produce a
match. Watermarks on BOTH sides plus a time-range join condition give Spark
the eviction bound — click state older than
``max(event time) - watermark - horizon`` can never match a future purchase
and is dropped. Without the range condition the state is unbounded and Spark
rejects the plan in append mode.

At 100 TB / real streams the state store is the scaling surface: state is
hash-partitioned by the join key (user_id), so hot users skew a state
partition but never a whole executor; the horizon directly bounds state
bytes per key (events within ``horizon + watermark`` of the frontier).

- ``attribution_join`` — inner join: each click paired with the same user's
  purchases within ``horizon`` after it (ad-attribution shape).
- ``attribution_join_left`` — left-outer variant: unmatched clicks emit with
  NULL purchase columns once the watermark passes their horizon, i.e. once
  "no future purchase can match" is provable.

Both have exact batch twins (the same plan on bounded frames) asserted in
tests/test_streaming_sources.py; the batch shape is also graded with a
DuckDB oracle via queries.q_attribution_events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sides(
    events: DataFrame,
    left_type: str,
    right_type: str,
    watermark: str,
    streaming: bool,
) -> tuple[DataFrame, DataFrame]:
    left = events.where(F.col("event_type") == left_type).select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
    )
    right = events.where(F.col("event_type") == right_type).select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    if streaming:
        left = left.withWatermark("click_ts", watermark)
        right = right.withWatermark("purchase_ts", watermark)
    return left, right


def attribution_join(
    events: DataFrame,
    left_type: str = "click",
    right_type: str = "purchase",
    horizon: str = "4 hours",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Pair every ``left_type`` event with the same user's ``right_type``
    events in ``[ts, ts + horizon]`` — streaming when ``events`` is a
    stream (watermarks applied), the identical bounded plan otherwise.

    ``how='left_outer'`` keeps unmatched clicks (NULL purchase columns);
    in streaming mode those rows are emitted only after the watermark
    proves no match can still arrive, so an availableNow run holds back
    unmatched clicks newer than ``frontier - watermark - horizon``.
    """
    streaming = events.isStreaming
    left, right = _sides(events, left_type, right_type, watermark, streaming)
    cond = (
        (left.user_id == right.p_user_id)
        & (right.purchase_ts >= left.click_ts)
        & (right.purchase_ts <= left.click_ts + F.expr(f"INTERVAL {horizon}"))
    )
    joined = left.join(right, cond, how)
    return joined.select(
        left.user_id,
        "click_id",
        "click_ts",
        "purchase_id",
        "purchase_ts",
        "purchase_value",
        (
            F.unix_timestamp("purchase_ts") - F.unix_timestamp("click_ts")
        ).alias("lag_seconds"),
    )


def attribution_join_left(
    events: DataFrame,
    left_type: str = "click",
    right_type: str = "purchase",
    horizon: str = "4 hours",
    watermark: str = "2 hours",
) -> DataFrame:
    return attribution_join(
        events, left_type, right_type, horizon, watermark, how="left_outer"
    )
