"""Bucketed range (interval-containment) join.

A naive ``ts BETWEEN start AND end`` join has no equi-key, so Spark
executes it as BroadcastNestedLoopJoin — O(facts × intervals) compares and
a broadcast of one whole side. This operator discretizes time into fixed
buckets: each interval explodes into the buckets it covers (~length/width
rows), each fact maps to exactly ONE bucket, and the join becomes a hash
equi-join on the bucket id followed by the exact containment filter.

Cost model: shuffle/build size grows by the interval fan-out factor
(avg_interval_len / bucket_seconds + 1); compare count drops from |F|·|I|
to matches-per-bucket. Pick ``bucket_seconds`` near the median interval
length so fan-out stays O(1). Because a fact belongs to exactly one
bucket, no post-join dedup is needed (an interval may cover many buckets,
but the (fact, interval) pair can only meet in the fact's bucket).

This is the standard streaming/temporal-join trick (same shape as
symmetric hash interval joins in Flink); the as-of join
(operators/asof.py) covers the "latest value at or before" cousin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    facts: DataFrame,
    ts_col: str,
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join each fact row to every interval containing its timestamp.

    Output: facts columns + intervals columns (caller projects). ``how``
    supports "inner" (default) and "left_semi" (facts covered by ≥1
    interval).
    """
    if how not in ("inner", "left_semi"):
        raise ValueError(f"unknown how: {how!r} (expected 'inner' or 'left_semi')")
    def _epoch(c: str):
        # TIMESTAMP_NTZ rejects a direct numeric cast; hop through
        # TIMESTAMP (session tz) so both timestamp flavors work.
        return F.col(c).cast("timestamp").cast("long")

    fb = facts.withColumn(
        "__bucket",
        F.floor(_epoch(ts_col) / F.lit(bucket_seconds)),
    )
    ib = (
        intervals.withColumn(
            "__bs", F.floor(_epoch(start_col) / F.lit(bucket_seconds))
        )
        .withColumn(
            "__be", F.floor(_epoch(end_col) / F.lit(bucket_seconds))
        )
        .withColumn("__bucket", F.explode(F.sequence("__bs", "__be")))
        .drop("__bs", "__be")
    )
    cond = (
        (F.col(ts_col) >= F.col(start_col))
        & (F.col(ts_col) <= F.col(end_col))
    )
    if how == "left_semi":
        # Real LEFT SEMI (bucket equi-key + containment as join filter):
        # preserves left-side multiplicity — pre-existing duplicate fact
        # rows stay duplicated, unlike an inner-join + distinct rewrite.
        on = (fb["__bucket"] == ib["__bucket"]) & cond
        return fb.join(ib, on, "left_semi").drop("__bucket")
    joined = fb.join(ib, "__bucket").where(cond).drop("__bucket")
    return joined
