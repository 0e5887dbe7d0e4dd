"""Funnel conversion and cohort retention — the product-analytics pair
(Amplitude/Mixpanel core shapes) over the events table.

Both are pure relational compositions whose heavy work is keyed-by-user
aggregation — the shape that scales: no per-user state beyond the group
buffer, no ordered scans of the whole event stream.

- ``funnel_conversion``: strictly-ordered step matching (first step-1
  event; first step-2 event AFTER it; ...). Each stage is ONE conditional
  min-timestamp aggregate keyed on user joined back to the next stage's
  filtered events — k stages = k combinable aggregates + k user-keyed
  joins (AQE broadcasts the shrinking survivor side). The summary row set
  is built from 1-row aggregates, conversion = n_step / n_step1 with the
  repo's floor-half-up 4dp convention.

- ``cohort_retention``: cohort = the user's first signup date; activity
  bucketed into whole weeks since signup; distinct (user, week) activity
  counts per (cohort, week). The signup event itself lands in week 0, so
  week 0 is every cohort's denominator by construction and
  ``retention_frac`` is exact. The only corpus-sized shuffles are the
  signup min-aggregate and the distinct-activity reduce; the retention
  window runs over the already-aggregated (cohort, week) frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from synthea2omop_etl_spark.llm_ops.text import _round4


def funnel_conversion(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_delay_s: int | None = None,
    checkpoint_stages: bool = True,
) -> DataFrame:
    """Per funnel step: users reaching it in strict temporal order.

    Output: ``(step, event_type, n_users, conv_frac)`` — step 1-indexed,
    ``conv_frac`` = n_users / n_users(step 1), floor-half-up 4dp.
    A user reaches step k+1 only with a step-k+1 event STRICTLY after
    their step-k reach time (first-touch semantics at every stage);
    with ``max_delay_s`` the event must also land within that many whole
    seconds of the previous reach (the windowed-funnel convention —
    second-boundary counting, identical to DuckDB date_diff).
    """
    ev = events.select(
        F.col(user_col).alias("u"),
        F.col(ts_col).alias("t"),
        F.col(type_col).alias("et"),
    )
    # each stage frame feeds TWO consumers (the next stage's join and its
    # own count row) — left lazy, counting step k re-executes stages
    # 1..k-1 and the events table is scanned O(k^2) times (ADVICE r09).
    # A lazy localCheckpoint per stage truncates the lineage, so events
    # is scanned exactly once per stage; the stored frames are user-keyed
    # survivor sets, strictly smaller than the event stream.
    # ``checkpoint_stages=False`` keeps the single lazy plan (used by the
    # plan-shape test to assert the stages' combinable min aggregates,
    # which checkpointing hides behind RDD scan boundaries).
    def _ckpt(df: DataFrame) -> DataFrame:
        return df.localCheckpoint(eager=False) if checkpoint_stages else df

    reached: list[DataFrame] = []
    stage = _ckpt(
        ev.where(F.col("et") == steps[0])
        .groupBy("u")
        .agg(F.min("t").alias("rt"))
    )
    reached.append(stage)
    for step in steps[1:]:
        cond = F.col("t") > F.col("prev")
        if max_delay_s is not None:
            cond = cond & (
                F.col("t").cast("long") - F.col("prev").cast("long")
                <= max_delay_s
            )
        stage = _ckpt(
            ev.where(F.col("et") == step)
            .join(stage.select("u", F.col("rt").alias("prev")), "u")
            .where(cond)
            .groupBy("u")
            .agg(F.min("t").alias("rt"))
        )
        reached.append(stage)
    counts = None
    for i, (step, stage) in enumerate(zip(steps, reached), start=1):
        row = stage.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(i).alias("step"),
            F.lit(step).alias("event_type"),
            F.col("n_users").cast("long").alias("n_users"),
        )
        counts = row if counts is None else counts.unionByName(row)
    base = counts.where(F.col("step") == 1).select(
        F.col("n_users").alias("n_base")
    )
    return counts.crossJoin(F.broadcast(base)).select(
        "step",
        "event_type",
        "n_users",
        F.when(
            F.col("n_base") > 0, _round4(F.col("n_users") / F.col("n_base"))
        )
        .otherwise(F.lit(None).cast("double"))
        .alias("conv_frac"),
    )


def cohort_retention(
    events: DataFrame,
    signup_type: str = "signup",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Weekly retention matrix keyed by signup-date cohort.

    Output: ``(cohort_date, weeks_since, n_users, retention_frac)`` —
    n_users = distinct cohort users with ANY event in that week since
    their signup; retention_frac = n_users / n_users(week 0), exact
    because the signup event itself anchors week 0.
    """
    ev = events.select(
        F.col(user_col).alias("u"),
        F.col(ts_col).alias("t"),
        F.col(type_col).alias("et"),
    )
    signup = (
        ev.where(F.col("et") == signup_type)
        .groupBy("u")
        .agg(F.to_date(F.min("t")).alias("cohort_date"))
    )
    weekly = (
        ev.join(signup, "u")
        .where(F.to_date("t") >= F.col("cohort_date"))
        .select(
            "u",
            "cohort_date",
            F.floor(
                F.datediff(F.to_date("t"), F.col("cohort_date")) / 7
            )
            .cast("int")
            .alias("weeks_since"),
        )
        .distinct()
        .groupBy("cohort_date", "weeks_since")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    w = Window.partitionBy("cohort_date")
    base = F.max(
        F.when(F.col("weeks_since") == 0, F.col("n_users"))
    ).over(w)
    return weekly.select(
        "cohort_date",
        "weeks_since",
        "n_users",
        _round4(F.col("n_users") / base).alias("retention_frac"),
    )
