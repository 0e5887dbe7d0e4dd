"""Kaplan-Meier survival estimation — time-to-event analytics.

The canonical downstream analysis of an OMOP warehouse (time from index
to outcome under right-censoring: drug era → adverse event, cohort entry
→ death) and equally the product/retention question (signup → purchase).
The reference ships the ETL side of this; an analytics engine claiming
its surface should produce the survival curve itself.

Spark-first shape — KM is ONE grouped aggregate plus two windows:
1. collapse subjects to one row per (group, duration): d events, c
   censored (keyed shuffle with map-side combine);
2. risk set n(t) = subjects with duration >= t, as group total minus the
   running count of earlier durations (cumulative window, no self-join —
   the naive formulation joins every time against every subject);
3. S(t) = cumulative PRODUCT of (1 - d/n) over ordered durations — the
   product aggregate over the same window frame.

The per-group window partition carries one row per DISTINCT duration,
not per subject, so state is bounded by the time resolution; at 100 TB
the heavy step is the first aggregate, which is an ordinary combinable
groupBy. Cumulative-product float association may differ across engines
(segment-tree vs sequential) — outputs are rounded 4dp, same contract as
every ratio in the registry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def km_survival(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Kaplan-Meier curve per group.

    ``df`` has one row per subject: ``duration_col`` (numeric time to
    event or censoring), ``event_col`` (1 = event observed, 0 = right-
    censored). Output: group_cols + (t, n_risk, n_events, n_censored,
    survival), one row per distinct duration, survival rounded 4dp.
    """
    g = list(group_cols or [])
    per_t = df.groupBy(
        *g, F.col(duration_col).alias("t")
    ).agg(
        F.sum(F.col(event_col).cast("long")).alias("n_events"),
        F.sum(
            (F.lit(1) - F.col(event_col).cast("long"))
        ).alias("n_censored"),
        F.count(F.lit(1)).alias("__n_at"),
    )
    # Non-empty partition spec even when ungrouped: pmod(lit) does not
    # constant-fold to an empty spec the way lit() does (see verify
    # skill notes); real groupings just use the group columns.
    part = g if g else [F.pmod(F.lit(0), F.lit(1))]
    w_order = Window.partitionBy(*part).orderBy("t")
    w_cum = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_prev = w_order.rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.partitionBy(*part)
    n_risk = (
        F.sum("__n_at").over(w_all)
        - F.coalesce(F.sum("__n_at").over(w_prev), F.lit(0))
    )
    stepped = per_t.withColumn("n_risk", n_risk).withColumn(
        "survival",
        F.round(
            F.product(
                F.lit(1.0) - F.col("n_events") / F.col("n_risk")
            ).over(w_cum),
            4,
        ),
    )
    return stepped.select(
        *g, "t", "n_risk", "n_events", "n_censored", "survival"
    )


def duck_km_survival(
    subjects_sql: str,
    duration_col: str,
    event_col: str,
    group_cols: list[str] | None = None,
) -> str:
    """DuckDB twin of :func:`km_survival` over ``subjects_sql`` (one row
    per subject)."""
    g = list(group_cols or [])
    gsel = (", ".join(g) + ",") if g else ""
    part = f"PARTITION BY {', '.join(g)}" if g else ""
    return f"""
    WITH __subj AS ({subjects_sql}),
    per_t AS (
      SELECT {gsel} {duration_col} AS t,
             CAST(SUM(CASE WHEN {event_col} = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_events,
             CAST(SUM(CASE WHEN {event_col} = 1 THEN 0 ELSE 1 END) AS BIGINT)
               AS n_censored,
             CAST(COUNT(*) AS BIGINT) AS n_at
      FROM __subj GROUP BY {gsel} {duration_col}
    )
    , risked AS (
      SELECT {gsel} t, n_events, n_censored,
             CAST(SUM(n_at) OVER ({part})
               - COALESCE(SUM(n_at) OVER ({part} ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS n_risk
      FROM per_t
    )
    SELECT {gsel} t, n_risk, n_events, n_censored,
           ROUND(PRODUCT(1.0 - n_events::DOUBLE / n_risk)
                 OVER ({part} ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
             AS survival
    FROM risked
    """
