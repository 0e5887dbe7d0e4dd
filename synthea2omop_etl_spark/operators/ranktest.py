"""Mann-Whitney U rank-sum test — the nonparametric A/B read-out.

The bootstrap diff-in-means (operators/bootstrap.py) answers "how big is
the lift"; the rank-sum test answers "does one arm stochastically
dominate" without assuming means exist to compare — the standard choice
for heavy-tailed metrics (revenue, latency) where a single outlier
swamps a mean.

Spark-first shape — NO per-row ranking join: mid-ranks are computed on
the DISTINCT-VALUE table (one combinable groupBy to (value, n, n_a)
rows, then a cumulative window over ordered values — the same
total-minus-running-count trick as the KM risk set), and the rank sum
is Σ n_a(v)·midrank(v). The window partition carries one row per
distinct metric value, bounded by the metric's resolution, never by row
count. Tie handling is the textbook mid-rank plus the tie-corrected
variance term, all integer-exact until the final z.

The read-out is the z statistic under the normal approximation (exact
for n ≳ 20 per arm) and a two-sided significance flag at the given
z threshold — no erf/p-value, so the whole computation is expressible
identically in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rank_sum_test(
    df: DataFrame,
    value_col: str,
    arm_col: str,
    arm_a: str,
    arm_b: str,
    z_crit: float = 1.959964,
) -> DataFrame:
    """Mann-Whitney U between ``arm_a`` and ``arm_b``.

    Output (single row): n_a, n_b, u_stat (arm_a's U, mid-rank and
    tie-corrected), z (4dp), significant (|z| > z_crit). Rows from
    other arms are ignored.
    """
    arms = df.where(F.col(arm_col).isin([arm_a, arm_b])).select(
        F.col(value_col).cast("double").alias("v"),
        (F.col(arm_col) == arm_a).cast("long").alias("is_a"),
    )
    per_v = arms.groupBy("v").agg(
        F.count(F.lit(1)).alias("c"),
        F.sum("is_a").alias("ca"),
    )
    # Non-foldable constant partition: one row per DISTINCT value, the
    # documented bound (same single-partition justification as the
    # ungrouped KM curve).
    w_prev = (
        Window.partitionBy(F.pmod(F.lit(0), F.lit(1)))
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = per_v.withColumn(
        "midrank",
        F.coalesce(F.sum("c").over(w_prev), F.lit(0))
        + (F.col("c") + 1) / 2.0,
    )
    agg = ranked.agg(
        F.sum(F.col("ca") * F.col("midrank")).alias("ra"),
        F.sum("ca").alias("n_a"),
        F.sum(F.col("c") - F.col("ca")).alias("n_b"),
        F.sum(
            F.col("c") * F.col("c") * F.col("c") - F.col("c")
        ).alias("ties"),
    )
    n = F.col("n_a") + F.col("n_b")
    u = F.col("ra") - F.col("n_a") * (F.col("n_a") + 1) / 2.0
    mean_u = F.col("n_a") * F.col("n_b") / 2.0
    var_u = (
        F.col("n_a")
        * F.col("n_b")
        / 12.0
        * ((n + 1) - F.col("ties") / (n * (n - 1)))
    )
    z = F.round((u - mean_u) / F.sqrt(var_u), 4)
    return agg.select(
        "n_a",
        "n_b",
        F.round(u, 4).alias("u_stat"),
        z.alias("z"),
        (F.abs(z) > F.lit(z_crit)).alias("significant"),
    )


def duck_rank_sum_test(
    table: str,
    value_col: str,
    arm_col: str,
    arm_a: str,
    arm_b: str,
    z_crit: float = 1.959964,
) -> str:
    """DuckDB twin of :func:`rank_sum_test` (identical arithmetic)."""
    return f"""
    WITH arms AS (
      SELECT CAST({value_col} AS DOUBLE) AS v,
             CASE WHEN {arm_col} = '{arm_a}' THEN 1 ELSE 0 END AS is_a
      FROM {table} WHERE {arm_col} IN ('{arm_a}', '{arm_b}')
    ), per_v AS (
      SELECT v, CAST(COUNT(*) AS BIGINT) AS c,
             CAST(SUM(is_a) AS BIGINT) AS ca
      FROM arms GROUP BY v
    ), ranked AS (
      SELECT v, c, ca,
             COALESCE(SUM(c) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + (c + 1) / 2.0 AS midrank
      FROM per_v
    ), agg AS (
      SELECT SUM(ca * midrank) AS ra,
             CAST(SUM(ca) AS BIGINT) AS n_a,
             CAST(SUM(c - ca) AS BIGINT) AS n_b,
             CAST(SUM(c * c * c - c) AS BIGINT) AS ties
      FROM ranked
    )
    SELECT n_a, n_b,
           ROUND(ra - n_a * (n_a + 1) / 2.0, 4) AS u_stat,
           ROUND((ra - n_a * (n_a + 1) / 2.0 - n_a * n_b / 2.0)
                 / sqrt(n_a * n_b / 12.0
                        * ((n_a + n_b + 1)
                           - ties / ((n_a + n_b) * (n_a + n_b - 1.0)))), 4)
             AS z,
           abs(ROUND((ra - n_a * (n_a + 1) / 2.0 - n_a * n_b / 2.0)
                 / sqrt(n_a * n_b / 12.0
                        * ((n_a + n_b + 1)
                           - ties / ((n_a + n_b) * (n_a + n_b - 1.0)))), 4))
             > {z_crit} AS significant
    FROM agg
    """
