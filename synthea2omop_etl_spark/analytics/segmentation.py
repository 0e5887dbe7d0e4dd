"""Customer-value segmentation read-outs: RFM quintiles + decile gains.

The reference's report layer slices persons by demographic strata
(Achilles 2/4/5 shapes); a revenue-facing pipeline wants the behavioral
twin — segment customers by Recency/Frequency/Monetary quintiles, and
read a scoring model's decile gains/lift table. Both reduce to the same
Spark shape: one combinable per-entity aggregate over the fact table,
NTILE windows over the (small) per-entity frame, then a tiny final
groupBy. The fact table is scanned exactly once.

Determinism contract: NTILE is only engine-portable under a TOTAL
order, so every quantile window orders by (metric, entity-id) — the id
tiebreaker makes ties deterministic and the bucket assignment
bit-identical between Spark and DuckDB (both implement SQL NTILE's
ceil/floor group sizing over the same total order).

Scale story: the per-entity aggregate is the only shuffle that touches
the facts; the NTILE windows run over one row per customer. A global
NTILE is a single-partition sort of that reduced frame — fine up to
hundreds of millions of customers as one sorted stage; beyond that the
documented path is quantile-cut via approx_percentile boundaries
(operators/percentiles.py) instead of rank-based buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rfm_segments(
    orders: DataFrame,
    customer_col: str = "o_custkey",
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
    buckets: int = 5,
) -> DataFrame:
    """RFM segmentation: quintile each customer on recency (last order
    date), frequency (order count) and monetary (total spend), then
    roll up to one row per (r_q, f_q, m_q) cell.

    Higher quintile = better on every axis (more recent / more orders /
    more spend), so (5,5,5) is the champion cell. Output per cell:
    r_q, f_q, m_q, n_customers, revenue (2dp), ordered by cell.
    """
    per_c = orders.groupBy(F.col(customer_col).alias("cust")).agg(
        F.max(date_col).alias("last_d"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(amount_col).alias("mon"),
    )
    base = Window.partitionBy(F.pmod(F.lit(0), F.lit(1)))
    scored = per_c.select(
        "cust",
        "mon",
        F.ntile(buckets)
        .over(base.orderBy("last_d", "cust"))
        .alias("r_q"),
        F.ntile(buckets).over(base.orderBy("freq", "cust")).alias("f_q"),
        F.ntile(buckets).over(base.orderBy("mon", "cust")).alias("m_q"),
    )
    return (
        scored.groupBy("r_q", "f_q", "m_q")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("mon"), 2).alias("revenue"),
        )
        .orderBy("r_q", "f_q", "m_q")
    )


def duck_rfm_segments(
    table: str = "orders",
    customer_col: str = "o_custkey",
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
    buckets: int = 5,
) -> str:
    """DuckDB twin of :func:`rfm_segments` (same total-order NTILEs)."""
    return f"""
    WITH per_c AS (
      SELECT {customer_col} AS cust, MAX({date_col}) AS last_d,
             COUNT(*) AS freq, SUM({amount_col}) AS mon
      FROM {table} GROUP BY 1
    ), scored AS (
      SELECT cust, mon,
             NTILE({buckets}) OVER (ORDER BY last_d, cust) AS r_q,
             NTILE({buckets}) OVER (ORDER BY freq, cust) AS f_q,
             NTILE({buckets}) OVER (ORDER BY mon, cust) AS m_q
      FROM per_c
    )
    SELECT r_q, f_q, m_q, CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(SUM(mon), 2) AS revenue
    FROM scored GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """


def decile_gains(
    scored: DataFrame,
    id_col: str,
    score_col: str,
    target_col: str,
    deciles: int = 10,
) -> DataFrame:
    """Gains/lift table: rank entities by a model score (descending),
    cut into deciles, and read how much of the total target each
    cumulative decile captures vs. random targeting.

    ``scored`` has one row per entity with the score and the realized
    target (e.g. account balance as the score, actual revenue as the
    target). cum_capture = cumulative target share; cum_lift =
    cum_capture / cumulative population share (1.0 = no better than
    random). Output: decile, n, target_sum (2dp), cum_capture (5dp),
    cum_lift (4dp), ordered by decile.
    """
    base = Window.partitionBy(F.pmod(F.lit(0), F.lit(1)))
    ranked = scored.select(
        F.col(target_col).alias("tgt"),
        F.ntile(deciles)
        .over(base.orderBy(F.col(score_col).desc(), F.col(id_col)))
        .alias("decile"),
    )
    per_d = ranked.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"), F.sum("tgt").alias("target_sum")
    )
    w_cum = (
        Window.partitionBy(F.pmod(F.lit(0), F.lit(1)))
        .orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(F.pmod(F.lit(0), F.lit(1)))
    cum_t = F.sum("target_sum").over(w_cum) / F.sum("target_sum").over(
        w_all
    )
    cum_n = F.sum("n").over(w_cum) / F.sum("n").over(w_all)
    return per_d.select(
        "decile",
        "n",
        F.round("target_sum", 2).alias("target_sum"),
        F.round(cum_t, 5).alias("cum_capture"),
        F.round(cum_t / cum_n, 4).alias("cum_lift"),
    ).orderBy("decile")


def duck_decile_gains(
    scored_sql: str,
    id_col: str,
    score_col: str,
    target_col: str,
    deciles: int = 10,
) -> str:
    """DuckDB twin of :func:`decile_gains`; ``scored_sql`` yields one
    row per entity with the id, score and target columns."""
    return f"""
    WITH ranked AS (
      SELECT {target_col} AS tgt,
             NTILE({deciles}) OVER (ORDER BY {score_col} DESC, {id_col})
               AS decile
      FROM ({scored_sql})
    ), per_d AS (
      SELECT decile, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(tgt) AS target_sum
      FROM ranked GROUP BY 1
    ), cum AS (
      SELECT decile, n, target_sum,
             SUM(target_sum) OVER (ORDER BY decile
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               / SUM(target_sum) OVER () AS cum_capture,
             CAST(SUM(n) OVER (ORDER BY decile
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS DOUBLE) / SUM(n) OVER () AS cum_pop
      FROM per_d
    )
    SELECT decile, n, ROUND(target_sum, 2) AS target_sum,
           ROUND(cum_capture, 5) AS cum_capture,
           ROUND(cum_capture / cum_pop, 4) AS cum_lift
    FROM cum ORDER BY decile
    """
