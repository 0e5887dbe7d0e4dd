"""Hypertable-style time-bucket rollup with gap-fill + LOCF.

The reference has no time-series surface (its events are OMOP dated
facts), but a training-data/metrics pipeline needs dense per-bucket
series: bucket → aggregate → fill the empty buckets → carry the last
observation forward. Spark-first shape:

- the bucket spectrum per group comes from ``sequence(min, max)`` +
  ``explode`` — generated distributed, never on the driver;
- the fill join is group-local (same keys as the aggregate → AQE reuses
  the exchange);
- LOCF is ``last(value, ignorenulls=True)`` over an unbounded-preceding
  window partitioned by group — one pass, no self-join.

At 100 TB the bucket spectrum is tiny relative to the events (hours ×
groups), so the generated side broadcasts; the heavy side is touched by
exactly one shuffle (the bucket aggregate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def time_bucket_gapfill(
    df: DataFrame,
    ts_col: str,
    group_cols: list[str],
    aggs: dict[str, Column],
    bucket: str = "hour",
    locf_cols: list[str] | None = None,
    zero_cols: list[str] | None = None,
) -> DataFrame:
    """Dense per-(group, bucket) aggregate series.

    ``aggs`` maps output name → aggregate Column over the bucketed rows.
    ``locf_cols`` are filled with the last non-null prior value per group;
    ``zero_cols`` are filled with 0 (the count convention).
    """
    bucketed = (
        df.withColumn("__b", F.date_trunc(bucket, F.col(ts_col)))
        .groupBy(*group_cols, "__b")
        .agg(*[c.alias(n) for n, c in aggs.items()])
    )
    spectrum = (
        bucketed.groupBy(*group_cols)
        .agg(F.min("__b").alias("__lo"), F.max("__b").alias("__hi"))
        .select(
            *group_cols,
            F.explode(
                F.sequence(
                    F.col("__lo"),
                    F.col("__hi"),
                    F.expr(f"interval 1 {bucket}"),
                )
            ).alias("__b"),
        )
    )
    dense = spectrum.join(bucketed, [*group_cols, "__b"], "left")
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = dense
    for c in locf_cols or []:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    for c in zero_cols or []:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0)))
    return out.withColumnRenamed("__b", "bucket_ts")


def duck_gapfill_hourly(
    table: str,
    ts_col: str,
    group_col: str,
    agg_sql: dict[str, str],
    locf_cols: list[str],
    zero_cols: list[str],
) -> str:
    """DuckDB SQL equivalent of an hourly ``time_bucket_gapfill`` (oracle)."""
    agg_list = ", ".join(f"{sql} AS {n}" for n, sql in agg_sql.items())
    locf = ", ".join(
        f"last_value(b.{c} IGNORE NULLS) OVER "
        f"(PARTITION BY s.{group_col} ORDER BY s.h) AS {c}"
        for c in locf_cols
    )
    zeros = ", ".join(f"COALESCE(b.{c}, 0) AS {c}" for c in zero_cols)
    cols = ", ".join(x for x in [locf, zeros] if x)
    return f"""
    WITH bucketed AS (
      SELECT {group_col}, date_trunc('hour', {ts_col}) AS h, {agg_list}
      FROM {table} GROUP BY 1, 2
    ),
    spans AS (
      SELECT {group_col}, MIN(h) AS lo, MAX(h) AS hi FROM bucketed GROUP BY 1
    ),
    spectrum AS (
      SELECT {group_col},
             unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
      FROM spans
    )
    SELECT s.{group_col}, s.h AS bucket_ts, {cols}
    FROM spectrum s
    LEFT JOIN bucketed b ON b.{group_col} = s.{group_col} AND b.h = s.h
    """


def ewma(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    alpha: float = 0.3,
    window_rows: int = 10,
) -> DataFrame:
    """Exponentially-weighted moving average per key — the standard
    smoothing/decay aggregate (pandas ``ewm(alpha).mean()`` seeded at the
    window's first value), bounded to the last ``window_rows`` rows.

    Recurrence s ← α·x + (1−α)·s folded LEFT-TO-RIGHT over the window's
    values: ``collect_list`` over a ROWS frame materializes the bounded
    history (≤ window_rows values per row — constant state, no
    whole-partition buffering), and one ``aggregate`` lambda folds it.
    All JVM expressions inside whole-stage codegen; total work is
    O(rows × window_rows) with NO shuffle beyond the one key/order sort
    every windowed aggregate needs. The bounded frame is also what keeps
    the weights in float range — an unbounded two-pass formulation needs
    (1−α)^(−i) terms that overflow past a few thousand rows.

    ``order_cols`` must be a total order per key (add a unique tiebreaker
    column) or the fold order — and hence the result — is ambiguous.

    Adds ``ewma`` (4-dp rounded, cross-engine stable) to the input.
    DuckDB twin: ``list(x) OVER (ROWS n PRECEDING)`` + ``list_reduce``
    with the identical lambda — graded as ``ewma_prices``.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order_cols)
        .rowsBetween(-(window_rows - 1), 0)
    )
    hist = F.collect_list(F.col(value_col).cast("double")).over(w)
    a = F.lit(float(alpha))

    def fold(lst: Column) -> Column:
        rest = F.slice(lst, 2, F.greatest(F.size(lst) - 1, F.lit(0)))
        return F.aggregate(
            rest,
            F.element_at(lst, 1),
            lambda acc, x: a * x + (F.lit(1.0) - a) * acc,
        )

    return df.withColumn("ewma", F.round(fold(hist), 4))
