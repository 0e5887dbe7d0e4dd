"""Classical statistical read-outs as single-pass aggregations.

Three analyses the reference's report layer (Achilles-style summaries,
`backend/api` report endpoints) gestures at but never formalizes, each
expressed as a shape Spark executes in one or two combinable aggregation
passes — no iteration, no driver-side math:

- chi-squared test of independence over a categorical contingency table
  (is order priority independent of order status?);
- per-group OLS trend lines from sufficient statistics
  (covar_pop/var_pop/corr — the closed-form slope/intercept/r², never a
  gradient loop);
- Benford first-significant-digit audit (the classic fraud/DQ screen on
  financial amounts).

Scale story: every one of these reduces to a groupBy over either a tiny
categorical cross-product (chi-squared: R×C cells), the analysis groups
(OLS: one row per group), or nine digits (Benford) — the heavy input is
consumed by a map-side-combinable aggregate and the post-processing runs
on a table of at most a few hundred rows. All arithmetic is expressible
identically in DuckDB, so every read-out is hash-graded end to end.

The chi-squared significance read-out uses the Wilson–Hilferty cube-root
normal approximation (z = ((χ²/k)^⅓ − (1 − 2/9k)) / sqrt(2/9k)), which
keeps the p-value decision inside plain arithmetic both engines share —
no incomplete-gamma special function.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def chisq_independence(
    df: DataFrame,
    row_col: str,
    col_col: str,
    z_crit: float = 1.6449,
) -> DataFrame:
    """Chi-squared test of independence between two categorical columns.

    One combinable groupBy builds the R×C contingency table; row/column
    margins come from windows over that (tiny) table, so the raw input is
    read exactly once. Output (single row): n, n_rows, n_cols, dof,
    chi2 (4dp), wh_z (Wilson–Hilferty normal deviate, 4dp), significant
    (upper-tail at ``z_crit``, default 5%).
    """
    obs = df.groupBy(
        F.col(row_col).alias("r"), F.col(col_col).alias("c")
    ).agg(F.count(F.lit(1)).alias("o"))
    w_r = Window.partitionBy("r")
    w_c = Window.partitionBy("c")
    w_all = Window.partitionBy(F.pmod(F.lit(0), F.lit(1)))
    cells = obs.select(
        "r",
        "c",
        "o",
        F.sum("o").over(w_r).alias("rt"),
        F.sum("o").over(w_c).alias("ct"),
        F.sum("o").over(w_all).alias("n"),
    )
    e = F.col("rt") * F.col("ct") / F.col("n")
    agg = cells.agg(
        F.max("n").alias("n"),
        F.countDistinct("r").alias("n_rows"),
        F.countDistinct("c").alias("n_cols"),
        F.sum((F.col("o") - e) * (F.col("o") - e) / e).alias("chi2"),
    )
    dof = (F.col("n_rows") - 1) * (F.col("n_cols") - 1)
    k = dof.cast("double")
    wh_z = (
        F.cbrt(F.col("chi2") / k) - (1 - 2 / (9 * k))
    ) / F.sqrt(2 / (9 * k))
    return agg.select(
        "n",
        "n_rows",
        "n_cols",
        dof.alias("dof"),
        F.round("chi2", 4).alias("chi2"),
        F.round(wh_z, 4).alias("wh_z"),
        (F.round(wh_z, 4) > F.lit(z_crit)).alias("significant"),
    )


def duck_chisq_independence(
    table: str, row_col: str, col_col: str, z_crit: float = 1.6449
) -> str:
    """DuckDB twin of :func:`chisq_independence` (identical arithmetic)."""
    return f"""
    WITH obs AS (
      SELECT {row_col} AS r, {col_col} AS c, COUNT(*) AS o
      FROM {table} GROUP BY 1, 2
    ), cells AS (
      SELECT r, c, o,
             SUM(o) OVER (PARTITION BY r) AS rt,
             SUM(o) OVER (PARTITION BY c) AS ct,
             SUM(o) OVER () AS n
      FROM obs
    ), agg AS (
      SELECT CAST(MAX(n) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT r) AS BIGINT) AS n_rows,
             CAST(COUNT(DISTINCT c) AS BIGINT) AS n_cols,
             SUM((o - rt * ct / n) * (o - rt * ct / n)
                 / (rt * ct / n)) AS chi2
      FROM cells
    )
    SELECT n, n_rows, n_cols,
           (n_rows - 1) * (n_cols - 1) AS dof,
           ROUND(chi2, 4) AS chi2,
           ROUND((cbrt(chi2 / ((n_rows - 1) * (n_cols - 1)))
                  - (1 - 2.0 / (9 * (n_rows - 1) * (n_cols - 1))))
                 / sqrt(2.0 / (9 * (n_rows - 1) * (n_cols - 1))), 4)
             AS wh_z,
           ROUND((cbrt(chi2 / ((n_rows - 1) * (n_cols - 1)))
                  - (1 - 2.0 / (9 * (n_rows - 1) * (n_cols - 1))))
                 / sqrt(2.0 / (9 * (n_rows - 1) * (n_cols - 1))), 4)
             > {z_crit} AS significant
    FROM agg
    """


def ols_trend(
    df: DataFrame, y_col: str, x_col: str, group_col: str
) -> DataFrame:
    """Per-group simple linear regression from sufficient statistics.

    slope = covar_pop(y,x)/var_pop(x), intercept = ȳ − slope·x̄,
    r² = corr(x,y)² — the closed form, one combinable aggregation pass
    over the fact table and O(groups) output rows. No gradient descent,
    no second scan.
    """
    g = df.groupBy(F.col(group_col).alias("g")).agg(
        F.count(F.lit(1)).alias("n"),
        F.covar_pop(y_col, x_col).alias("cv"),
        F.var_pop(x_col).alias("vx"),
        F.avg(y_col).alias("my"),
        F.avg(x_col).alias("mx"),
        F.corr(x_col, y_col).alias("r"),
    )
    slope = F.col("cv") / F.col("vx")
    return g.select(
        "g",
        "n",
        F.round(slope, 4).alias("slope"),
        F.round(F.col("my") - slope * F.col("mx"), 4).alias("intercept"),
        F.round(F.col("r") * F.col("r"), 4).alias("r2"),
    ).orderBy("g")


def duck_ols_trend(table: str, y_col: str, x_col: str, group_col: str) -> str:
    """DuckDB twin of :func:`ols_trend`."""
    return f"""
    WITH g AS (
      SELECT {group_col} AS g, CAST(COUNT(*) AS BIGINT) AS n,
             covar_pop({y_col}, {x_col}) AS cv,
             var_pop({x_col}) AS vx,
             avg({y_col}) AS my, avg({x_col}) AS mx,
             corr({x_col}, {y_col}) AS r
      FROM {table} GROUP BY 1
    )
    SELECT g, n, ROUND(cv / vx, 4) AS slope,
           ROUND(my - cv / vx * mx, 4) AS intercept,
           ROUND(r * r, 4) AS r2
    FROM g ORDER BY g
    """


def benford_digits(df: DataFrame, value_col: str, decimals: int = 2) -> DataFrame:
    """First-significant-digit distribution vs Benford's law.

    The digit is extracted through the INTEGER domain — scale by
    10^decimals, round to a bigint, take the first character of its
    decimal rendering — never via floor(log10(v)), whose binary-float
    wobble at exact powers of ten (log10(1000) ≈ 2.9999999999999996)
    silently misclassifies boundary values differently per engine.

    Output: 9 rows (digit 1-9): n, p_obs (5dp), p_exp = log10(1+1/d)
    (5dp), abs_dev (5dp). Only strictly positive values participate.
    """
    scale = float(10**decimals)
    v = F.col(value_col).cast("double")
    as_int = F.floor(v * scale + F.lit(0.5)).cast("bigint")
    digit = F.substring(as_int.cast("string"), 1, 1).cast("int")
    per_d = (
        df.where(v > 0)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_all = Window.partitionBy(F.pmod(F.lit(0), F.lit(1)))
    p_obs = F.col("n") / F.sum("n").over(w_all)
    p_exp = F.log10(1 + 1 / F.col("digit").cast("double"))
    return per_d.select(
        "digit",
        "n",
        F.round(p_obs, 5).alias("p_obs"),
        F.round(p_exp, 5).alias("p_exp"),
        F.round(F.abs(p_obs - p_exp), 5).alias("abs_dev"),
    ).orderBy("digit")


def duck_benford_digits(table: str, value_col: str, decimals: int = 2) -> str:
    """DuckDB twin of :func:`benford_digits` (same integer-domain digit)."""
    scale = float(10**decimals)
    return f"""
    WITH per_d AS (
      SELECT CAST(substr(CAST(CAST(floor(CAST({value_col} AS DOUBLE)
                   * {scale} + 0.5) AS BIGINT) AS VARCHAR), 1, 1) AS INT)
               AS digit,
             COUNT(*) AS n
      FROM {table} WHERE CAST({value_col} AS DOUBLE) > 0
      GROUP BY 1
    )
    SELECT digit, CAST(n AS BIGINT) AS n,
           ROUND(n / SUM(n) OVER (), 5) AS p_obs,
           ROUND(log10(1 + 1.0 / digit), 5) AS p_exp,
           ROUND(abs(n / SUM(n) OVER () - log10(1 + 1.0 / digit)), 5)
             AS abs_dev
    FROM per_d ORDER BY digit
    """
