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

from pyspark.sql import Column, DataFrame, Window
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


def mutual_info(df: DataFrame, row_col: str, col_col: str) -> DataFrame:
    """Mutual information between two categorical columns (nats), with
    the entropy-normalized NMI read-out.

    Same execution shape as :func:`chisq_independence` — one combinable
    groupBy to the R×C contingency cells, margins via windows over those
    few cells — but the read-out is information-theoretic:
    MI = Σ_cells p(r,c)·ln(p(r,c)·n²/(rt·ct)). The marginal entropies
    fall out of the SAME cell pass via the telescoping identity
    Σ_cells (o/n)·(−ln(rt/n)) = Σ_r (rt/n)·(−ln(rt/n)) = H(R), so the
    whole analysis is one scan + one tiny aggregation, no per-margin
    re-aggregation.

    Output (single row): n, mi (5dp), h_r (5dp), h_c (5dp),
    nmi = MI/√(H_r·H_c) (5dp; 0 when either margin is degenerate).
    """
    obs = df.groupBy(
        F.col(row_col).alias("r"), F.col(col_col).alias("c")
    ).agg(F.count(F.lit(1)).alias("o"))
    w_r = Window.partitionBy("r")
    w_c = Window.partitionBy("c")
    w_all = Window.partitionBy(F.pmod(F.lit(0), F.lit(1)))
    cells = obs.select(
        "o",
        F.sum("o").over(w_r).alias("rt"),
        F.sum("o").over(w_c).alias("ct"),
        F.sum("o").over(w_all).alias("n"),
    )
    p = F.col("o") / F.col("n")
    agg = cells.agg(
        F.max("n").alias("n"),
        F.sum(
            p * F.log(F.col("o") * F.col("n") / (F.col("rt") * F.col("ct")))
        ).alias("mi"),
        F.sum(p * -F.log(F.col("rt") / F.col("n"))).alias("h_r"),
        F.sum(p * -F.log(F.col("ct") / F.col("n"))).alias("h_c"),
    )
    nmi = F.when(
        (F.col("h_r") > 0) & (F.col("h_c") > 0),
        F.col("mi") / F.sqrt(F.col("h_r") * F.col("h_c")),
    ).otherwise(F.lit(0.0))
    return agg.select(
        "n",
        F.round("mi", 5).alias("mi"),
        F.round("h_r", 5).alias("h_r"),
        F.round("h_c", 5).alias("h_c"),
        F.round(nmi, 5).alias("nmi"),
    )


def duck_mutual_info(table: str, row_col: str, col_col: str) -> str:
    """DuckDB twin of :func:`mutual_info` (identical arithmetic)."""
    return f"""
    WITH obs AS (
      SELECT {row_col} AS r, {col_col} AS c, COUNT(*) AS o
      FROM {table} GROUP BY 1, 2
    ), cells AS (
      SELECT o,
             SUM(o) OVER (PARTITION BY r) AS rt,
             SUM(o) OVER (PARTITION BY c) AS ct,
             SUM(o) OVER () AS n
      FROM obs
    ), agg AS (
      SELECT CAST(MAX(n) AS BIGINT) AS n,
             SUM(o / n * ln(o * n / (rt * ct))) AS mi,
             SUM(o / n * -ln(rt / n)) AS h_r,
             SUM(o / n * -ln(ct / n)) AS h_c
      FROM cells
    )
    SELECT n, ROUND(mi, 5) AS mi, ROUND(h_r, 5) AS h_r,
           ROUND(h_c, 5) AS h_c,
           ROUND(CASE WHEN h_r > 0 AND h_c > 0
                      THEN mi / sqrt(h_r * h_c) ELSE 0.0 END, 5) AS nmi
    FROM agg
    """


def woe_iv(
    df: DataFrame, bin_col: str, good: Column, smooth: float = 0.5
) -> DataFrame:
    """Weight-of-evidence + information value of a categorical predictor
    against a binary outcome — the credit-scoring feature screen.

    ``good`` is a boolean Column marking the positive class. Per bin:
    WoE = ln(p_good_bin / p_bad_bin) with ``smooth`` Laplace counts (so
    a bin that is all-good or all-bad never produces ±inf), and the bin's
    IV contribution (p_good − p_bad)·WoE. The table-level IV — the
    predictor's screening score — rides along in every row via a window
    over the (tiny) per-bin table.

    One combinable conditional-sum groupBy consumes the fact table; the
    smoothing denominators need the bin count, which comes from a window
    over the per-bin rows, never a second scan. Output per bin: bin,
    goods, bads, woe (5dp), iv_term (5dp), iv (5dp, constant).
    """
    per_bin = df.groupBy(F.col(bin_col).alias("bin")).agg(
        F.sum(F.when(good, 1).otherwise(0)).alias("goods"),
        F.sum(F.when(good, 0).otherwise(1)).alias("bads"),
    )
    w_all = Window.partitionBy(F.pmod(F.lit(0), F.lit(1)))
    tot = per_bin.select(
        "bin",
        "goods",
        "bads",
        F.sum("goods").over(w_all).alias("tg"),
        F.sum("bads").over(w_all).alias("tb"),
        F.count(F.lit(1)).over(w_all).alias("nb"),
    )
    pg = (F.col("goods") + smooth) / (F.col("tg") + smooth * F.col("nb"))
    pb = (F.col("bads") + smooth) / (F.col("tb") + smooth * F.col("nb"))
    woe = F.log(pg / pb)
    term = (pg - pb) * woe
    rows = tot.select(
        "bin",
        "goods",
        "bads",
        F.round(woe, 5).alias("woe"),
        F.round(term, 5).alias("iv_term"),
        F.round(F.sum(term).over(w_all), 5).alias("iv"),
    )
    return rows.orderBy("bin")


def duck_woe_iv(
    table: str, bin_col: str, good_sql: str, smooth: float = 0.5
) -> str:
    """DuckDB twin of :func:`woe_iv`; ``good_sql`` is the boolean
    positive-class expression."""
    return f"""
    WITH per_bin AS (
      SELECT {bin_col} AS bin,
             SUM(CASE WHEN {good_sql} THEN 1 ELSE 0 END) AS goods,
             SUM(CASE WHEN {good_sql} THEN 0 ELSE 1 END) AS bads
      FROM {table} GROUP BY 1
    ), tot AS (
      SELECT bin, goods, bads,
             SUM(goods) OVER () AS tg, SUM(bads) OVER () AS tb,
             COUNT(*) OVER () AS nb
      FROM per_bin
    ), calc AS (
      SELECT bin, CAST(goods AS BIGINT) AS goods,
             CAST(bads AS BIGINT) AS bads,
             ln(((goods + {smooth}) / (tg + {smooth} * nb))
                / ((bads + {smooth}) / (tb + {smooth} * nb))) AS woe,
             ((goods + {smooth}) / (tg + {smooth} * nb)
              - (bads + {smooth}) / (tb + {smooth} * nb))
             * ln(((goods + {smooth}) / (tg + {smooth} * nb))
                  / ((bads + {smooth}) / (tb + {smooth} * nb))) AS term
      FROM tot
    )
    SELECT bin, goods, bads, ROUND(woe, 5) AS woe,
           ROUND(term, 5) AS iv_term,
           ROUND(SUM(term) OVER (), 5) AS iv
    FROM calc ORDER BY bin
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
    (5dp), abs_dev (5dp). Only strictly positive values participate, and
    values that round to integer 0 at the given scale (v < 0.5/10^decimals)
    are excluded — digit 0 has no Benford expectation (log10(1+1/0)
    diverges, NULL in Spark vs inf in DuckDB).
    """
    scale = float(10**decimals)
    v = F.col(value_col).cast("double")
    as_int = F.floor(v * scale + F.lit(0.5)).cast("bigint")
    digit = F.substring(as_int.cast("string"), 1, 1).cast("int")
    per_d = (
        df.where((v > 0) & (as_int >= 1))
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
      FROM {table}
      WHERE CAST({value_col} AS DOUBLE) > 0
        AND CAST(floor(CAST({value_col} AS DOUBLE) * {scale} + 0.5)
                 AS BIGINT) >= 1
      GROUP BY 1
    )
    SELECT digit, CAST(n AS BIGINT) AS n,
           ROUND(n / SUM(n) OVER (), 5) AS p_obs,
           ROUND(log10(1 + 1.0 / digit), 5) AS p_exp,
           ROUND(abs(n / SUM(n) OVER () - log10(1 + 1.0 / digit)), 5)
             AS abs_dev
    FROM per_d ORDER BY digit
    """
