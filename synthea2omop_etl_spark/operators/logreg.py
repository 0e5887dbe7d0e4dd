"""Fixed-iteration logistic regression (Newton-Raphson, 2 parameters).

The in-engine "quality classifier probe": LLM curation pipelines fit
cheap logistic scorers over handcrafted signals (length ratios, stopword
density, …) to rank documents; this operator trains exactly that —
P(y=1) = sigmoid(b0 + b1·x) — without leaving the engine, the same way
operators/clustering.py runs Lloyd rounds in-engine.

Execution shape (the 100 TB story): each Newton round is ONE map-side-
combinable aggregate over the fact table — five running sums
(Σ(y−p), Σ(y−p)x, Σw, Σwx, Σwx²  with  p = σ(b0+b1x), w = p(1−p)) —
followed by a 2×2 solve on the driver (1 collected row per round, the
driver-paced-iteration pattern shared with kmeans_fixed /
greedy_coverage_select). No per-row state, no shuffle beyond the
aggregate's partial-merge; rounds scale with iters, not data.

Cross-engine determinism (the kmeans trick, adapted): each round's betas
are rounded to 1e-6 before they re-enter the next round's expressions,
so the Spark run and the DuckDB oracle (:func:`duck_logistic_fit`, the
same rounds unrolled as chained CTEs with the same ROUND) walk identical
beta sequences — the only float divergence left is last-ulp error in the
five sums, absorbed by the rounding. Final output rounds to 1e-4. The
iteration count is FIXED (no convergence test), which is what keeps the
result SQL-expressible.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _round6(v: float) -> float:
    """Floor-based half-up at 1e-6 — the repo's cross-engine rounding
    convention for derived floats (operators/timeseries._floor_round):
    both engines (and this driver-side twin) run the IDENTICAL double
    multiply/floor/divide, so the beta sequences agree bit-for-bit even
    on .xxxxxx5-boundary values, where decimal-based HALF_UP and
    DuckDB's exact-binary ROUND disagree by the last digit."""
    return math.floor(v * 1e6 + 0.5) / 1e6


def _sums(df: DataFrame, x: Column, y: Column, b0: float, b1: float):
    """The five Newton sufficient statistics for the current betas, plus
    the row count — one combinable aggregate."""
    t = F.lit(b0) + F.lit(b1) * x
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-t))
    w = p * (F.lit(1.0) - p)
    r = y.cast("double") - p
    return df.agg(
        F.sum(r).alias("g0"),
        F.sum(r * x).alias("g1"),
        F.sum(w).alias("h00"),
        F.sum(w * x).alias("h01"),
        F.sum(w * x * x).alias("h11"),
        F.count(F.lit(1)).alias("n"),
    )


def _step(b0: float, b1: float, g0, g1, h00, h01, h11):
    if g0 is None or h00 is None:
        raise ValueError(
            "logistic_fit: degenerate input — empty DataFrame (the "
            "Newton sums are NULL)"
        )
    det = h00 * h11 - h01 * h01
    if abs(det) < 1e-12:
        raise ValueError(
            "logistic_fit: singular Hessian (constant x, separable "
            "data, or degenerate weights) — det ≈ 0"
        )
    return (
        _round6(b0 + (h11 * g0 - h01 * g1) / det),
        _round6(b1 + (h00 * g1 - h01 * g0) / det),
    )


def logistic_fit(
    df: DataFrame, x_col: str, y_col: str, iters: int = 3
) -> DataFrame:
    """Fit P(y=1) = sigmoid(b0 + b1·x) by ``iters`` Newton rounds from
    (0, 0). ``y_col`` must be 0/1 (or boolean), ``x_col`` numeric —
    small-integer features keep the problem well-conditioned at any
    scale. Returns ONE engine-computed row (beta0, beta1, n_rows): rounds
    1..iters-1 are driver-paced; the FINAL round stays a Spark plan, so
    the returned DataFrame is the engine's computation, not a driver
    constant."""
    if iters < 1:
        raise ValueError("iters must be >= 1")
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("int")
    b0, b1 = 0.0, 0.0
    for _ in range(iters - 1):
        row = _sums(df, x, y, b0, b1).collect()[0]
        b0, b1 = _step(b0, b1, row.g0, row.g1, row.h00, row.h01, row.h11)
    s = _sums(df, x, y, b0, b1)
    det = F.col("h00") * F.col("h11") - F.col("h01") * F.col("h01")
    nb0 = F.lit(b0) + (F.col("h11") * F.col("g0")
                       - F.col("h01") * F.col("g1")) / det
    nb1 = F.lit(b1) + (F.col("h00") * F.col("g1")
                       - F.col("h01") * F.col("g0")) / det
    from synthea2omop_etl_spark.operators.timeseries import _floor_round

    return s.select(
        _floor_round(nb0, 4).alias("beta0"),
        _floor_round(nb1, 4).alias("beta1"),
        F.col("n").alias("n_rows"),
    )


def duck_logistic_fit(
    rows_sql: str, x_col: str, y_col: str, iters: int = 3
) -> str:
    """DuckDB twin: the same Newton rounds unrolled as chained CTEs, betas
    rounded to 1e-6 between rounds and 1e-4 at the end. ``rows_sql``
    yields (x_col, y_col)."""
    if iters < 1:
        raise ValueError("iters must be >= 1")
    x, y = x_col, y_col
    parts = [
        f"__rows AS (SELECT CAST({x} AS DOUBLE) AS x,"
        f" CAST({y} AS INT) AS y FROM ({rows_sql}) __r)",
        "b0 AS (SELECT 0.0::DOUBLE AS b0, 0.0::DOUBLE AS b1)",
    ]
    for i in range(1, iters + 1):
        prev = f"b{i - 1}"
        last = i == iters
        nd = 4 if last else 6
        parts.append(
            f"s{i} AS (SELECT SUM(y - p) AS g0, SUM((y - p) * x) AS g1,"
            " SUM(p * (1 - p)) AS h00, SUM(p * (1 - p) * x) AS h01,"
            " SUM(p * (1 - p) * x * x) AS h11, COUNT(*) AS n FROM ("
            "SELECT x, y, 1.0 / (1.0 + EXP(-(b.b0 + b.b1 * x))) AS p"
            f" FROM __rows, {prev} b) __p)"
        )
        # floor-half-up at 1e-6 between rounds / 1e-4 at the end — the
        # repo's derived-float rounding convention (matches _round6 and
        # _floor_round on the Spark side)
        scale = f"1e{nd}"
        parts.append(
            f"b{i} AS (SELECT"
            f" FLOOR((b.b0 + (s.h11 * s.g0 - s.h01 * s.g1) /"
            f" (s.h00 * s.h11 - s.h01 * s.h01)) * {scale} + 0.5)"
            f" / {scale} AS b0,"
            f" FLOOR((b.b1 + (s.h00 * s.g1 - s.h01 * s.g0) /"
            f" (s.h00 * s.h11 - s.h01 * s.h01)) * {scale} + 0.5)"
            f" / {scale} AS b1,"
            f" s.n AS n FROM {prev} b, s{i} s)"
        )
    joined = ",\n".join(parts)
    return (
        f"WITH {joined}\n"
        f"SELECT b0 AS beta0, b1 AS beta1, n AS n_rows FROM b{iters}"
    )


def _sums2(df, x1, x2, y, b0: float, b1: float, b2: float):
    """Nine Newton sufficient statistics for the 3-parameter model —
    still ONE combinable aggregate."""
    t = F.lit(b0) + F.lit(b1) * x1 + F.lit(b2) * x2
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-t))
    w = p * (F.lit(1.0) - p)
    r = y.cast("double") - p
    return df.agg(
        F.sum(r).alias("g0"),
        F.sum(r * x1).alias("g1"),
        F.sum(r * x2).alias("g2"),
        F.sum(w).alias("a"),
        F.sum(w * x1).alias("b"),
        F.sum(w * x2).alias("c"),
        F.sum(w * x1 * x1).alias("d"),
        F.sum(w * x1 * x2).alias("e"),
        F.sum(w * x2 * x2).alias("f"),
        F.count(F.lit(1)).alias("n"),
    )


def _step2(bs, row):
    """One driver-side Newton step via the symmetric 3x3 adjugate —
    the EXACT arithmetic sequence the in-plan final round and the
    DuckDB oracle repeat (same sub-expression order, so every engine
    walks the identical beta path after 1e-6 rounding)."""
    g0, g1, g2 = row.g0, row.g1, row.g2
    a, b, c, d, e, f = row.a, row.b, row.c, row.d, row.e, row.f
    if g0 is None or a is None:
        raise ValueError("logistic_fit2: degenerate input — empty frame")
    det = a * (d * f - e * e) - b * (b * f - c * e) + c * (b * e - c * d)
    if abs(det) < 1e-12:
        raise ValueError(
            "logistic_fit2: singular Hessian (collinear features, "
            "separable data, or degenerate weights) — det ≈ 0"
        )
    i00 = d * f - e * e
    i01 = c * e - b * f
    i02 = b * e - c * d
    i11 = a * f - c * c
    i12 = b * c - a * e
    i22 = a * d - b * b
    return (
        _round6(bs[0] + (i00 * g0 + i01 * g1 + i02 * g2) / det),
        _round6(bs[1] + (i01 * g0 + i11 * g1 + i12 * g2) / det),
        _round6(bs[2] + (i02 * g0 + i12 * g1 + i22 * g2) / det),
    )


def logistic_fit2(
    df: DataFrame, x1_col: str, x2_col: str, y_col: str, iters: int = 3
) -> DataFrame:
    """Fit P(y=1) = sigmoid(b0 + b1·x1 + b2·x2) by ``iters`` Newton
    rounds from (0,0,0) — the TRAINABLE quality-classifier shape
    (fastText-style curation filters fit exactly this over cheap text
    signals; :func:`logistic_fit` is the 1-feature probe). Same
    execution contract: each round is ONE map-side-combinable aggregate
    (nine sums + count), the 3×3 solve is closed-form (symmetric
    adjugate — no matrix library, SQL-expressible), rounds are
    driver-paced with 1e-6 beta rounding, and the FINAL round stays a
    Spark plan so the returned row is engine-computed.

    Returns one row: (beta0, beta1, beta2, n_rows), betas floor-half-up
    4dp."""
    if iters < 1:
        raise ValueError("iters must be >= 1")
    x1 = F.col(x1_col).cast("double")
    x2 = F.col(x2_col).cast("double")
    y = F.col(y_col).cast("int")
    bs = (0.0, 0.0, 0.0)
    for _ in range(iters - 1):
        row = _sums2(df, x1, x2, y, *bs).collect()[0]
        bs = _step2(bs, row)
    s = _sums2(df, x1, x2, y, *bs)
    a, b, c = F.col("a"), F.col("b"), F.col("c")
    d, e, f = F.col("d"), F.col("e"), F.col("f")
    g0, g1, g2 = F.col("g0"), F.col("g1"), F.col("g2")
    det = a * (d * f - e * e) - b * (b * f - c * e) + c * (b * e - c * d)
    i00 = d * f - e * e
    i01 = c * e - b * f
    i02 = b * e - c * d
    i11 = a * f - c * c
    i12 = b * c - a * e
    i22 = a * d - b * b
    from synthea2omop_etl_spark.operators.timeseries import _floor_round

    return s.select(
        _floor_round(
            F.lit(bs[0]) + (i00 * g0 + i01 * g1 + i02 * g2) / det, 4
        ).alias("beta0"),
        _floor_round(
            F.lit(bs[1]) + (i01 * g0 + i11 * g1 + i12 * g2) / det, 4
        ).alias("beta1"),
        _floor_round(
            F.lit(bs[2]) + (i02 * g0 + i12 * g1 + i22 * g2) / det, 4
        ).alias("beta2"),
        F.col("n").alias("n_rows"),
    )


def duck_logistic_fit2(
    rows_sql: str, x1_col: str, x2_col: str, y_col: str, iters: int = 3
) -> str:
    """DuckDB twin of :func:`logistic_fit2` — the same Newton rounds
    unrolled, the same adjugate sub-expression order, 1e-6 rounding
    between rounds, 1e-4 at the end. ``rows_sql`` yields
    (x1_col, x2_col, y_col)."""
    if iters < 1:
        raise ValueError("iters must be >= 1")
    parts = [
        f"__rows AS (SELECT CAST({x1_col} AS DOUBLE) AS x1,"
        f" CAST({x2_col} AS DOUBLE) AS x2,"
        f" CAST({y_col} AS INT) AS y FROM ({rows_sql}) __r)",
        "b0 AS (SELECT 0.0::DOUBLE AS b0, 0.0::DOUBLE AS b1,"
        " 0.0::DOUBLE AS b2)",
    ]
    adj = {
        "i00": "(s.d * s.f - s.e * s.e)",
        "i01": "(s.c * s.e - s.b * s.f)",
        "i02": "(s.b * s.e - s.c * s.d)",
        "i11": "(s.a * s.f - s.c * s.c)",
        "i12": "(s.b * s.c - s.a * s.e)",
        "i22": "(s.a * s.d - s.b * s.b)",
    }
    det = (
        "(s.a * (s.d * s.f - s.e * s.e) - s.b * (s.b * s.f - s.c * s.e)"
        " + s.c * (s.b * s.e - s.c * s.d))"
    )
    for i in range(1, iters + 1):
        prev = f"b{i - 1}"
        nd = 4 if i == iters else 6
        scale = f"1e{nd}"
        parts.append(
            f"s{i} AS (SELECT SUM(y - p) AS g0, SUM((y - p) * x1) AS g1,"
            " SUM((y - p) * x2) AS g2,"
            " SUM(p * (1 - p)) AS a, SUM(p * (1 - p) * x1) AS b,"
            " SUM(p * (1 - p) * x2) AS c, SUM(p * (1 - p) * x1 * x1) AS d,"
            " SUM(p * (1 - p) * x1 * x2) AS e,"
            " SUM(p * (1 - p) * x2 * x2) AS f, COUNT(*) AS n FROM ("
            "SELECT x1, x2, y,"
            " 1.0 / (1.0 + EXP(-(b.b0 + b.b1 * x1 + b.b2 * x2))) AS p"
            f" FROM __rows, {prev} b) __p)"
        )
        parts.append(
            f"b{i} AS (SELECT"
            f" FLOOR((b.b0 + ({adj['i00']} * s.g0 + {adj['i01']} * s.g1"
            f" + {adj['i02']} * s.g2) / {det}) * {scale} + 0.5)"
            f" / {scale} AS b0,"
            f" FLOOR((b.b1 + ({adj['i01']} * s.g0 + {adj['i11']} * s.g1"
            f" + {adj['i12']} * s.g2) / {det}) * {scale} + 0.5)"
            f" / {scale} AS b1,"
            f" FLOOR((b.b2 + ({adj['i02']} * s.g0 + {adj['i12']} * s.g1"
            f" + {adj['i22']} * s.g2) / {det}) * {scale} + 0.5)"
            f" / {scale} AS b2,"
            f" s.n AS n FROM {prev} b, s{i} s)"
        )
    joined = ",\n".join(parts)
    return (
        f"WITH {joined}\n"
        f"SELECT b0 AS beta0, b1 AS beta1, b2 AS beta2, n AS n_rows"
        f" FROM b{iters}"
    )
