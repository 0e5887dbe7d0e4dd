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
