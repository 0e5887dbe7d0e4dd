"""Poisson-bootstrap confidence intervals — error bars for any grouped
mean, in one pass, at any scale.

The reference reports point aggregates only; an analytics engine feeding
decisions from 100 TB should also say how tight they are. The classic
scale-out answer is the POISSON BOOTSTRAP (resampling-with-replacement
approximated by giving every row an independent Poisson(1) multiplicity
per replicate): no per-replicate data copies, no sampling coordination —
each row computes its R replicate weights locally, so the whole thing is
one grouped aggregation.

Determinism contract (same as the dedup/sampling family): the Poisson
draws come from md5-derived uniforms via an inverse-CDF lookup over
PRECOMPUTED literal thresholds (no libm at query time), so replicate
weights — and therefore the intervals — are bit-reproducible across runs
AND engines; the DuckDB twin uses the identical CASE ladder. One md5
serves FOUR replicates (its 32 hex chars carve into four 32-bit lanes;
u = (lane + 1)/2^32) — md5 was the dominant per-row cost of the whole
computation.

Scale story: rows explode R-fold, but partial aggregation collapses each
task's contribution to (groups × R) running sums before the shuffle — the
map-side-combine shape, same as any grouped sum. Reducer state is
(groups × R) pairs. R in the tens-to-hundreds is the textbook regime;
the ladder truncates the Poisson at 8 (P(X>7 | λ=1) ≈ 1e-5 of the mass
lands on the cap — a bias far below bootstrap noise).

Reference: Chamandy et al., "Estimating Uncertainty for Massive Data
Streams" (Google, 2012) — the canonical large-scale Poisson bootstrap.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from synthea2omop_etl_spark.operators.timeseries import _floor_round

#: Poisson(1) CDF at k = 0..7, as exact double literals shared by both
#: engines. Inverse-CDF: weight = first k whose CDF bound exceeds u;
#: u above the last bound gets the truncation cap 8.
_POIS1_CDF: list[float] = [
    math.exp(-1.0) * sum(1.0 / math.factorial(j) for j in range(k + 1))
    for k in range(8)
]


def _poisson1(u: Column) -> Column:
    w: Column = F.lit(8)
    for k in reversed(range(8)):
        w = F.when(u <= F.lit(_POIS1_CDF[k]), F.lit(k)).otherwise(w)
    return w


def _duck_poisson1(u: str) -> str:
    arms = " ".join(
        f"WHEN {u} <= {_POIS1_CDF[k]!r} THEN {k}" for k in range(8)
    )
    return f"(CASE {arms} ELSE 8 END)"


def bootstrap_mean_ci(
    df: DataFrame,
    value_col: str,
    id_col: str,
    group_cols: list[str],
    replicates: int = 50,
    alpha: float = 0.05,
    salt: str = "boot",
) -> DataFrame:
    """Per-group mean with a percentile-bootstrap (1-alpha) CI.

    Output: group_cols + (mean_value, ci_lo, ci_hi, n_rows), 4dp. The
    point estimate is the plain mean; ci_lo/ci_hi are the alpha/2 and
    1-alpha/2 interpolated percentiles of the R Poisson-replicate means
    (replicates with zero total weight drop out — for group sizes ≫ 1
    the probability of one is e^-n, negligible).
    """
    rep = bootstrap_replicate_means(
        df, value_col, id_col, group_cols, replicates, salt
    )
    reps = rep.groupBy(*group_cols).agg(
        _floor_round(
            F.expr(f"percentile(__rep_mean, {alpha / 2!r})"), 4
        ).alias("ci_lo"),
        _floor_round(
            F.expr(f"percentile(__rep_mean, {1 - alpha / 2!r})"), 4
        ).alias("ci_hi"),
    )
    point = df.groupBy(*group_cols).agg(
        _floor_round(F.avg(value_col), 4).alias("mean_value"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    return point.join(reps, group_cols).select(
        *group_cols, "mean_value", "ci_lo", "ci_hi", "n_rows"
    )


def duck_bootstrap_mean_ci(
    table: str,
    value_col: str,
    id_col: str,
    group_cols: list[str],
    replicates: int = 50,
    alpha: float = 0.05,
    salt: str = "boot",
) -> str:
    """DuckDB twin of :func:`bootstrap_mean_ci` (same uniforms, same CASE
    ladder, same interpolated percentiles)."""
    g = ", ".join(group_cols)
    u = _duck_u(id_col, salt)
    w = _duck_poisson1(u)
    return f"""
    WITH reps AS (
      SELECT {g}, r,
             SUM(w * x) / SUM(w) AS rep_mean
      FROM (
        SELECT {g}, {id_col}, {w} AS w,
               CAST({value_col} AS DOUBLE) AS x, r
        FROM {table}
        CROSS JOIN (SELECT unnest(range({replicates})) AS r)
      )
      GROUP BY {g}, r
      HAVING SUM(w) > 0
    ), ci AS (
      SELECT {g},
             FLOOR((percentile_cont({alpha / 2!r})
                   WITHIN GROUP (ORDER BY rep_mean)) * 1e4 + 0.5) / 1e4
               AS ci_lo,
             FLOOR((percentile_cont({1 - alpha / 2!r})
                   WITHIN GROUP (ORDER BY rep_mean)) * 1e4 + 0.5) / 1e4
               AS ci_hi
      FROM reps GROUP BY {g}
    ), pt AS (
      SELECT {g},
             FLOOR((AVG({value_col})) * 1e4 + 0.5) / 1e4 AS mean_value,
             CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM {table} GROUP BY {g}
    )
    SELECT {g}, mean_value, ci_lo, ci_hi, n_rows
    FROM pt JOIN ci USING ({g})
    """


def bootstrap_diff_ci(
    df: DataFrame,
    value_col: str,
    id_col: str,
    arm_col: str,
    arm_a: str,
    arm_b: str,
    replicates: int = 50,
    alpha: float = 0.05,
    salt: str = "boot",
) -> DataFrame:
    """Two-sample (A/B) comparison: bootstrap CI on the difference in
    means between ``arm_a`` and ``arm_b`` of ``arm_col``.

    Each replicate resamples BOTH arms independently (the same Poisson
    trick and determinism contract as :func:`bootstrap_mean_ci`) and
    takes mean_a - mean_b; the interval is the percentile band of those
    differences, and ``significant`` is the textbook read-out: does the
    (1-alpha) band exclude zero? One grouped aggregation: arms are just
    groups, the difference is a pivot of the replicate means.

    Output (single row): mean_a, mean_b, diff, ci_lo, ci_hi,
    significant, n_a, n_b — all means 4dp.
    """
    arms = df.where(F.col(arm_col).isin([arm_a, arm_b]))
    per_arm_rep = bootstrap_replicate_means(
        arms, value_col, id_col, [arm_col], replicates, salt
    )
    diffs = (
        per_arm_rep.groupBy("__r")
        .pivot(arm_col, [arm_a, arm_b])
        .agg(F.first("__rep_mean"))
        .where(F.col(arm_a).isNotNull() & F.col(arm_b).isNotNull())
        .select((F.col(arm_a) - F.col(arm_b)).alias("__d"))
    )
    band = diffs.agg(
        _floor_round(
            F.expr(f"percentile(__d, {alpha / 2!r})"), 4
        ).alias("ci_lo"),
        _floor_round(
            F.expr(f"percentile(__d, {1 - alpha / 2!r})"), 4
        ).alias("ci_hi"),
    )
    point = arms.groupBy().agg(
        _floor_round(
            F.avg(F.when(F.col(arm_col) == arm_a, F.col(value_col))), 4
        ).alias("mean_a"),
        _floor_round(
            F.avg(F.when(F.col(arm_col) == arm_b, F.col(value_col))), 4
        ).alias("mean_b"),
        F.sum(
            F.when(F.col(arm_col) == arm_a, 1).otherwise(0)
        ).alias("n_a"),
        F.sum(
            F.when(F.col(arm_col) == arm_b, 1).otherwise(0)
        ).alias("n_b"),
    )
    return point.crossJoin(F.broadcast(band)).select(
        "mean_a",
        "mean_b",
        _floor_round(F.col("mean_a") - F.col("mean_b"), 4).alias("diff"),
        "ci_lo",
        "ci_hi",
        ((F.col("ci_lo") > 0) | (F.col("ci_hi") < 0)).alias("significant"),
        "n_a",
        "n_b",
    )


def bootstrap_replicate_means(
    df: DataFrame,
    value_col: str,
    id_col: str,
    group_cols: list[str],
    replicates: int = 50,
    salt: str = "boot",
) -> DataFrame:
    """(group_cols, __r, __rep_mean): the raw per-replicate weighted
    means — the shared core of mean/diff CIs (the same explode + ladder
    + map-side-combined aggregate as :func:`bootstrap_mean_ci`)."""
    # The R-fold explode amplifies work R× BEFORE any shuffle, so upstream
    # parallelism caps the whole computation: a source of few (or single
    # row-group) files runs the ladder on few cores. When the input has
    # fewer concrete file-partitions than the cluster has slots, spread it
    # on the id hash first — that shuffle moves INPUT-sized data to buy
    # R×-parallel compute; sources that are already wide (the 100 TB
    # case) skip it. Probe via inputFiles, never df.rdd.
    slots = df.sparkSession.sparkContext.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:
        n_files = 0
    if 0 < n_files < slots:
        df = df.repartition(slots, id_col)
    # Uniform derivation (round-9): ONE md5 per 4-replicate BLOCK instead
    # of one per replicate — md5 is the dominant per-row cost of the whole
    # CI (R md5s per input row), and its 32 hex chars carve cleanly into
    # four independent 32-bit lanes. replicate r reads lane r%4 of block
    # r//4: u = (hex32[lane] + 1) / 2^32 ∈ (0, 1]. Spark realizes the
    # saving with a two-level explode (blocks → md5 once → lanes); the
    # DuckDB twin computes the identical md5(id|salt|r//4) substring
    # row-wise, so the uniforms — and therefore every replicate weight —
    # agree bit-for-bit (_duck_u).
    n_blocks = (replicates + 3) // 4
    blocks = df.select(
        *group_cols,
        id_col,
        value_col,
        F.explode(F.sequence(F.lit(0), F.lit(n_blocks - 1))).alias("__blk"),
    ).select(
        *group_cols,
        value_col,
        "__blk",
        F.md5(
            F.concat(
                F.col(id_col).cast("string"),
                F.lit(f"|{salt}|"),
                F.col("__blk").cast("string"),
            )
        ).alias("__h"),
    )
    expanded = blocks.select(
        *group_cols,
        value_col,
        "__blk",
        "__h",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("__lane"),
    ).where(F.col("__blk") * 4 + F.col("__lane") < replicates)
    v = F.conv(
        F.col("__h").substr(F.col("__lane") * 8 + 1, F.lit(8)), 16, 10
    ).cast("long")
    u = (v + F.lit(1)).cast("double") / F.lit(4294967296.0)
    return (
        expanded.select(
            *group_cols,
            (F.col("__blk") * 4 + F.col("__lane")).alias("__r"),
            _poisson1(u).alias("__w"),
            F.col(value_col).cast("double").alias("__x"),
        )
        .groupBy(*group_cols, "__r")
        .agg(
            (F.sum(F.col("__w") * F.col("__x")) / F.sum("__w")).alias(
                "__rep_mean"
            )
        )
        .where(F.col("__rep_mean").isNotNull())
    )


def _duck_u(id_col: str, salt: str) -> str:
    """DuckDB twin of the block/lane uniform above, row-wise over ``r``:
    md5(id|salt|r//4), hex lane (r%4)*8+1..+8 → (v+1)/2^32."""
    h = (
        f"md5(CAST({id_col} AS VARCHAR) || '|{salt}|'"
        " || CAST(r // 4 AS VARCHAR))"
    )
    v = f"CAST('0x' || substring({h}, (r % 4) * 8 + 1, 8) AS BIGINT)"
    return f"(({v} + 1) / 4294967296.0)"


def duck_bootstrap_diff_ci(
    table: str,
    value_col: str,
    id_col: str,
    arm_col: str,
    arm_a: str,
    arm_b: str,
    replicates: int = 50,
    alpha: float = 0.05,
    salt: str = "boot",
) -> str:
    """DuckDB twin of :func:`bootstrap_diff_ci`."""
    u = _duck_u(id_col, salt)
    w = _duck_poisson1(u)
    return f"""
    WITH arms AS (
      SELECT * FROM {table} WHERE {arm_col} IN ('{arm_a}', '{arm_b}')
    ), reps AS (
      SELECT {arm_col} AS arm, r, SUM(w * x) / SUM(w) AS rep_mean
      FROM (
        SELECT {arm_col}, {id_col}, {w} AS w,
               CAST({value_col} AS DOUBLE) AS x, r
        FROM arms CROSS JOIN (SELECT unnest(range({replicates})) AS r)
      )
      GROUP BY {arm_col}, r HAVING SUM(w) > 0
    ), diffs AS (
      SELECT a.rep_mean - b.rep_mean AS d
      FROM (SELECT r, rep_mean FROM reps WHERE arm = '{arm_a}') a
      JOIN (SELECT r, rep_mean FROM reps WHERE arm = '{arm_b}') b
        USING (r)
    ), band AS (
      SELECT FLOOR((percentile_cont({alpha / 2!r})
                   WITHIN GROUP (ORDER BY d)) * 1e4 + 0.5) / 1e4 AS ci_lo,
             FLOOR((percentile_cont({1 - alpha / 2!r})
                   WITHIN GROUP (ORDER BY d)) * 1e4 + 0.5) / 1e4 AS ci_hi
      FROM diffs
    ), pt AS (
      SELECT FLOOR((AVG(CASE WHEN {arm_col} = '{arm_a}'
                        THEN {value_col} END)) * 1e4 + 0.5) / 1e4 AS mean_a,
             FLOOR((AVG(CASE WHEN {arm_col} = '{arm_b}'
                        THEN {value_col} END)) * 1e4 + 0.5) / 1e4 AS mean_b,
             CAST(SUM(CASE WHEN {arm_col} = '{arm_a}' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_a,
             CAST(SUM(CASE WHEN {arm_col} = '{arm_b}' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_b
      FROM arms
    )
    SELECT mean_a, mean_b,
           FLOOR((mean_a - mean_b) * 1e4 + 0.5) / 1e4 AS diff,
           ci_lo, ci_hi, (ci_lo > 0 OR ci_hi < 0) AS significant, n_a, n_b
    FROM pt CROSS JOIN band
    """
