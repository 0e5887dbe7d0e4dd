"""Fixed-iteration k-means over integer feature columns — iterative ML.

The reference has no clustering, but a training-data pipeline does:
stratifying a corpus by feature clusters, diversity-sampling shards,
collapsing near-identical numeric profiles. This is Lloyd's algorithm with
the two choices that make it a *gradeable distributed operator* rather than
a heuristic:

- **Fixed iteration count, deterministic seeding.** Seeds are the means of
  the ``id % k`` partition buckets (the classic "random partition" init,
  made reproducible), and the loop runs exactly ``iters`` rounds — so the
  whole computation is SQL-expressible and the DuckDB oracle
  (:func:`duck_kmeans`) unrolls the identical rounds as chained CTEs.
- **Integer-quantized geometry.** Features enter as integers (callers cast
  money to cents, etc.); points and centroids live in ``scale``-scaled
  micro-units, centroid means are floor-half-up rounded to integer
  micro-units, and every distance comparison is exact int64 arithmetic.
  No float comparison decides an assignment, so Spark and any oracle
  engine agree bit-for-bit — immune to FMA contraction / summation-order
  ulp drift that plagues naive float k-means parity. Quantizing centroids
  to 1e-4 of a feature unit perturbs the fixpoint immeasurably relative
  to k-means' own local-optimum variance.

Spark-first design:
- The assignment step is **map-side**: the k centroids ride along as ONE
  broadcast array-of-structs row and each point takes
  ``array_min(transform(centroids, c -> struct(dist, cid)))`` — argmin
  with deterministic cid tie-break, no shuffle, no UDF, full codegen.
- The update step is ONE combinable groupBy per round (k groups): sums and
  counts partial-aggregate map-side, so per-round cost is a scan plus a
  k-row shuffle.
- Per-round centroids are ``localCheckpoint``-ed (k rows — trivially
  small); without it round N's lazy plan re-embeds and re-executes rounds
  1..N-1, turning O(iters) scans into O(iters^2) (same pattern as
  operators/graph.py pagerank).

Scale story at 100 TB: per round = one columnar scan of the 2-3 projected
feature columns + a k-row aggregate. State is k centroids. Exactness
bound: sums stay float-exact while ``|sum(x)| * scale < 2^53`` per
cluster; beyond that the mean picks up ~1e-16 relative error — harmless
for clustering itself, the quantization contract is what the cross-engine
gate needs. Distances need ``(max|x| * scale)^2 * dims < 2^63``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from synthea2omop_etl_spark.operators.lineage import cut_lineage


def kmeans_fixed(
    df: DataFrame,
    id_col: str | Column,
    x: str | Column,
    y: str | Column,
    k: int = 4,
    iters: int = 3,
    scale: int = 10_000,
) -> DataFrame:
    """Cluster 2-D integer features; return per-cluster summary.

    ``x``/``y`` must be integer-valued expressions (cast money to cents
    first). Output: (cluster, n_points, cx, cy) — final-assignment counts
    and centroids in original feature units, cluster ids are the surviving
    seed-bucket ids (a bucket that loses every point simply drops out).
    """
    pts = df.select(
        F.col(id_col).alias("pid") if isinstance(id_col, str) else id_col.alias("pid"),
        ((F.col(x) if isinstance(x, str) else x).cast("bigint") * scale).alias("pxq"),
        ((F.col(y) if isinstance(y, str) else y).cast("bigint") * scale).alias("pyq"),
    )

    def means(assigned: DataFrame) -> DataFrame:
        # floor-based half-up to integer micro-units: identical IEEE
        # divide + floor in Spark and DuckDB (same convention as
        # llm_ops/text.py _round4).
        cnt = F.count(F.lit(1))
        return assigned.groupBy("cid").agg(
            cnt.alias("n"),
            F.floor(F.sum("pxq").cast("double") / cnt + F.lit(0.5))
            .cast("bigint")
            .alias("cxq"),
            F.floor(F.sum("pyq").cast("double") / cnt + F.lit(0.5))
            .cast("bigint")
            .alias("cyq"),
        )

    def assign(centroids: DataFrame) -> DataFrame:
        # One broadcast row holding all k centroids; argmin is a pure
        # column expression (struct ordering = (dist, cid), so ties break
        # on the lowest cluster id in both engines).
        cs = centroids.agg(
            F.sort_array(
                F.collect_list(F.struct("cid", "cxq", "cyq"))
            ).alias("cs")
        )
        dx = lambda c: F.col("pxq") - c["cxq"]  # noqa: E731
        dy = lambda c: F.col("pyq") - c["cyq"]  # noqa: E731
        best = F.array_min(
            F.transform(
                F.col("cs"),
                lambda c: F.struct(
                    (dx(c) * dx(c) + dy(c) * dy(c)).alias("dist"),
                    c["cid"].alias("cid"),
                ),
            )
        )
        return pts.crossJoin(F.broadcast(cs)).select(
            "pid", "pxq", "pyq", best["cid"].alias("cid")
        )

    seeded = pts.select(
        (F.col("pid") % k).cast("bigint").alias("cid"), "pxq", "pyq"
    )
    # LAZY checkpoints (r12, guide §1/§2.4 — fewer jobs): each round's
    # centroid frame is materialized by the NEXT round's broadcast build
    # (the first job that reads it), so the loop pays one job per round
    # instead of two (eager materialize + broadcast build). Lineage still
    # truncates at every round once materialized.
    centroids = means(seeded).transform(cut_lineage)
    for _ in range(iters):
        centroids = means(assign(centroids)).transform(cut_lineage)
    return centroids.select(
        F.col("cid").alias("cluster"),
        F.col("n").alias("n_points"),
        (F.col("cxq") / F.lit(float(scale))).alias("cx"),
        (F.col("cyq") / F.lit(float(scale))).alias("cy"),
    )


def duck_kmeans(
    table_sql: str,
    id_col: str,
    x: str,
    y: str,
    k: int = 4,
    iters: int = 3,
    scale: int = 10_000,
) -> str:
    """DuckDB twin of :func:`kmeans_fixed`: the same fixed rounds unrolled
    into chained CTEs (seed means, then iters x [QUALIFY-argmin assign,
    re-mean]). ``table_sql`` must yield (id, x, y) with integer x/y."""
    mean = (
        "FLOOR(CAST(SUM({c}) AS DOUBLE) / COUNT(*) + 0.5)::BIGINT AS {c2}"
    )
    parts = [
        f"WITH __pts AS (SELECT {id_col} AS pid,"
        f" CAST({x} AS BIGINT) * {scale} AS pxq,"
        f" CAST({y} AS BIGINT) * {scale} AS pyq FROM ({table_sql}))",
        f"__c0 AS (SELECT CAST(pid % {k} AS BIGINT) AS cid, COUNT(*) AS n,"
        f" {mean.format(c='pxq', c2='cxq')},"
        f" {mean.format(c='pyq', c2='cyq')}"
        f" FROM __pts GROUP BY 1)",
    ]
    prev = "__c0"
    for i in range(1, iters + 1):
        parts.append(
            f"__a{i} AS (SELECT p.pid, p.pxq, p.pyq, c.cid"
            f" FROM __pts p CROSS JOIN {prev} c"
            f" QUALIFY ROW_NUMBER() OVER (PARTITION BY p.pid ORDER BY"
            f" (p.pxq - c.cxq) * (p.pxq - c.cxq)"
            f" + (p.pyq - c.cyq) * (p.pyq - c.cyq), c.cid) = 1)"
        )
        parts.append(
            f"__c{i} AS (SELECT cid, COUNT(*) AS n,"
            f" {mean.format(c='pxq', c2='cxq')},"
            f" {mean.format(c='pyq', c2='cyq')}"
            f" FROM __a{i} GROUP BY cid)"
        )
        prev = f"__c{i}"
    parts.append(
        f"SELECT cid AS cluster, n AS n_points,"
        f" cxq / {float(scale)} AS cx, cyq / {float(scale)} AS cy"
        f" FROM {prev}"
    )
    return ",\n".join(parts[:-1]) + "\n" + parts[-1]
