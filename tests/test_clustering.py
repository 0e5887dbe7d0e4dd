"""k-means properties the hash-graded registry row can't express:
correct separation of known blobs, exact centroid arithmetic, the
deterministic cid tie-break, and empty-cluster dropout."""

from __future__ import annotations

from synthea2omop_etl_spark.operators.clustering import kmeans_fixed


def _by_cluster(df):
    return {
        r["cluster"]: (r["n_points"], r["cx"], r["cy"])
        for r in df.collect()
    }


def test_two_blobs_separate(spark):
    # Blob A near (0, 0), blob B near (100, 100); ids chosen so the
    # id % 2 seeding starts mixed — one round must already unmix them.
    rows = [
        (0, 0, 0), (1, 1, 0), (2, 0, 1), (3, 1, 1),
        (4, 100, 100), (5, 101, 100), (6, 100, 101), (7, 101, 101),
    ]
    df = spark.createDataFrame(rows, ["id", "x", "y"])
    out = _by_cluster(kmeans_fixed(df, "id", "x", "y", k=2, iters=2))
    assert len(out) == 2
    sizes = sorted(n for n, _, _ in out.values())
    assert sizes == [4, 4]
    # Exact means: each blob's centroid is its integer-mean ± the 1e-4
    # quantization unit (0.5 and 100.5 are exactly representable).
    cents = sorted((cx, cy) for _, cx, cy in out.values())
    assert cents == [(0.5, 0.5), (100.5, 100.5)]


def test_deterministic_across_runs(spark):
    rows = [(i, i * 7 % 50, i * 13 % 90) for i in range(200)]
    df = spark.createDataFrame(rows, ["id", "x", "y"])
    a = sorted(map(tuple, kmeans_fixed(df, "id", "x", "y").collect()))
    b = sorted(map(tuple, kmeans_fixed(df, "id", "x", "y").collect()))
    assert a == b


def test_counts_cover_every_point(spark):
    rows = [(i, i % 17, (i * 3) % 29) for i in range(123)]
    df = spark.createDataFrame(rows, ["id", "x", "y"])
    out = kmeans_fixed(df, "id", "x", "y", k=4, iters=3).collect()
    assert sum(r["n_points"] for r in out) == 123


def test_equidistant_point_takes_lowest_cid(spark):
    # Seeds (id % 2): cluster 0 = {(0,0)}, cluster 1 = {(10,0)}. Point
    # id=2 at (5,0) is exactly equidistant after round 1 begins — the
    # struct(dist, cid) argmin must route it to cid 0 every round.
    rows = [(0, 0, 0), (1, 10, 0), (2, 5, 0)]
    df = spark.createDataFrame(rows, ["id", "x", "y"])
    # seeds: c0 = mean((0,0),(5,0)) = (2.5, 0)? no — id%2: ids 0,2 → c0
    # mean of (0,0),(5,0) = (2.5,0); c1 = (10,0). Iterating reassigns
    # (5,0): dist to c0 = 2.5^2, to c1 = 5^2 → stays in 0. Fixpoint has
    # 0 ↦ {(0,0),(5,0)}, 1 ↦ {(10,0)}.
    out = _by_cluster(kmeans_fixed(df, "id", "x", "y", k=2, iters=3))
    assert out[0][0] == 2 and out[1][0] == 1
    # Exact tie for EVERY point: both seed buckets hold {(0,0),(10,0)}
    # so both centroids start at (5,0) — every assignment is tied and
    # must route to cid 0, leaving cluster 1 empty.
    rows = [(0, 0, 0), (2, 10, 0), (1, 0, 0), (3, 10, 0)]
    df = spark.createDataFrame(rows, ["id", "x", "y"])
    out = _by_cluster(kmeans_fixed(df, "id", "x", "y", k=2, iters=3))
    assert set(out) == {0} and out[0][0] == 4


def test_empty_cluster_drops_out(spark):
    # k=3 but only two distinct locations: one seed bucket loses all its
    # points after the first assignment and must vanish from the output.
    rows = [(i, 0 if i < 6 else 50, 0) for i in range(12)]
    df = spark.createDataFrame(rows, ["id", "x", "y"])
    out = kmeans_fixed(df, "id", "x", "y", k=3, iters=3).collect()
    assert sum(r["n_points"] for r in out) == 12
    assert len(out) <= 3
