"""as-of join + connected-components tests."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from synthea2omop_etl_spark.llm_ops.cluster import (
    connected_components,
    dedup_clusters,
)
from synthea2omop_etl_spark.operators.asof import as_of_join


def test_as_of_join_basic(spark):
    left = spark.createDataFrame(
        [(1, 10, "e1"), (1, 20, "e2"), (1, 5, "e0"), (2, 10, "f1")],
        "k int, ts int, name string",
    )
    right = spark.createDataFrame(
        [(1, 8, 100.0), (1, 15, 200.0), (2, 11, 300.0)],
        "k int, ts int, price double",
    )
    out = as_of_join(
        left, right, on="k", left_ts="ts", right_ts="ts", value_cols=["price"]
    )
    rows = {r.name: r.asof_price for r in out.collect()}
    assert rows == {"e0": None, "e1": 100.0, "e2": 200.0, "f1": None}


def test_as_of_join_inclusive_and_ties(spark):
    left = spark.createDataFrame([(1, 10, "x")], "k int, ts int, name string")
    right = spark.createDataFrame(
        [(1, 10, 1, 50.0), (1, 10, 2, 60.0)], "k int, ts int, rid long, v double"
    )
    out = as_of_join(
        left, right, "k", "ts", "ts", value_cols=["v"], tiebreak="rid"
    ).collect()
    # equal-ts right row matches (inclusive); last-by-tiebreak wins
    assert out[0].asof_v == 60.0


def test_connected_components_chain_and_islands(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 20)],
        "id_a long, id_b long",
    )
    cc = {r.node: r.component for r in connected_components(edges).collect()}
    assert cc[1] == cc[2] == cc[3] == cc[4] == 1
    assert cc[10] == cc[11] == 10
    assert cc[20] == cc[21] == 20


def test_dedup_clusters_from_minhash_pairs(spark):
    from synthea2omop_etl_spark.llm_ops.dedup import minhash_lsh_candidates
    from synthea2omop_etl_spark.sources.testdata import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(100)
    dups = docs.where(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.col("text"),
        "lang",
        "source",
        "n_chars",
    )
    pairs = minhash_lsh_candidates(
        docs.unionByName(dups), "text", "doc_id", jaccard_threshold=0.8
    )
    clusters = {
        r.doc: r.canonical_id for r in dedup_clusters(pairs).collect()
    }
    # each planted copy clusters with its original, canonical = original id
    found = sum(
        1 for i in range(10) if clusters.get(i + 100000) == i
    )
    assert found >= 9


@pytest.mark.slow
def test_range_join_matches_naive_nonequi(spark):
    """Bucketed range join must produce exactly the naive BETWEEN-join
    result, for intervals shorter, equal to, and longer than the bucket."""
    from synthea2omop_etl_spark.operators.rangejoin import range_join

    facts = spark.createDataFrame(
        [(i, 1000 * i) for i in range(200)], "fid long, sec long"
    ).select("fid", F.timestamp_seconds("sec").alias("ts"))
    intervals = spark.createDataFrame(
        [
            (1, 5_000, 5_500),      # sub-bucket
            (2, 10_000, 13_600),    # ~1 bucket
            (3, 50_000, 120_000),   # many buckets
            (4, 190_000, 205_000),  # overlaps end of facts
        ],
        "iid long, s long, e long",
    ).select(
        "iid",
        F.timestamp_seconds("s").alias("w_start"),
        F.timestamp_seconds("e").alias("w_end"),
    )
    got = {
        (r.fid, r.iid)
        for r in range_join(
            facts, "ts", intervals, "w_start", "w_end", bucket_seconds=3600
        ).collect()
    }
    naive = {
        (r.fid, r.iid)
        for r in facts.join(
            intervals,
            (F.col("ts") >= F.col("w_start")) & (F.col("ts") <= F.col("w_end")),
        ).collect()
    }
    assert got == naive and len(got) > 0

    # plan: equi hash join on the bucket, not a nested-loop
    plan = range_join(
        facts, "ts", intervals, "w_start", "w_end", 3600
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan


def test_range_join_left_semi_preserves_multiplicity(spark):
    """left_semi keeps duplicate covered facts duplicated (true semi-join
    semantics), emits each covered fact once regardless of how many
    intervals cover it, and rejects unknown `how` values."""
    import pytest

    from synthea2omop_etl_spark.operators.rangejoin import range_join

    facts = spark.createDataFrame(
        [(1, 5_000), (1, 5_000), (2, 999_000)],  # fid 1 duplicated; 2 uncovered
        "fid long, sec long",
    ).select("fid", F.timestamp_seconds("sec").alias("ts"))
    intervals = spark.createDataFrame(
        [(1, 4_000, 6_000), (2, 4_500, 9_000)],  # two intervals cover fid 1
        "iid long, s long, e long",
    ).select(
        "iid",
        F.timestamp_seconds("s").alias("w_start"),
        F.timestamp_seconds("e").alias("w_end"),
    )
    out = range_join(
        facts, "ts", intervals, "w_start", "w_end", 3600, how="left_semi"
    )
    assert out.columns == ["fid", "ts"]
    fids = sorted(r.fid for r in out.collect())
    assert fids == [1, 1]  # duplicate preserved, no per-interval fan-out
    with pytest.raises(ValueError, match="unknown how"):
        range_join(facts, "ts", intervals, "w_start", "w_end", 3600, how="semi")
