"""as-of join + connected-components tests."""

from __future__ import annotations

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
