"""Record linkage (blocked fuzzy match) and snapshot-diff semantics."""

from __future__ import annotations

import pytest

from synthea2omop_etl_spark.llm_ops.index import posting_lists
from synthea2omop_etl_spark.llm_ops.text import (
    nfc_normalize_pandas,
    normalize_text,
)
from synthea2omop_etl_spark.operators.linkage import (
    blocked_fuzzy_pairs,
    snapshot_diff,
)
from synthea2omop_etl_spark.operators.percentiles import equi_width_histogram


# ---------------------------------------------------------------------------
# blocked_fuzzy_pairs
# ---------------------------------------------------------------------------

def test_fuzzy_pairs_within_block(spark):
    df = spark.createDataFrame(
        [
            (1, "red widget", "B1"),
            (2, "red gadget", "B1"),  # lev 2 from #1, same block
            (3, "red widget", "B2"),  # identical name, different block
            (4, "completely different", "B1"),
        ],
        "k long, name string, blk string",
    )
    rows = blocked_fuzzy_pairs(
        df, "k", "name", ["blk"], max_distance=3
    ).collect()
    assert [(r.k1, r.k2, r.edit_distance) for r in rows] == [(1, 2, 2)]


def test_fuzzy_pairs_each_pair_once(spark):
    df = spark.createDataFrame(
        [(i, "same name", "B") for i in range(4)],
        "k long, name string, blk string",
    )
    rows = blocked_fuzzy_pairs(df, "k", "name", ["blk"], 0).collect()
    # 4 choose 2, each with k1 < k2
    assert len(rows) == 6
    assert all(r.k1 < r.k2 for r in rows)


# ---------------------------------------------------------------------------
# snapshot_diff
# ---------------------------------------------------------------------------

def test_snapshot_diff_classification(spark):
    old = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, None), (4, 40.0)], "k long, v double"
    )
    new = spark.createDataFrame(
        [(1, 10.0), (2, 25.0), (3, None), (5, 50.0)], "k long, v double"
    )
    out = {
        r.k: r.change_type
        for r in snapshot_diff(old, new, ["k"], ["v"]).collect()
    }
    # k=1 unchanged (dropped), k=3 NULL == NULL null-safe (dropped)
    assert out == {2: "changed", 4: "removed", 5: "added"}


def test_snapshot_diff_null_transition_is_change(spark):
    old = spark.createDataFrame([(1, None)], "k long, v double")
    new = spark.createDataFrame([(1, 1.0)], "k long, v double")
    rows = snapshot_diff(old, new, ["k"], ["v"]).collect()
    assert rows[0].change_type == "changed"
    assert rows[0].old_v is None and rows[0].new_v == 1.0


def test_snapshot_diff_include_unchanged(spark):
    old = spark.createDataFrame([(1, 1.0)], "k long, v double")
    out = snapshot_diff(old, old, ["k"], ["v"], include_unchanged=True)
    assert out.collect()[0].change_type == "unchanged"


# ---------------------------------------------------------------------------
# equi_width_histogram
# ---------------------------------------------------------------------------

def test_histogram_clamps_out_of_range(spark):
    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (9.9,), (10.0,), (95.0,), (200.0,), (None,)],
        "v double",
    )
    rows = {
        r.bucket: r.n_rows
        for r in equi_width_histogram(df, "v", 0.0, 100.0, 10).collect()
    }
    # -5 clamps into bucket 0; 200 clamps into bucket 9; NULL dropped
    assert rows == {0: 3, 1: 1, 9: 2}


def test_histogram_bucket_edges(spark):
    df = spark.createDataFrame([(25.0,)], "v double")
    r = equi_width_histogram(df, "v", 0.0, 100.0, 4).collect()[0]
    assert (r.bucket, r.bucket_lo, r.bucket_hi) == (1, 25.0, 50.0)


def test_histogram_rejects_bad_args(spark):
    df = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(ValueError):
        equi_width_histogram(df, "v", 10.0, 0.0, 4)
    with pytest.raises(ValueError):
        equi_width_histogram(df, "v", 0.0, 10.0, 0)


# ---------------------------------------------------------------------------
# posting_lists
# ---------------------------------------------------------------------------

def test_posting_lists_fences_and_truncation(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta beta common"),
            (2, "alpha gamma common"),
            (3, "alpha common"),
            (4, "alpha common"),
            (5, "alpha rare1 common"),
            (6, "alpha common"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.token: (r.doc_freq, r.posting)
        for r in posting_lists(
            docs, "text", "doc_id", k=3, min_df=2, max_df_frac=0.9
        ).collect()
    }
    # hapax (beta appears in 1 doc even though twice; rare1/gamma df=1) drop
    assert "rare1" not in out and "gamma" not in out and "beta" not in out
    # alpha/common df=6 = 1.0 > 0.9 ceiling -> dropped as stopword-frequency
    assert "alpha" not in out and "common" not in out


def test_posting_lists_counts_doc_once_and_truncates(spark):
    docs = spark.createDataFrame(
        [(i, "tok tok tok") for i in range(5)] + [(9, "other filler")],
        "doc_id long, text string",
    )
    out = {
        r.token: (r.doc_freq, r.posting)
        for r in posting_lists(
            docs, "text", "doc_id", k=3, min_df=2, max_df_frac=0.99
        ).collect()
    }
    # duplicate tokens within a doc count once; posting truncated to k=3
    assert out["tok"] == (5, "0,1,2")


# ---------------------------------------------------------------------------
# normalize_text / NFC slow path
# ---------------------------------------------------------------------------

def test_normalize_text(spark):
    df = spark.createDataFrame(
        [("  Hello\tWORLD\x00 \x1f  foo\n\nbar  ",)], "t string"
    )
    out = df.select(normalize_text("t").alias("n")).collect()[0].n
    assert out == "hello world foo bar"


def test_nfc_normalize_pandas(spark):
    decomposed = "e\u0301clair"  # e + combining acute
    df = spark.createDataFrame([(decomposed,)], "t string")
    out = nfc_normalize_pandas(df, "t").collect()[0].text_nfc
    assert out == "\u00e9clair"  # precomposed \xe9
    assert out != decomposed


def test_snapshot_diff_roundtrip(spark):
    # apply(old, diff(old, new)) == new — the CDC replay contract
    from synthea2omop_etl_spark.operators.linkage import apply_snapshot_diff

    old = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 20.0, "b"), (3, None, "c"), (4, 40.0, None)],
        "k long, v double, s string",
    )
    new = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 21.0, "b"), (3, None, "z"), (5, 50.0, "e")],
        "k long, v double, s string",
    )
    diff = snapshot_diff(old, new, ["k"], ["v", "s"])
    rebuilt = apply_snapshot_diff(old, diff, ["k"], ["v", "s"])
    assert sorted(map(tuple, rebuilt.collect())) == sorted(
        map(tuple, new.collect())
    )


def test_normalize_text_idempotent(spark):
    from synthea2omop_etl_spark.llm_ops.text import normalize_text
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("  MiXeD \t Case\x1f\x00 text  \n here ",), ("already clean",)],
        "t string",
    )
    once = df.select(normalize_text("t").alias("n"))
    twice = once.select(normalize_text("n").alias("n"))
    assert [r.n for r in once.collect()] == [r.n for r in twice.collect()]


def test_shuffle_positions_permutation_and_seed(spark):
    from synthea2omop_etl_spark.llm_ops.curation import shuffle_positions

    df = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    a = shuffle_positions(df, "doc_id", seed="a").collect()
    # exact permutation of 1..N
    assert sorted(r.shuffle_pos for r in a) == list(range(1, 101))
    # same seed replays identically
    a2 = shuffle_positions(df, "doc_id", seed="a").collect()
    assert {(r.doc_id, r.shuffle_pos) for r in a} == {
        (r.doc_id, r.shuffle_pos) for r in a2
    }
    # different seed is a different permutation
    b = shuffle_positions(df, "doc_id", seed="b").collect()
    assert {(r.doc_id, r.shuffle_pos) for r in a} != {
        (r.doc_id, r.shuffle_pos) for r in b
    }
    # and it actually shuffles (not identity order)
    assert [r.doc_id for r in sorted(a, key=lambda r: r.shuffle_pos)] != list(
        range(100)
    )


def test_vocab_encode_roundtrip(spark):
    from synthea2omop_etl_spark.llm_ops.vocab import (
        build_vocab,
        encode_documents,
    )

    docs = spark.createDataFrame(
        [(1, "b a a"), (2, "a c b"), (3, "a")], "doc_id long, text string"
    )
    vocab = {r.token: r.token_id for r in build_vocab(docs, "text").collect()}
    # a (4 uses) -> 1, b (2) -> 2, c (1) -> 3
    assert vocab == {"a": 1, "b": 2, "c": 3}
    enc = {
        r.doc_id: (r.n_tokens, r.ids)
        for r in encode_documents(docs, "text", "doc_id", build_vocab(docs, "text")).collect()
    }
    assert enc == {1: (3, "2 1 1"), 2: (3, "1 3 2"), 3: (1, "1")}


def test_vocab_encode_oov_and_max_size(spark):
    from synthea2omop_etl_spark.llm_ops.vocab import (
        build_vocab,
        encode_documents,
    )

    train = spark.createDataFrame([(1, "a a b")], "doc_id long, text string")
    vocab = build_vocab(train, "text", max_size=1)  # only 'a' survives
    new = spark.createDataFrame([(9, "b a z")], "doc_id long, text string")
    r = encode_documents(new, "text", "doc_id", vocab).collect()[0]
    assert (r.n_tokens, r.ids) == (3, "0 1 0")  # b, z -> OOV 0
