"""Nearest-neighbor resample kernel semantics."""

from __future__ import annotations

import pytest

from synthea2omop_etl_spark.llm_ops.multimodal import (
    attach_payload,
    resize_nearest,
)


def _table(spark, payloads):
    return attach_payload(
        spark.createDataFrame(
            [(i, t) for i, t in enumerate(payloads)], "id long, t string"
        ),
        "t",
        "id",
    )


def test_resize_gather_semantics(spark):
    # "abcd" -> target 2: indices 0*4//2=0, 1*4//2=2 -> "ac"
    df = _table(spark, ["abcd"])
    r = resize_nearest(df, target=2).collect()[0]
    assert bytes(r.resized) == b"ac"
    assert (r.n_bytes, r.resized_n, r.resized_sum) == (4, 2, ord("a") + ord("c"))


def test_resize_upsample_repeats(spark):
    # "ab" -> target 4: indices 0,0,1,1 -> "aabb"
    df = _table(spark, ["ab"])
    r = resize_nearest(df, target=4).collect()[0]
    assert bytes(r.resized) == b"aabb"


def test_resize_same_size_is_identity(spark):
    df = _table(spark, ["hello"])
    r = resize_nearest(df, target=5).collect()[0]
    assert bytes(r.resized) == b"hello"


def test_resize_empty_payload(spark):
    df = _table(spark, [""])
    r = resize_nearest(df, target=8).collect()[0]
    assert (r.n_bytes, r.resized_n, r.resized_sum) == (0, 0, 0)
    assert bytes(r.resized) == b""


def test_resize_rejects_bad_target(spark):
    with pytest.raises(ValueError):
        resize_nearest(_table(spark, ["x"]), target=0)
