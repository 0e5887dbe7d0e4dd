"""Edge cases for the round-5 operator families: empty inputs, degenerate
groups, and boundary parameters — the shapes a long-running pipeline hits
eventually and the graded aggregates never exercise."""

from __future__ import annotations

import pyspark.sql.functions as F
import pyspark.sql.types as T
import pytest

from synthea2omop_etl_spark.operators.incremental import (
    aggregate_batch,
    merge_aggregates,
)
from synthea2omop_etl_spark.operators.scd import scd2_apply, scd2_init
from synthea2omop_etl_spark.operators.sketches import (
    bloom_build,
    bloom_prune,
    cms_build,
    hll_estimate,
    hll_registers,
)
from synthea2omop_etl_spark.operators.skew import skew_report
from synthea2omop_etl_spark.operators.timeseries import time_bucket_gapfill


def _empty_docs(spark):
    return spark.createDataFrame(
        [], "doc_id: bigint, text: string, v: double"
    )


def test_hll_empty_input_yields_no_registers(spark):
    df = _empty_docs(spark)
    regs = hll_registers(df, [], "text")
    assert regs.count() == 0
    # an ungrouped estimate over zero registers is "no values seen": 0
    # (Spark's global aggregate still emits its one row)
    est = hll_estimate(regs, []).collect()
    assert [r["approx_distinct"] for r in est] == [0]
    # with group columns, no groups -> no rows
    grouped = hll_registers(df, ["doc_id"], "text")
    assert hll_estimate(grouped, ["doc_id"]).count() == 0


def test_hll_single_value(spark):
    df = spark.createDataFrame([("x",)] * 100, "text: string")
    regs = hll_registers(df, [], "text")
    assert regs.count() == 1  # one bucket occupied
    est = hll_estimate(regs, []).collect()[0]["approx_distinct"]
    assert est == 1  # linear-counting regime is exact at n=1


def test_bloom_empty_keys_prunes_everything(spark):
    keys = spark.createDataFrame([], "k: bigint")
    bits = bloom_build(keys, "k", 1 << 10, 3)
    assert bits.count() == 0
    df = spark.createDataFrame([(i,) for i in range(50)], "k: bigint")
    assert bloom_prune(df, "k", bits, 1 << 10, 3).count() == 0


def test_cms_empty_input(spark):
    df = spark.createDataFrame([], "k: bigint")
    assert cms_build(df, "k").count() == 0


def test_gapfill_empty_and_single_bucket(spark):
    empty = spark.createDataFrame([], "g: string, ts: timestamp, v: double")
    out = time_bucket_gapfill(
        empty, "ts", ["g"], {"s": F.sum("v")}, locf_cols=["s"]
    )
    assert out.count() == 0
    one = spark.createDataFrame(
        [("a", "2024-01-01 10:30:00", 2.0)], "g: string, ts: string, v: double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    rows = time_bucket_gapfill(
        one, "ts", ["g"], {"s": F.sum("v")}, locf_cols=["s"]
    ).collect()
    assert len(rows) == 1 and rows[0]["s"] == 2.0


def test_skew_report_single_key(spark):
    df = spark.createDataFrame([("only",)] * 10, "k: string")
    r = skew_report(df, "k", 5).collect()
    assert len(r) == 1
    assert r[0]["frac"] == 1.0 and r[0]["skew_ratio"] == 1.0


def test_merge_single_state_is_identity(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3)], "g: string, v: bigint"
    )
    specs = {"n": ("count", "v"), "s": ("sum", "v")}
    state = aggregate_batch(df, ["g"], specs)
    merged = merge_aggregates([state], ["g"], specs)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, state.collect())
    )
    with pytest.raises(ValueError):
        merge_aggregates([], ["g"], specs)


def test_scd2_empty_update_batch_is_noop(spark):
    snap = spark.createDataFrame([(1, "A")], "k: bigint, seg: string")
    dim = scd2_init(snap, "2024-01-01", "k", ["seg"])
    empty = spark.createDataFrame(
        [], T.StructType([
            T.StructField("k", T.LongType()),
            T.StructField("seg", T.StringType()),
        ])
    )
    out = scd2_apply(dim, empty, "2024-02-01", "k", ["seg"])
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, dim.collect())
    )
