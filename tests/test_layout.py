"""Z-order layout: multi-dimensional file-level data skipping.

The measurable claim: after write_zordered on (user_id, value), a point
predicate on EITHER column excludes most files by min/max envelope alone
— while the natural (as-loaded) layout excludes almost none. This is the
footer-stats arithmetic the scan planner uses, so the test measures the
actual skipping, not a proxy.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from synthea2omop_etl_spark.sources.layout import (
    skipping_stats,
    write_zordered,
    zorder_column,
)
from synthea2omop_etl_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF, "events")


def test_zorder_skips_on_both_dimensions(spark, events, tmp_path_factory):
    zpath = str(tmp_path_factory.mktemp("layout") / "z")
    write_zordered(events, zpath, ["user_id", "value"], n_files=32, bits=8)

    # baseline: same file count, natural row order
    bpath = str(tmp_path_factory.mktemp("layout") / "base")
    events.repartition(32).write.mode("overwrite").parquet(bpath)

    row = events.select(
        F.expr("percentile_approx(user_id, 0.5)").alias("u"),
        F.expr("percentile_approx(value, 0.5)").alias("v"),
    ).collect()[0]

    for col, val in [("user_id", float(row["u"])), ("value", float(row["v"]))]:
        z = skipping_stats(zpath, col, val)
        b = skipping_stats(bpath, col, val)
        # z-ordered layout prunes most files on every clustered column;
        # random layout prunes (next to) none.
        assert z["skip_fraction"] >= 0.5, (col, z)
        assert b["skip_fraction"] <= 0.1, (col, b)
        assert z["skip_fraction"] > b["skip_fraction"]


def test_zorder_preserves_rows_exactly(spark, events, tmp_path_factory):
    zpath = str(tmp_path_factory.mktemp("layout") / "z2")
    write_zordered(events, zpath, ["user_id", "value"], n_files=8, bits=6)
    back = spark.read.parquet(zpath)
    assert back.count() == events.count()
    assert sorted(back.columns) == sorted(events.columns)
    a = back.agg(
        F.sum("event_id").alias("s"), F.round(F.sum("value"), 2).alias("v")
    ).collect()[0]
    e = events.agg(
        F.sum("event_id").alias("s"), F.round(F.sum("value"), 2).alias("v")
    ).collect()[0]
    assert (a["s"], a["v"]) == (e["s"], e["v"])


def test_zorder_column_rejects_bit_overflow(spark, events):
    with pytest.raises(ValueError):
        zorder_column(events, ["user_id", "value"], bits=32)


# ---------------------------------------------------------------------------
# Small-file compaction (sources/writers.py compact_parquet_layer)
# ---------------------------------------------------------------------------

def test_compact_parquet_layer(spark, tmp_path_factory):
    from synthea2omop_etl_spark.sources.writers import compact_parquet_layer

    path = str(tmp_path_factory.mktemp("compact") / "layer")
    df = spark.range(0, 10_000).withColumn("k", F.pmod("id", F.lit(7)))
    # simulate micro-batch accretion: many small appends
    for i in range(5):
        df.where(F.pmod("id", F.lit(5)) == i).repartition(8).write.mode(
            "append"
        ).parquet(path)
    before = spark.read.parquet(path)
    n_before, sum_before = before.count(), before.agg(F.sum("id")).first()[0]
    assert len(before.inputFiles()) == 40

    report = compact_parquet_layer(spark, path, target_file_mb=128)
    assert report["files_before"] == 40
    assert report["files_after"] == 1  # 10k rows << 128 MB
    after = spark.read.parquet(path)
    assert after.count() == n_before
    assert after.agg(F.sum("id")).first()[0] == sum_before

    # already compact → no-op
    report2 = compact_parquet_layer(spark, path, target_file_mb=128)
    assert report2["files_after"] == report2["files_before"] == 1


def test_compact_sorted_restores_clustering(spark, tmp_path_factory):
    from synthea2omop_etl_spark.sources.writers import compact_parquet_layer

    path = str(tmp_path_factory.mktemp("compact_sorted") / "layer")
    df = spark.range(0, 5_000).withColumn("k", F.pmod("id", F.lit(50)))
    for i in range(3):  # unordered appends destroy clustering
        df.where(F.pmod("id", F.lit(3)) == i).repartition(4).write.mode(
            "append"
        ).parquet(path)
    report = compact_parquet_layer(
        spark, path, target_file_mb=128, sort_within_by=["k"]
    )
    assert report["files_after"] < report["files_before"]
    after = spark.read.parquet(path)
    assert after.count() == 5_000
    # per-file k-order: within every file the k column is non-decreasing
    from pyspark.sql import Window

    w = Window.partitionBy(F.input_file_name()).orderBy(
        F.monotonically_increasing_id()
    )
    ooo = (
        after.withColumn("prev_k", F.lag("k").over(w))
        .where(F.col("prev_k") > F.col("k"))
        .count()
    )
    assert ooo == 0


# ---------------------------------------------------------------------------
# Dynamic partition overwrite (sources/writers.py overwrite_partitions)
# ---------------------------------------------------------------------------

def test_overwrite_partitions_touches_only_incoming(spark, tmp_path_factory):
    from synthea2omop_etl_spark.sources.writers import overwrite_partitions

    path = str(tmp_path_factory.mktemp("dynover") / "facts")
    base = spark.createDataFrame(
        [(1, 2020, 10.0), (2, 2020, 20.0), (3, 2021, 30.0), (4, 2022, 40.0)],
        "id long, year int, v double",
    )
    overwrite_partitions(base, path, ["year"])

    # replace ONLY 2021 with a corrected slice
    fix = spark.createDataFrame([(9, 2021, 99.0)], "id long, year int, v double")
    overwrite_partitions(fix, path, ["year"])

    out = {
        (r.id, r.year, r.v) for r in spark.read.parquet(path).collect()
    }
    assert out == {(1, 2020, 10.0), (2, 2020, 20.0), (9, 2021, 99.0),
                   (4, 2022, 40.0)}

    # idempotent replay: same slice again -> same table
    overwrite_partitions(fix, path, ["year"])
    assert spark.read.parquet(path).count() == 4


# ---------------------------------------------------------------------------
# Layer fingerprint (sources/writers.py layer_fingerprint)
# ---------------------------------------------------------------------------

def test_fingerprint_order_insensitive_and_sensitive_to_content(spark):
    from synthea2omop_etl_spark.sources.writers import layer_fingerprint

    a = spark.createDataFrame([(1, "x"), (2, "y"), (3, "z")], "k long, s string")
    b = spark.createDataFrame([(3, "z"), (1, "x"), (2, "y")], "k long, s string")
    fa = layer_fingerprint(a, ["k", "s"]).collect()[0]
    fb = layer_fingerprint(b, ["k", "s"]).collect()[0]
    assert (fa.n_rows, fa.fingerprint) == (fb.n_rows, fb.fingerprint)

    c = spark.createDataFrame([(1, "x"), (2, "y"), (3, "Z")], "k long, s string")
    fc = layer_fingerprint(c, ["k", "s"]).collect()[0]
    assert fc.fingerprint != fa.fingerprint


def test_fingerprint_empty_layer(spark):
    from synthea2omop_etl_spark.sources.writers import layer_fingerprint

    e = spark.createDataFrame([], "k long, s string")
    f = layer_fingerprint(e, ["k", "s"]).collect()[0]
    assert (f.n_rows, f.fingerprint) == (0, 0)


# ---------------------------------------------------------------------------
# Ingest provenance + schema-evolution reads (sources/readers.py)
# ---------------------------------------------------------------------------

def test_read_with_provenance_identifies_source_files(spark, tmp_path_factory):
    from synthea2omop_etl_spark.sources.readers import read_with_provenance

    path = str(tmp_path_factory.mktemp("prov") / "layer")
    spark.range(0, 10).coalesce(1).write.mode("append").parquet(path)
    spark.range(10, 30).coalesce(1).write.mode("append").parquet(path)

    df = read_with_provenance(spark, path)
    per_file = {
        r.source_file: r.n
        for r in df.groupBy("source_file").agg(F.count("*").alias("n")).collect()
    }
    assert sorted(per_file.values()) == [10, 20]
    assert all(f.endswith(".parquet") for f in per_file)
    # provenance survives projection + filter (scan-time, not a join)
    kept = df.where(F.col("id") >= 10).select("id", "source_file")
    assert kept.select("source_file").distinct().count() == 1


def test_read_merged_schema_unions_waves(spark, tmp_path_factory):
    from synthea2omop_etl_spark.sources.readers import read_merged_schema

    path = str(tmp_path_factory.mktemp("waves") / "layer")
    spark.createDataFrame([(1, 1.0)], "id long, v double").write.mode(
        "append"
    ).parquet(path)
    spark.createDataFrame(
        [(2, 2.0, "new")], "id long, v double, extra string"
    ).write.mode("append").parquet(path)

    df = read_merged_schema(spark, path)
    assert set(df.columns) == {"id", "v", "extra"}
    rows = {r.id: r.extra for r in df.collect()}
    assert rows == {1: None, 2: "new"}
