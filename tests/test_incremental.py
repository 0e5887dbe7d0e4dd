"""Incremental aggregate maintenance: N-wave merges equal full recompute,
HLL register merges are lossless, and the merge plan never touches raw
history cardinality."""

from __future__ import annotations

import pyspark.sql.functions as F

from synthea2omop_etl_spark.operators.incremental import (
    aggregate_batch,
    merge_aggregates,
    merge_hll_registers,
)
from synthea2omop_etl_spark.operators.sketches import hll_registers

SF = "/root/testdata/sf0.01"

SPECS = {
    "n": ("count", "o_orderkey"),
    "s": ("sum", "o_totalprice"),
    "lo": ("min", "o_orderdate"),
    "hi": ("max", "o_orderdate"),
}


def _rows(df):
    return {
        r["o_orderpriority"]: (
            r["n"],
            round(r["s"], 2),
            r["lo"],
            r["hi"],
        )
        for r in df.collect()
    }


def test_three_wave_merge_equals_full_recompute(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    y = F.year("o_orderdate")
    waves = [
        orders.where(y < 1994),
        orders.where((y >= 1994) & (y < 1996)),
        orders.where(y >= 1996),
    ]
    states = [aggregate_batch(w, ["o_orderpriority"], SPECS) for w in waves]
    merged = merge_aggregates(states, ["o_orderpriority"], SPECS)
    full = aggregate_batch(orders, ["o_orderpriority"], SPECS)
    assert _rows(merged) == _rows(full)


def test_merge_is_associative(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    y = F.year("o_orderdate")
    a = aggregate_batch(orders.where(y < 1994), ["o_orderpriority"], SPECS)
    b = aggregate_batch(
        orders.where((y >= 1994) & (y < 1996)), ["o_orderpriority"], SPECS
    )
    c = aggregate_batch(orders.where(y >= 1996), ["o_orderpriority"], SPECS)
    ab_c = merge_aggregates(
        [merge_aggregates([a, b], ["o_orderpriority"], SPECS), c],
        ["o_orderpriority"],
        SPECS,
    )
    a_bc = merge_aggregates(
        [a, merge_aggregates([b, c], ["o_orderpriority"], SPECS)],
        ["o_orderpriority"],
        SPECS,
    )
    assert _rows(ab_c) == _rows(a_bc)


def test_hll_register_merge_is_lossless(spark):
    """Merged registers over splits == registers over the union: the
    incremental distinct count carries no extra error vs batch."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    half1 = li.where(F.col("l_orderkey") % 2 == 0)
    half2 = li.where(F.col("l_orderkey") % 2 == 1)
    r1 = hll_registers(half1, ["l_returnflag"], "l_partkey")
    r2 = hll_registers(half2, ["l_returnflag"], "l_partkey")
    merged = merge_hll_registers([r1, r2], ["l_returnflag"])
    full = hll_registers(li, ["l_returnflag"], "l_partkey")
    m = {(r["l_returnflag"], r["bucket"]): r["max_rho"] for r in merged.collect()}
    f = {(r["l_returnflag"], r["bucket"]): r["max_rho"] for r in full.collect()}
    assert m == f


def test_merge_plan_reads_states_not_history(spark):
    """The merge input is union-of-states: group-count-sized, one shuffle."""
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    y = F.year("o_orderdate")
    a = aggregate_batch(orders.where(y < 1995), ["o_orderpriority"], SPECS)
    b = aggregate_batch(orders.where(y >= 1995), ["o_orderpriority"], SPECS)
    merged = merge_aggregates([a, b], ["o_orderpriority"], SPECS)
    plan = merged._jdf.queryExecution().optimizedPlan().toString()
    assert "Union" in plan
    # in a live system states are parquet tables; here they chain to the
    # partial aggregates — the merge itself adds exactly one Aggregate
    # above the Union
    above_union = plan.split("Union")[0]
    assert above_union.count("Aggregate") == 1


def test_bucket_pruned_map_read(spark, tmp_path):
    """insert_if_absent(bucket_key=...) lays the map out as __bucket=K/
    partition dirs and read_bucket_pruned scans ONLY the partitions the
    probe's keys hash into — verified on actual input files."""
    from pyspark.sql import functions as F

    from synthea2omop_etl_spark.sources.writers import (
        insert_if_absent,
        read_bucket_pruned,
    )

    path = str(tmp_path / "map")
    df = spark.range(200).select(
        F.concat(F.lit("u"), F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )
    n = insert_if_absent(spark, df, path, ["k"], bucket_key="k", n_buckets=8)
    assert n == 200
    # idempotent under replay, still bucketed
    assert insert_if_absent(
        spark, df, path, ["k"], bucket_key="k", n_buckets=8
    ) == 0

    probe = spark.createDataFrame([("u7",)], ["k"])
    pruned = read_bucket_pruned(spark, path, "k", probe, n_buckets=8)
    full = spark.read.parquet(path)
    # partition pruning happens at physical planning (inputFiles() reports
    # the unpruned relation) — count the files a scan actually touches
    touched = {
        r[0]
        for r in pruned.select(F.input_file_name()).distinct().collect()
    }
    all_files = set(full.inputFiles())
    assert 0 < len(touched) < len(all_files)
    assert all("__bucket=" in f for f in touched)
    # exactly one bucket directory survives the prune for a 1-key probe
    assert len({f.split("__bucket=")[1].split("/")[0] for f in touched}) == 1
    assert "__bucket" not in pruned.columns
    got = {r["k"]: r["v"] for r in pruned.collect()}
    assert got["u7"] == 7
    # every key still resolvable through its own bucket
    allread = read_bucket_pruned(spark, path, "k", df, n_buckets=8)
    assert allread.count() == 200
