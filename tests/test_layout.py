"""Z-order layout (sources/layout.py): interleave correctness + the
pruning effectiveness it exists to buy (multi-column footer-stat
skipping vs a single-key linear sort)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from synthea2omop_etl_spark.sources.layout import (
    stats_pruned_fraction,
    write_zordered,
    zorder_expr,
    zorder_layout,
)


def _grid(spark, n=64):
    # Two independent uniform dimensions — the adversarial case for a
    # linear sort (sorting by a makes b stats useless per file).
    rows = [(i, j, i * n + j) for i in range(n) for j in range(n)]
    return spark.createDataFrame(rows, ["a", "b", "payload"])


def test_zorder_expr_interleaves_bits(spark):
    # bits=1, two columns, boundary at 0.5 each: z = (b_bit << 1) | a_bit.
    df = spark.createDataFrame(
        [(0.0, 0.0), (1.0, 0.0), (0.0, 1.0), (1.0, 1.0)], ["a", "b"]
    )
    z = zorder_expr(
        {"a": [0.5], "b": [0.5]}, {"a": "double", "b": "double"}
    )
    got = [r[0] for r in df.select(z).collect()]
    assert got == [0, 1, 2, 3]


def test_zorder_expr_nulls_sort_first(spark):
    df = spark.createDataFrame([(None,), (10.0,)], ["a"])
    z = zorder_expr({"a": [5.0]}, {"a": "double"})
    assert [r[0] for r in df.select(z).collect()] == [0, 1]


def test_zorder_rejects_strings(spark):
    df = spark.createDataFrame([("x", 1)], ["s", "a"])
    with pytest.raises(ValueError, match="unsupported type"):
        zorder_layout(df, ["s", "a"], 4)


def test_zorder_layout_preserves_rows(spark, tmp_path):
    df = _grid(spark, 32)
    out = zorder_layout(df, ["a", "b"], 8, bits=4)
    assert out.columns == df.columns
    assert out.count() == 32 * 32
    assert out.agg(F.sum("payload")).collect()[0][0] == sum(
        r[2] for r in df.collect()
    )


def test_zorder_prunes_both_dimensions_linear_only_one(spark, tmp_path):
    df = _grid(spark, 64)  # 4096 rows over a 64x64 grid
    n_files = 16

    lin_path = str(tmp_path / "linear")
    (
        df.repartitionByRange(n_files, "a")
        .sortWithinPartitions("a")
        .write.mode("overwrite")
        .parquet(lin_path)
    )
    zo_path = str(tmp_path / "zorder")
    zorder_layout(df, ["a", "b"], n_files, bits=6).write.mode(
        "overwrite"
    ).parquet(zo_path)

    # Range predicate on the PRIMARY sort key: both layouts skip files.
    lin_a = stats_pruned_fraction(spark, lin_path, "a", 0, 7)
    zo_a = stats_pruned_fraction(spark, zo_path, "a", 0, 7)
    assert lin_a[0] > 0
    assert zo_a[0] > 0

    # Range predicate on the SECOND dimension: the linear layout cannot
    # skip anything (every file spans all of b); the z-order layout
    # skips a majority of files.
    lin_b = stats_pruned_fraction(spark, lin_path, "b", 0, 7)
    zo_b = stats_pruned_fraction(spark, zo_path, "b", 0, 7)
    assert lin_b[0] == 0
    assert zo_b[0] > zo_b[1] // 2

    # And the data under the predicate is identical either way.
    want = df.where(F.col("b") <= 7).count()
    got = (
        spark.read.parquet(zo_path).where(F.col("b") <= 7).count()
    )
    assert got == want


def test_write_zordered_swaps_in_place(spark, tmp_path):
    path = str(tmp_path / "layer")
    df = _grid(spark, 32)
    df.write.mode("overwrite").parquet(path)
    res = write_zordered(
        spark.read.parquet(path), path, ["a", "b"], target_file_mb=1
    )
    assert res["cols"] == ["a", "b"]
    assert spark.read.parquet(path).count() == 32 * 32


def test_bench_sf10_rehearsal_artifact_contract():
    """r10: BENCH_SF10.json (the committed sf10 scale-rehearsal record)
    stays parseable and complete — bench.py surfaces it on every output
    line as sf10_exponents, so a malformed edit would silently blind
    the scale-rehearsal section of the perf gate."""
    import json
    from pathlib import Path

    p = Path(__file__).resolve().parent.parent / "BENCH_SF10.json"
    data = json.loads(p.read_text())
    qs = data["queries"]
    expected = {"part_pair_lift", "bfs_copart_hops", "leakage_safe_split",
                "corpus_curation", "coverage_select_docs"}
    assert expected <= set(qs)
    for name in expected:
        q = qs[name]
        assert q["sf1"] > 0 and q["sf10"] > 0
        # every measured exponent stays in the near-linear band the
        # 100x design argument claims (superlinear outliers must carry
        # an explanatory note, like leakage_safe_split's data-density
        # construction)
        assert 0.5 <= q["exponent"] <= 1.3
        if q["exponent"] > 1.0:
            assert "note" in q
