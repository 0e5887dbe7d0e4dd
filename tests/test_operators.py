from __future__ import annotations

from pyspark.sql import functions as F

from synthea2omop_etl_spark.operators import (
    anti_join_new_rows,
    assign_dense_ids,
    build_id_map,
    cast_or_null,
    enum_or_null,
    first_per_group,
    null_if_empty,
    route_numeric,
)
from synthea2omop_etl_spark.operators.typing import apply_typing


def test_cast_or_null_numeric(spark):
    df = spark.createDataFrame(
        [("1",), ("1.5",), ("-3.2",), ("1.2e3",), ("12abc",), ("",), (None,)],
        ["v"],
    )
    out = df.select(cast_or_null("v", "double").alias("d")).collect()
    assert [r.d for r in out] == [1.0, 1.5, -3.2, 1200.0, None, None, None]


def test_cast_or_null_date_and_timestamp(spark):
    df = spark.createDataFrame(
        [("2020-01-02",), ("2020-01-02 03:04:05",), ("not a date",), ("",)], ["v"]
    )
    out = df.select(
        cast_or_null("v", "date").alias("d"),
        cast_or_null("v", "timestamp").alias("t"),
    ).collect()
    assert str(out[0].d) == "2020-01-02"
    assert str(out[1].t) == "2020-01-02 03:04:05"
    assert out[2].d is None and out[2].t is None
    assert out[3].d is None and out[3].t is None


def test_enum_and_empty(spark):
    df = spark.createDataFrame([("M",), ("S",), ("X",), ("",)], ["v"])
    out = df.select(
        enum_or_null("v", ["M", "S", "D", "W"]).alias("e"),
        null_if_empty("v").alias("n"),
    ).collect()
    assert [r.e for r in out] == ["M", "S", None, None]
    assert [r.n for r in out] == ["M", "S", "X", None]


def test_apply_typing(spark):
    df = spark.createDataFrame([("1.5", "x", "2020-01-01")], ["a", "b", "c"])
    typed = apply_typing(df, {"a": ("double", None), "c": ("date", None)})
    assert dict(typed.dtypes) == {"a": "double", "b": "string", "c": "date"}


def test_assign_dense_ids_strategies_agree(spark):
    df = spark.createDataFrame([(f"k{i:04d}",) for i in range(500)], ["k"])
    a = assign_dense_ids(df, "k", "id", strategy="row_number")
    b = assign_dense_ids(df, "k", "id", strategy="partitioned")
    ra = {r.k: r.id for r in a.collect()}
    rb = {r.k: r.id for r in b.collect()}
    assert ra == rb
    assert sorted(ra.values()) == list(range(1, 501))


def test_assign_dense_ids_materialize_input_identical(spark):
    """r12: materialize_input (the lazy localCheckpoint that stops the
    range-bound sampler re-executing a broadcast-join-only child) must
    not change a single id — same rank-by-key contract either way."""
    df = spark.createDataFrame([(f"k{i:04d}", i % 7) for i in range(500)],
                               ["k", "v"])
    plain = assign_dense_ids(df, "k", "id", strategy="partitioned")
    mat = assign_dense_ids(df, "k", "id", strategy="partitioned",
                           materialize_input=True)
    rp = {r.k: r.id for r in plain.collect()}
    rm = {r.k: r.id for r in mat.collect()}
    assert rp == rm
    assert sorted(rm.values()) == list(range(1, 501))


def test_build_id_map_incremental(spark):
    df1 = spark.createDataFrame([("u1",), ("u2",), ("u3",)], ["uuid"])
    m1 = build_id_map(df1, "uuid", "pid")
    df2 = spark.createDataFrame([("u2",), ("u4",)], ["uuid"])
    m2 = build_id_map(df2, "uuid", "pid", existing_map=m1)
    rows = {r.uuid: r.pid for r in m2.collect()}
    assert len(rows) == 4
    assert rows["u4"] == 4  # new key gets id above existing max
    m1_rows = {r.uuid: r.pid for r in m1.collect()}
    for k, v in m1_rows.items():
        assert rows[k] == v  # old ids stable


def test_anti_join_null_semantics(spark):
    incoming = spark.createDataFrame([(1, "a"), (2, "b"), (None, "c")], ["k", "v"])
    existing = spark.createDataFrame([(1,), (None,)], ["k"])
    out = anti_join_new_rows(incoming, existing, ["k"]).collect()
    # NOT EXISTS: null key in existing does NOT suppress; null incoming key
    # never matches → kept.
    assert sorted(r.v for r in out) == ["b", "c"]


def test_first_per_group(spark):
    df = spark.createDataFrame(
        [("a", 2, "x"), ("a", 1, "y"), ("b", 5, "z")], ["g", "o", "v"]
    )
    out = first_per_group(df, ["g"], [F.col("o").asc()]).collect()
    assert {(r.g, r.v) for r in out} == {("a", "y"), ("b", "z")}


def test_route_numeric(spark):
    df = spark.createDataFrame(
        [("72",), ("119.5",), ("-3.2",), ("1.2e3",), ("Never smoker",), (None,)],
        ["VALUE"],
    )
    meas, obs = route_numeric(df, "VALUE")
    assert meas.count() == 4
    assert obs.count() == 2


def test_percentile_exact_by_rank_matches_builtin(spark):
    """The rank-based exact percentile must be byte-identical to the
    sort-based builtin aggregate — incl. single-row groups, ties, and
    integer interpolation positions."""
    from synthea2omop_etl_spark.operators.percentiles import (
        percentile_exact_by_rank,
    )

    rows = (
        # group a: 11 values → every q lands on an exact index (frac 0)
        [("a", float(v)) for v in range(11)]
        # group b: ties + non-integer positions
        + [("b", v) for v in (1.0, 1.0, 2.0, 5.0, 5.0, 5.0, 9.0)]
        # group c: single row (k+2 rank absent → coalesce path)
        + [("c", 42.0)]
        # group d: two rows (pure interpolation)
        + [("d", 10.0), ("d", 20.0)]
    )
    df = spark.createDataFrame(rows, ["g", "v"]).repartition(8)
    qs = [0.10, 0.25, 0.50, 0.75, 0.90]
    got = {
        r["g"]: [r[f"p{int(q * 100)}"] for q in qs]
        for r in percentile_exact_by_rank(df, "g", "v", qs).collect()
    }
    want = {
        r["g"]: list(r["pct"])
        for r in df.groupBy("g")
        .agg(F.expr("percentile(v, array(0.10,0.25,0.50,0.75,0.90))").alias("pct"))
        .collect()
    }
    assert got.keys() == want.keys()
    for g in want:
        assert got[g] == want[g], (g, got[g], want[g])


def test_percentile_exact_by_rank_validates(spark):
    import pytest

    from synthea2omop_etl_spark.operators.percentiles import (
        percentile_exact_by_rank,
    )

    df = spark.createDataFrame([("a", 1.0)], ["g", "v"])
    with pytest.raises(ValueError):
        percentile_exact_by_rank(df, "g", "v", [])
    with pytest.raises(ValueError):
        percentile_exact_by_rank(df, "g", "v", [0.5], ["a", "b"])


def test_spread_if_narrow_gate(spark, tmp_path):
    from synthea2omop_etl_spark.operators.skew import spread_if_narrow

    # in-memory frame: 0 input files -> passthrough (same object)
    mem = spark.range(10).withColumnRenamed("id", "k")
    assert spread_if_narrow(mem, "k") is mem

    # single-file parquet on a multi-slot session -> repartitioned wide
    p = str(tmp_path / "narrow")
    spark.range(1000).withColumnRenamed("id", "k").coalesce(1).write.parquet(p)
    narrow = spark.read.parquet(p)
    assert len(narrow.inputFiles()) == 1
    spread = spread_if_narrow(narrow, "k")
    assert spread is not narrow
    slots = spark.sparkContext.defaultParallelism
    assert spread.rdd.getNumPartitions() == slots
    # row preservation
    assert spread.count() == 1000
