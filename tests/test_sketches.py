"""Sketch-operator properties that the hash-graded registry rows can't
express: estimator accuracy (float path), Bloom's no-false-negative
guarantee, CMS's overestimate-only guarantee, gap-fill density/LOCF."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from synthea2omop_etl_spark.operators.sketches import (
    bloom_build,
    bloom_prune,
    cms_build,
    cms_estimate,
    hll_error_bound,
    hll_estimate,
    hll_registers,
)
from synthea2omop_etl_spark.operators.timeseries import time_bucket_gapfill

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def lineitem(spark):
    return spark.read.parquet(f"{SF}/lineitem.parquet")


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


def test_hll_estimate_within_error_bound(spark, lineitem):
    regs = hll_registers(lineitem, ["l_returnflag"], "l_partkey")
    est = {
        r["l_returnflag"]: r["approx_distinct"]
        for r in hll_estimate(regs, ["l_returnflag"]).collect()
    }
    exact = {
        r["l_returnflag"]: r["d"]
        for r in lineitem.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("d"))
        .collect()
    }
    assert set(est) == set(exact)
    for flag, e in exact.items():
        # 3 sigma of the configured register count (~6.5% * 3)
        assert abs(est[flag] - e) <= 3 * hll_error_bound() * e + 2, (
            flag,
            est[flag],
            e,
        )


def test_hll_register_state_is_bounded(spark, lineitem):
    regs = hll_registers(lineitem, ["l_returnflag"], "l_partkey")
    per_group = regs.groupBy("l_returnflag").count().collect()
    assert all(r["count"] <= 256 for r in per_group)


def test_bloom_no_false_negatives(spark, lineitem, events):
    m, k = 1 << 14, 3
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    keys = orders.where(F.col("o_totalprice") > 400000).select("o_orderkey")
    bits = bloom_build(keys, "o_orderkey", m, k)
    pruned = bloom_prune(lineitem, "l_orderkey", bits, m, k)
    # every true member survives: anti-join of true matches vs pruned is empty
    true_members = lineitem.join(
        keys.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey",
        "left_semi",
    )
    missing = true_members.join(
        pruned.select("l_orderkey").distinct(), "l_orderkey", "left_anti"
    )
    assert missing.count() == 0
    # and the prune is a subset of the input
    assert pruned.count() <= lineitem.count()


def test_bloom_false_positive_rate_small(spark, lineitem):
    m, k = 1 << 16, 3
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    keys = orders.where(F.col("o_totalprice") > 400000).select("o_orderkey")
    bits = bloom_build(keys, "o_orderkey", m, k)
    pruned = bloom_prune(lineitem, "l_orderkey", bits, m, k)
    true_members = lineitem.join(
        keys.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey",
        "left_semi",
    )
    fp = pruned.count() - true_members.count()
    assert fp >= 0
    # (n_bits_set / m)^k bound with slack: under 2% of the non-member rows
    non_members = lineitem.count() - true_members.count()
    assert fp <= max(50, 0.02 * non_members)


def test_cms_overestimates_only_and_tight_for_heavy(spark, events):
    d, w = 4, 256
    sketch = cms_build(events, "user_id", d, w)
    assert sketch.count() <= d * w
    items = events.select("user_id").distinct()
    est = {
        r["user_id"]: r["est_count"]
        for r in cms_estimate(sketch, items, "user_id", d, w).collect()
    }
    exact = {
        r["user_id"]: r["c"]
        for r in events.groupBy("user_id").agg(F.count("*").alias("c")).collect()
    }
    assert set(est) == set(exact)
    n = sum(exact.values())
    for u, e in exact.items():
        assert est[u] >= e, (u, est[u], e)
        # classic CMS bound: overshoot < 2n/w per depth, min over d depths
        assert est[u] - e <= 2 * n / w * 2, (u, est[u], e)


def test_gapfill_dense_and_locf(spark):
    rows = [
        ("a", "2024-01-01 00:10:00", 1.0),
        ("a", "2024-01-01 03:20:00", 5.0),
        ("b", "2024-01-01 01:00:00", 2.0),
    ]
    df = spark.createDataFrame(rows, ["g", "ts", "v"]).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = time_bucket_gapfill(
        df,
        "ts",
        ["g"],
        {"s": F.round(F.sum("v"), 2), "n": F.count("*")},
        bucket="hour",
        locf_cols=["s"],
        zero_cols=["n"],
    ).collect()
    a = sorted(
        [(r["bucket_ts"].hour, r["s"], r["n"]) for r in out if r["g"] == "a"]
    )
    # hours 0..3 dense; 1 and 2 gap-filled: LOCF value 1.0, count 0
    assert a == [(0, 1.0, 1), (1, 1.0, 0), (2, 1.0, 0), (3, 5.0, 1)]
    b = [(r["bucket_ts"].hour, r["s"], r["n"]) for r in out if r["g"] == "b"]
    assert b == [(1, 2.0, 1)]


def test_bloom_bits_cache_stays_flat(spark):
    """Repeated bloom_build calls in one session swap the one-entry bits
    cache instead of accumulating storage (same contract as the minhash
    packed layer)."""
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    keys = orders.where(F.col("o_totalprice") > 400000).select("o_orderkey")

    def n_cached() -> int:
        return spark.sparkContext._jsc.sc().getPersistentRDDs().size()

    bloom_build(keys, "o_orderkey").count()
    base = n_cached()
    for _ in range(3):
        bloom_build(keys, "o_orderkey").count()
    assert n_cached() <= base


def test_hll_registers_are_duplicate_insensitive(spark, lineitem):
    """Registers over df ∪ df equal registers over df — the defining
    HLL property (distinct counting, not row counting)."""
    regs1 = hll_registers(lineitem, ["l_returnflag"], "l_partkey")
    doubled = lineitem.unionByName(lineitem)
    regs2 = hll_registers(doubled, ["l_returnflag"], "l_partkey")
    a = {(r["l_returnflag"], r["bucket"]): r["max_rho"] for r in regs1.collect()}
    b = {(r["l_returnflag"], r["bucket"]): r["max_rho"] for r in regs2.collect()}
    assert a == b


def test_cms_is_additive_over_splits(spark, events):
    """CMS over a ∪ b equals cell-wise sum of CMS(a) and CMS(b) — the
    mergeability that makes the sketch maintainable incrementally."""
    d, w = 4, 256
    a = events.where(F.col("event_id") % 2 == 0)
    b = events.where(F.col("event_id") % 2 == 1)
    full = {
        (r["depth"], r["pos"]): r["cnt"]
        for r in cms_build(events, "user_id", d, w).collect()
    }
    sa = {
        (r["depth"], r["pos"]): r["cnt"]
        for r in cms_build(a, "user_id", d, w).collect()
    }
    sb = {
        (r["depth"], r["pos"]): r["cnt"]
        for r in cms_build(b, "user_id", d, w).collect()
    }
    merged = {k: sa.get(k, 0) + sb.get(k, 0) for k in set(sa) | set(sb)}
    assert merged == full


def test_ewma_closed_form(spark):
    """EWMA fold matches the hand-computed recurrence (seed = first value,
    s <- a*x + (1-a)*s), windows bound the history, and single-row keys
    pass through unsmoothed."""
    from synthea2omop_etl_spark.operators.timeseries import ewma

    df = spark.createDataFrame(
        [("k", 1, 10.0), ("k", 2, 20.0), ("k", 3, 30.0), ("solo", 1, 7.0)],
        ["key", "seq", "x"],
    )
    out = {
        (r["key"], r["seq"]): r["ewma"]
        for r in ewma(df, "key", ["seq"], "x", alpha=0.5, window_rows=10)
        .collect()
    }
    assert out[("k", 1)] == 10.0
    assert out[("k", 2)] == 15.0          # 0.5*20 + 0.5*10
    assert out[("k", 3)] == 22.5          # 0.5*30 + 0.5*15
    assert out[("solo", 1)] == 7.0

    # window_rows=2: row 3 sees only [20, 30] -> seed 20, then 25
    out2 = {
        (r["key"], r["seq"]): r["ewma"]
        for r in ewma(df, "key", ["seq"], "x", alpha=0.5, window_rows=2)
        .collect()
    }
    assert out2[("k", 3)] == 25.0


def test_holt_linear_tracks_a_perfect_line(spark):
    """On y = 5 + 3t, Holt's level converges to the line and the trend to
    the slope (exact for long-enough alpha-weighted history); the 1-step
    forecast extrapolates ahead of the last level."""
    from synthea2omop_etl_spark.operators.timeseries import holt_linear

    rows = [("k", t, 5.0 + 3.0 * t) for t in range(1, 21)]
    df = spark.createDataFrame(rows, ["k", "t", "v"])
    out = {
        r["t"]: r
        for r in holt_linear(
            df, "k", ["t"], "v", alpha=0.5, beta=0.5, window_rows=20
        ).collect()
    }
    last = out[20]
    assert abs(last["holt_trend"] - 3.0) < 0.05
    assert abs(last["holt_level"] - 65.0) < 0.5
    assert last["holt_forecast"] > last["holt_level"]
    # first row of a series: level = the value, trend = 0
    assert out[1]["holt_level"] == 8.0 and out[1]["holt_trend"] == 0.0


def test_holt_linear_matches_python_fold(spark):
    """Bit parity with the plain-Python recurrence (same seed, same
    floor-based half-up rounding)."""
    import math

    from synthea2omop_etl_spark.operators.timeseries import holt_linear

    vals = [10.0, 12.0, 11.0, 15.0, 14.0, 18.0]
    rows = [("k", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["k", "i", "v"])
    out = {
        r["i"]: (r["holt_level"], r["holt_trend"])
        for r in holt_linear(
            df, "k", ["i"], "v", alpha=0.5, beta=0.3, window_rows=10
        ).collect()
    }

    def ref(win):
        s, b = win[0], 0.0
        for x in win[1:]:
            s2 = 0.5 * x + 0.5 * (s + b)
            b = 0.3 * ((0.5 * x + 0.5 * (s + b)) - s) + (1.0 - 0.3) * b
            s = s2
        r4 = lambda v: math.floor(v * 1e4 + 0.5) / 1e4
        return r4(s), r4(b)

    for i in range(len(vals)):
        assert out[i] == ref(vals[: i + 1]), i


def test_holt_linear_per_key_isolation(spark):
    """Keys never mix: one flat series and one trending series keep their
    own levels/trends."""
    from synthea2omop_etl_spark.operators.timeseries import holt_linear

    rows = [("flat", i, 7.0) for i in range(5)] + [
        ("up", i, float(i)) for i in range(5)
    ]
    df = spark.createDataFrame(rows, ["k", "i", "v"])
    out = holt_linear(df, "k", ["i"], "v", window_rows=10).collect()
    flat = [r for r in out if r["k"] == "flat"]
    assert all(r["holt_level"] == 7.0 and r["holt_trend"] == 0.0
               for r in flat)
    up_last = max((r for r in out if r["k"] == "up"),
                  key=lambda r: r["i"])
    assert up_last["holt_trend"] > 0
