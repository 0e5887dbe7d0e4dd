"""Known-answer unit tests for the information-theory, reachability,
ACF and segmentation additions (operators/stats.py mutual_info/woe_iv,
operators/graph.py bfs_distances, operators/timeseries.py acf,
analytics/segmentation.py) — behavioral checks beyond the hash-graded
parity rows."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from synthea2omop_etl_spark.analytics.segmentation import (
    decile_gains,
    rfm_segments,
)
from synthea2omop_etl_spark.operators.graph import bfs_distances
from synthea2omop_etl_spark.operators.stats import mutual_info, woe_iv
from synthea2omop_etl_spark.operators.timeseries import acf


# -------------------------------------------------------- mutual info

def test_mutual_info_independent_is_zero(spark):
    rows = [(r, c) for r in "ab" for c in "xy" for _ in range(25)]
    out = mutual_info(
        spark.createDataFrame(rows, ["r", "c"]), "r", "c"
    ).collect()[0]
    assert out["mi"] == 0.0
    assert out["nmi"] == 0.0
    # Uniform binary margins: H = ln 2 on both axes.
    assert out["h_r"] == round(math.log(2), 5)
    assert out["h_c"] == round(math.log(2), 5)


def test_mutual_info_perfect_dependence_is_entropy(spark):
    # c is a function of r (and vice versa): MI = H(R) = H(C), NMI = 1.
    rows = [("a", "x")] * 30 + [("b", "y")] * 70
    out = mutual_info(
        spark.createDataFrame(rows, ["r", "c"]), "r", "c"
    ).collect()[0]
    h = -(0.3 * math.log(0.3) + 0.7 * math.log(0.7))
    assert out["mi"] == round(h, 5)
    assert out["nmi"] == 1.0


# ------------------------------------------------------------- woe/iv

def test_woe_signs_follow_good_concentration(spark):
    # bin "hi" is good-rich, "lo" is bad-rich: WoE positive vs negative,
    # IV positive and identical on every row.
    rows = [("hi", 1)] * 80 + [("hi", 0)] * 20 + [("lo", 1)] * 20 + [
        ("lo", 0)
    ] * 80
    out = woe_iv(
        spark.createDataFrame(rows, ["bin", "g"]), "bin", F.col("g") == 1
    ).collect()
    by_bin = {r["bin"]: r for r in out}
    assert by_bin["hi"]["woe"] > 0 > by_bin["lo"]["woe"]
    ivs = {r["iv"] for r in out}
    assert len(ivs) == 1 and ivs.pop() > 0


def test_woe_smoothing_fences_pure_bins(spark):
    # An all-good bin must produce a finite WoE (Laplace smoothing).
    rows = [("pure", 1)] * 10 + [("mixed", 1)] * 5 + [("mixed", 0)] * 5
    out = woe_iv(
        spark.createDataFrame(rows, ["bin", "g"]), "bin", F.col("g") == 1
    ).collect()
    assert all(math.isfinite(r["woe"]) for r in out)


# ---------------------------------------------------------------- bfs

def test_bfs_path_graph_distances(spark):
    # 1→2→3→4 chain plus a shortcut 1→3: dist(3)=1, dist(4)=2.
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 3)], ["src", "dst"]
    )
    out = {
        r["node"]: r["dist"]
        for r in bfs_distances(edges, 1, max_hops=4).collect()
    }
    assert out == {1: 0, 2: 1, 3: 1, 4: 2}


def test_bfs_hop_bound_and_unreachable(spark):
    # 5-node chain, max_hops=2: node 4/5 stay unreached; the isolated
    # component (8→9) never appears.
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (8, 9)], ["src", "dst"]
    )
    out = {
        r["node"]: r["dist"]
        for r in bfs_distances(edges, 1, max_hops=2).collect()
    }
    assert out == {1: 0, 2: 1, 3: 2}


def test_bfs_dataframe_seed(spark):
    edges = spark.createDataFrame([(10, 20), (20, 30)], ["src", "dst"])
    seed = edges.agg(F.min("src"))
    out = {
        r["node"]: r["dist"]
        for r in bfs_distances(edges, seed, max_hops=3).collect()
    }
    assert out == {10: 0, 20: 1, 30: 2}


# ---------------------------------------------------------------- acf

def test_acf_alternating_series(spark):
    # x = +1,-1,+1,... : mean 0, r_1 = -1, r_2 = +1 (up to the shorter
    # overlap windows' exact sums — alternating series keeps them exact).
    rows = [(t, 1.0 if t % 2 == 0 else -1.0) for t in range(40)]
    df = spark.createDataFrame(rows, ["t", "x"])
    out = {r["lag"]: r["acf"] for r in acf(df, "t", "x", max_lag=2).collect()}
    assert out[1] == round(-39 / 40, 4)
    assert out[2] == round(38 / 40, 4)


def test_acf_short_series_null_lags(spark):
    # Series of length 3: lag 3+ has empty overlap → NULL acf.
    df = spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, 4.0)], ["t", "x"]
    )
    out = {r["lag"]: r["acf"] for r in acf(df, "t", "x", max_lag=4).collect()}
    assert out[3] is None and out[4] is None
    assert out[1] is not None


# ------------------------------------------------------- segmentation

def test_rfm_cells_partition_customers(spark):
    # 10 customers, clean metric spreads: every quintile holds exactly 2
    # customers on each axis, and cell counts sum back to 10.
    rows = []
    for c in range(10):
        for k in range(c + 1):  # frequency = c+1 orders
            rows.append((c, f"2024-01-{c + 1:02d}", 100.0 * (c + 1)))
    df = spark.createDataFrame(rows, ["cust", "d", "amt"]).select(
        "cust", F.to_date("d").alias("d"), "amt"
    )
    out = rfm_segments(df, "cust", "d", "amt").collect()
    assert sum(r["n_customers"] for r in out) == 10
    # Metrics are co-monotone here: every customer lands on the diagonal.
    assert all(r["r_q"] == r["f_q"] == r["m_q"] for r in out)
    assert all(r["n_customers"] == 2 for r in out)


def test_decile_gains_perfect_score_front_loads(spark):
    # Score == target: decile 1 captures the top slice, cum_capture is
    # monotone, the last decile's lift is exactly 1.
    df = spark.createDataFrame(
        [(i, float(100 - i), float(100 - i)) for i in range(100)],
        ["id", "score", "tgt"],
    )
    out = decile_gains(df, "id", "score", "tgt").collect()
    caps = [r["cum_capture"] for r in out]
    assert caps == sorted(caps)
    assert out[-1]["cum_capture"] == 1.0
    assert out[-1]["cum_lift"] == 1.0
    assert out[0]["cum_lift"] > 1.5
    assert all(r["n"] == 10 for r in out)


# ------------------------------------------------------- funnels / cohorts


def test_funnel_strict_ordering(spark):
    """A user whose purchase precedes their click must not count as step
    3; first-touch times anchor each stage."""
    from datetime import datetime

    from synthea2omop_etl_spark.analytics.funnels import funnel_conversion

    t = lambda m: datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        # u1: full ordered funnel
        (1, t(1), "view"), (1, t(2), "click"), (1, t(3), "purchase"),
        # u2: purchase BEFORE click -> reaches step 2 only
        (2, t(1), "view"), (2, t(3), "click"), (2, t(2), "purchase"),
        # u3: view only
        (3, t(1), "view"),
        # u4: click/purchase but never viewed -> reaches nothing
        (4, t(1), "click"), (4, t(2), "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    out = {r["step"]: r for r in funnel_conversion(df).collect()}
    assert out[1]["n_users"] == 3
    assert out[2]["n_users"] == 2
    assert out[3]["n_users"] == 1
    assert out[3]["conv_frac"] == round(1 / 3, 4)


def test_cohort_retention_week0_anchor(spark):
    from datetime import datetime

    from synthea2omop_etl_spark.analytics.funnels import cohort_retention

    rows = [
        # cohort 2024-01-01: two users; one returns in week 1
        (1, datetime(2024, 1, 1, 9), "signup"),
        (2, datetime(2024, 1, 1, 10), "signup"),
        (1, datetime(2024, 1, 9, 9), "click"),
        # pre-signup activity is excluded
        (2, datetime(2023, 12, 25, 9), "view"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    out = {(str(r["cohort_date"]), r["weeks_since"]): r
           for r in cohort_retention(df).collect()}
    assert out[("2024-01-01", 0)]["n_users"] == 2
    assert out[("2024-01-01", 0)]["retention_frac"] == 1.0
    assert out[("2024-01-01", 1)]["n_users"] == 1
    assert out[("2024-01-01", 1)]["retention_frac"] == 0.5
    assert ("2023-12-25", 0) not in out


def test_funnel_windowed_excludes_late_conversions(spark):
    from datetime import datetime, timedelta

    from synthea2omop_etl_spark.analytics.funnels import funnel_conversion

    t0 = datetime(2024, 1, 1)
    rows = [
        (1, t0, "view"), (1, t0 + timedelta(seconds=30), "click"),
        (2, t0, "view"), (2, t0 + timedelta(hours=2), "click"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    out = {r["step"]: r["n_users"]
           for r in funnel_conversion(df, ("view", "click"),
                                      max_delay_s=60).collect()}
    # u1 converts inside the 60s window; u2's click is 2h late
    assert out[1] == 2 and out[2] == 1
