"""Known-answer unit tests for the statistics/drift/search family
(operators/stats.py, operators/drift.py, the timeseries anomaly and
change-point additions, llm_ops/search.py BM25, graph triangle stats) —
behavioral checks beyond the hash-graded parity rows."""

from __future__ import annotations

import math

from synthea2omop_etl_spark.llm_ops.search import bm25_topk
from synthea2omop_etl_spark.operators.drift import kl_token_drift, psi_drift
from synthea2omop_etl_spark.operators.graph import triangle_stats
from synthea2omop_etl_spark.operators.stats import (
    benford_digits,
    chisq_independence,
    ols_trend,
)
from synthea2omop_etl_spark.operators.timeseries import (
    mean_shift_changepoint,
    rolling_zscore_anomalies,
)


# ---------------------------------------------------------------- chisq

def test_chisq_independent_table_is_zero(spark):
    # Perfect independence: every (r, c) cell = rt*ct/n exactly.
    rows = [(r, c) for r in "ab" for c in "xy" for _ in range(25)]
    out = chisq_independence(
        spark.createDataFrame(rows, ["r", "c"]), "r", "c"
    ).collect()[0]
    assert out["chi2"] == 0.0
    assert out["dof"] == 1
    assert not out["significant"]


def test_chisq_dependent_table_flags(spark):
    # Diagonal concentration: textbook dependence.
    rows = [("a", "x")] * 90 + [("a", "y")] * 10 + [("b", "y")] * 90 + [
        ("b", "x")
    ] * 10
    out = chisq_independence(
        spark.createDataFrame(rows, ["r", "c"]), "r", "c"
    ).collect()[0]
    # Hand check: all margins 100, n=400, e=50 per cell, chi2 = 4*(40^2/50).
    assert out["chi2"] == 128.0
    assert out["significant"]


# ------------------------------------------------------------------ ols

def test_ols_recovers_exact_line(spark):
    df = spark.createDataFrame(
        [("g", float(x), 2.0 * x + 3.0) for x in range(10)], ["g", "x", "y"]
    )
    out = ols_trend(df, "y", "x", "g").collect()[0]
    assert (out["slope"], out["intercept"], out["r2"]) == (2.0, 3.0, 1.0)
    assert out["n"] == 10


# -------------------------------------------------------------- benford

def test_benford_digit_extraction_at_powers_of_ten(spark):
    # floor(log10(.)) would wobble on exactly 1000.0 — the integer-domain
    # extraction must not.
    df = spark.createDataFrame(
        [(1000.0,), (999.99,), (0.01,), (10.0,), (-5.0,), (0.0,)], ["v"]
    )
    rows = {r["digit"]: r["n"] for r in benford_digits(df, "v").collect()}
    # -5 and 0 excluded; 1000.0 → 1, 999.99 → 9, 0.01 → 1, 10.0 → 1.
    assert rows == {1: 3, 9: 1}


def test_benford_tiny_positive_values_excluded(spark):
    # Positive values below 0.5/10^decimals round to integer 0: they must
    # be dropped (digit 0 has no Benford expectation; p_exp would be
    # NULL in Spark vs inf in DuckDB). 0.004 at decimals=2 rounds to 0.
    df = spark.createDataFrame([(0.004,), (0.005,), (1.0,)], ["v"])
    rows = {r["digit"]: r["n"] for r in benford_digits(df, "v").collect()}
    assert 0 not in rows
    assert rows == {1: 2}  # 0.005 → as_int 1 → digit 1; 1.0 → digit 1


def test_benford_expected_probs(spark):
    df = spark.createDataFrame([(float(d),) for d in range(1, 10)], ["v"])
    out = benford_digits(df, "v").collect()
    for r in out:
        assert r["p_obs"] == round(1 / 9, 5)
        # p_exp is 5dp-rounded, so compare at that resolution.
        assert abs(r["p_exp"] - math.log10(1 + 1 / r["digit"])) < 1e-5


# ------------------------------------------------------------------ psi

def _seg_df(spark, ref_vals, cur_vals):
    rows = [("ref", float(v)) for v in ref_vals] + [
        ("cur", float(v)) for v in cur_vals
    ]
    return spark.createDataFrame(rows, ["seg", "v"])


def test_psi_identical_segments_near_zero(spark):
    vals = [i / 10 for i in range(100)]
    out = psi_drift(_seg_df(spark, vals, vals), "v", "seg", "ref", "cur")
    total = out.collect()[0]["psi_total"]
    assert abs(total) < 0.01  # only smoothing noise


def test_psi_shifted_segment_flags(spark):
    ref = [i / 10 for i in range(100)]
    cur = [5 + i / 10 for i in range(100)]  # half out of ref range
    rows = psi_drift(
        _seg_df(spark, ref, cur), "v", "seg", "ref", "cur"
    ).collect()
    assert rows[0]["psi_total"] > 0.25  # the "shifted" rule-of-thumb bar
    # Out-of-range current values clamp into the top bin, never vanish.
    assert sum(r["n_cur"] for r in rows) == 100


# ------------------------------------------------------------------- kl

def test_kl_identical_distributions_zero(spark):
    rows = [("a", "x y z"), ("b", "x y z")]
    out = kl_token_drift(
        spark.createDataFrame(rows, ["seg", "t"]), "t", "seg", "a"
    ).collect()[0]
    assert out["kl_ref_cur"] == 0.0 and out["js"] == 0.0
    assert out["vocab_size"] == 3


def test_js_symmetric_and_bounded(spark):
    rows = [("a", "x x x y"), ("b", "z z w w")]
    df = spark.createDataFrame(rows, ["seg", "t"])
    a = kl_token_drift(df, "t", "seg", "a").collect()[0]
    b = kl_token_drift(df, "t", "seg", "b").collect()[0]
    assert a["js"] == b["js"]  # symmetric by construction
    assert 0 < a["js"] < math.log(2)  # JS (nats) bound
    assert a["kl_ref_cur"] == b["kl_cur_ref"]


# ------------------------------------------------------- rolling zscore

def test_rolling_zscore_flags_spike_not_warmup(spark):
    # 20 calm points then a spike; a second key too short to ever flag.
    rows = [(1, i, 10.0 + (i % 3)) for i in range(20)] + [(1, 20, 500.0)]
    rows += [(2, i, 999.0 if i == 3 else 1.0) for i in range(4)]
    df = spark.createDataFrame(rows, ["k", "seq", "v"])
    out = rolling_zscore_anomalies(
        df, "k", ["seq"], "v", lookback=10, min_history=5
    ).collect()
    assert [(r["k"], r["seq"]) for r in out] == [(1, 20)]
    assert out[0]["z"] > 3


def test_rolling_zscore_zero_variance_window_skipped(spark):
    rows = [(1, i, 5.0) for i in range(10)] + [(1, 10, 6.0)]
    df = spark.createDataFrame(rows, ["k", "seq", "v"])
    out = rolling_zscore_anomalies(
        df, "k", ["seq"], "v", lookback=10, min_history=5
    ).collect()
    assert out == []  # sd=0 window never divides


# ---------------------------------------------------------- changepoint

def test_changepoint_finds_the_shift(spark):
    series = [(i, 10.0) for i in range(20)] + [(i, 50.0) for i in range(20, 40)]
    out = mean_shift_changepoint(
        spark.createDataFrame(series, ["t", "v"]), "t", "v"
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["split_at"] == 19  # last point of the left regime
    assert (r["mean_before"], r["mean_after"]) == (10.0, 50.0)
    assert r["n_before"] == 20 and r["n_after"] == 20


def test_changepoint_respects_min_segment(spark):
    series = [(i, float(i)) for i in range(12)]
    out = mean_shift_changepoint(
        spark.createDataFrame(series, ["t", "v"]), "t", "v", min_segment=5
    ).collect()[0]
    assert 4 <= out["split_at"] <= 6  # both segments >= 5 points


# ----------------------------------------------------------------- bm25

def test_bm25_ranks_matching_docs_first(spark):
    docs = [
        (1, "spark spark spark join"),
        (2, "spark join"),
        (3, "completely unrelated words here"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = bm25_topk(df, "text", "doc_id", ["spark"], k=10).collect()
    assert [r["doc_id"] for r in out] == [1, 2]  # tf monotone, 3 absent
    assert out[0]["score"] > out[1]["score"] > 0
    assert out[0]["rank"] == 1


def test_bm25_length_normalization(spark):
    # Same tf=1; the much longer doc scores lower (b > 0).
    docs = [(1, "spark " + "pad " * 50), (2, "spark pad")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = bm25_topk(df, "text", "doc_id", ["spark"], k=10).collect()
    assert [r["doc_id"] for r in out] == [2, 1]


# ------------------------------------------------------------- triangle

def test_triangle_stats_known_graph(spark):
    # K3 (1,2,3) plus a dangling edge 3-4: 1 triangle, wedges = 1+1+3+0.
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], ["src", "dst"]
    )
    out = triangle_stats(edges).collect()[0]
    assert out["n_nodes"] == 4 and out["n_edges"] == 4
    assert out["n_triangles"] == 1 and out["n_wedges"] == 5
    assert out["clustering"] == 0.6  # 3*1/5


def test_triangle_stats_triangle_free(spark):
    edges = spark.createDataFrame([(1, 2), (3, 4)], ["src", "dst"])
    out = triangle_stats(edges).collect()[0]
    assert out["n_triangles"] == 0 and out["clustering"] == 0.0


# -------------------------------------------------------------- logreg

def _py_logistic(rows, iters):
    """Pure-Python twin of logistic_fit: same Newton rounds, same 1e-6
    inter-round rounding — the engine must match it exactly."""
    import math

    from synthea2omop_etl_spark.operators.logreg import _round6

    b0 = b1 = 0.0
    for i in range(iters):
        g0 = g1 = h00 = h01 = h11 = 0.0
        for x, y in rows:
            p = 1.0 / (1.0 + math.exp(-(b0 + b1 * x)))
            w = p * (1.0 - p)
            g0 += y - p
            g1 += (y - p) * x
            h00 += w
            h01 += w * x
            h11 += w * x * x
        det = h00 * h11 - h01 * h01
        b0 = _round6(b0 + (h11 * g0 - h01 * g1) / det)
        b1 = _round6(b1 + (h00 * g1 - h01 * g0) / det)
    return round(b0, 4), round(b1, 4)


def test_logistic_fit_matches_python_twin(spark):
    from synthea2omop_etl_spark.operators.logreg import logistic_fit

    # y mostly 1 for x >= 3: positive slope, noisy enough to stay finite
    rows = [(x, 1 if (x >= 3) != (x in (1, 5)) else 0)
            for x in range(7) for _ in range(5)]
    df = spark.createDataFrame(rows, ["x", "y"])
    out = logistic_fit(df, "x", "y", iters=3).collect()[0]
    eb0, eb1 = _py_logistic(rows, 3)
    assert (out.beta0, out.beta1) == (eb0, eb1)
    assert out.beta1 > 0 and out.n_rows == len(rows)


def test_logistic_fit_single_round_is_engine_plan(spark):
    # iters=1 never collects: the whole fit is one Spark plan
    from synthea2omop_etl_spark.operators.logreg import logistic_fit

    rows = [(0, 0), (0, 1), (1, 0), (1, 1), (2, 1), (2, 1)]
    df = spark.createDataFrame(rows, ["x", "y"])
    out = logistic_fit(df, "x", "y", iters=1).collect()[0]
    eb0, eb1 = _py_logistic(rows, 1)
    assert (out.beta0, out.beta1) == (eb0, eb1)


def test_logistic_fit_rejects_zero_iters(spark):
    import pytest as _pytest

    from synthea2omop_etl_spark.operators.logreg import logistic_fit

    df = spark.createDataFrame([(0, 0)], ["x", "y"])
    with _pytest.raises(ValueError):
        logistic_fit(df, "x", "y", iters=0)


def _py_logistic2(rows, iters):
    """Pure-Python twin of logistic_fit2 (r10): same Newton rounds, same
    adjugate sub-expression order, same 1e-6 inter-round rounding."""
    import math

    from synthea2omop_etl_spark.operators.logreg import _round6

    b0 = b1 = b2 = 0.0
    for _ in range(iters):
        g0 = g1 = g2 = a = b = c = d = e = f = 0.0
        for x1, x2, y in rows:
            p = 1.0 / (1.0 + math.exp(-(b0 + b1 * x1 + b2 * x2)))
            w = p * (1.0 - p)
            g0 += y - p
            g1 += (y - p) * x1
            g2 += (y - p) * x2
            a += w
            b += w * x1
            c += w * x2
            d += w * x1 * x1
            e += w * x1 * x2
            f += w * x2 * x2
        det = (a * (d * f - e * e) - b * (b * f - c * e)
               + c * (b * e - c * d))
        i00 = d * f - e * e
        i01 = c * e - b * f
        i02 = b * e - c * d
        i11 = a * f - c * c
        i12 = b * c - a * e
        i22 = a * d - b * b
        b0 = _round6(b0 + (i00 * g0 + i01 * g1 + i02 * g2) / det)
        b1 = _round6(b1 + (i01 * g0 + i11 * g1 + i12 * g2) / det)
        b2 = _round6(b2 + (i02 * g0 + i12 * g1 + i22 * g2) / det)
    return round(b0, 4), round(b1, 4), round(b2, 4)


def test_logistic_fit2_matches_python_twin(spark):
    from synthea2omop_etl_spark.operators.logreg import logistic_fit2

    # y driven by x1, with x2 as a noisy second signal — finite, non-
    # collinear, non-separable
    rows = [
        (x1, (x1 * 3 + x2 * 7) % 5,
         1 if (x1 >= 3) != ((x1 + x2) % 4 == 0) else 0)
        for x1 in range(7) for x2 in range(4) for _ in range(2)
    ]
    df = spark.createDataFrame(rows, ["x1", "x2", "y"])
    out = logistic_fit2(df, "x1", "x2", "y", iters=3).collect()[0]
    assert (out.beta0, out.beta1, out.beta2) == _py_logistic2(rows, 3)
    assert out.n_rows == len(rows)


def test_logistic_fit2_collinear_features_rejected(spark):
    import pytest as _pytest

    from synthea2omop_etl_spark.operators.logreg import logistic_fit2

    rows = [(x, 2 * x, x % 2) for x in range(10)]
    df = spark.createDataFrame(rows, ["x1", "x2", "y"])
    with _pytest.raises(ValueError, match="singular"):
        logistic_fit2(df, "x1", "x2", "y", iters=3)
