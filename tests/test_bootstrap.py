"""Poisson-bootstrap properties beyond the hash-graded parity row:
interval ordering/coverage, width vs alpha and vs n, determinism, and
the weight ladder's distribution."""

from __future__ import annotations

from synthea2omop_etl_spark.operators.bootstrap import (
    _POIS1_CDF,
    bootstrap_mean_ci,
)


def _one(df, **kw):
    rows = bootstrap_mean_ci(df, "x", "id", ["g"], **kw).collect()
    assert len(rows) == 1
    return rows[0]


def _mkdf(spark, n, spread=1.0, group="g"):
    # Deterministic synthetic sample with values id-derived (no RNG).
    return spark.createDataFrame(
        [(i, group, 100.0 + spread * ((i * 7919) % 101 - 50)) for i in range(n)],
        ["id", "g", "x"],
    )


def test_interval_brackets_mean(spark):
    r = _one(_mkdf(spark, 200), replicates=50)
    assert r["ci_lo"] <= r["mean_value"] <= r["ci_hi"]
    assert r["n_rows"] == 200


def test_narrower_alpha_nests(spark):
    df = _mkdf(spark, 200)
    wide = _one(df, replicates=50, alpha=0.05)
    tight = _one(df, replicates=50, alpha=0.5)
    assert wide["ci_lo"] <= tight["ci_lo"] <= tight["ci_hi"] <= wide["ci_hi"]


def test_width_shrinks_with_n(spark):
    small = _one(_mkdf(spark, 40), replicates=50)
    big = _one(_mkdf(spark, 640), replicates=50)
    assert (big["ci_hi"] - big["ci_lo"]) < (small["ci_hi"] - small["ci_lo"])


def test_deterministic(spark):
    df = _mkdf(spark, 100)
    assert _one(df, replicates=30) == _one(df, replicates=30)
    # A different salt resamples differently (same point estimate).
    other = _one(df, replicates=30, salt="boot2")
    assert other["mean_value"] == _one(df, replicates=30)["mean_value"]
    assert (other["ci_lo"], other["ci_hi"]) != (
        _one(df, replicates=30)["ci_lo"],
        _one(df, replicates=30)["ci_hi"],
    )


def test_poisson_ladder_is_a_cdf():
    import math

    assert all(b > a for a, b in zip(_POIS1_CDF, _POIS1_CDF[1:]))
    assert abs(_POIS1_CDF[0] - math.exp(-1)) < 1e-15
    assert _POIS1_CDF[-1] > 0.99998  # truncation bias ~1e-5
