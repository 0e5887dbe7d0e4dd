"""PageRank properties the hash-graded registry row can't express:
closed-form values on known graphs, weight sensitivity, dangling-mass
behavior, and convergence direction."""

from __future__ import annotations

import math

import pytest

from synthea2omop_etl_spark.operators.graph import pagerank


def _ranks(df):
    return {r["node"]: r["rank"] for r in df.collect()}


def test_two_node_cycle_is_uniform(spark):
    # a<->b is symmetric: rank stays at the uniform 1/2 every iteration.
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a")], ["src", "dst"]
    )
    r = _ranks(pagerank(edges, iters=4))
    assert r["a"] == pytest.approx(0.5, abs=1e-12)
    assert r["b"] == pytest.approx(0.5, abs=1e-12)


def test_star_sink_closed_form(spark):
    # a,b,c all point at hub d; nobody leaves d (dangling). After one
    # round from uniform 1/4: hub = 0.15/4 + 0.85*(3/4), spokes = 0.15/4.
    edges = spark.createDataFrame(
        [("a", "d"), ("b", "d"), ("c", "d")], ["src", "dst"]
    )
    r = _ranks(pagerank(edges, iters=1))
    spoke = 0.15 / 4
    assert r["a"] == pytest.approx(spoke, abs=1e-12)
    assert r["d"] == pytest.approx(spoke + 0.85 * 0.75, abs=1e-12)
    # Dangling hub leaks its mass (documented): total < 1 after round 2.
    r2 = _ranks(pagerank(edges, iters=2))
    assert sum(r2.values()) < 1.0
    # Ordering is stable regardless: hub stays on top.
    assert r2["d"] > r2["a"]


def test_weights_shift_mass(spark):
    # a splits 9:1 between b and c — b must end up above c.
    edges = spark.createDataFrame(
        [("a", "b", 9.0), ("a", "c", 1.0), ("b", "a", 1.0), ("c", "a", 1.0)],
        ["src", "dst", "w"],
    )
    r = _ranks(pagerank(edges, weight="w", iters=6))
    assert r["b"] > r["c"]
    # Unweighted, the same topology ties b and c exactly.
    ru = _ranks(pagerank(edges.drop("w"), iters=6))
    assert ru["b"] == pytest.approx(ru["c"], abs=1e-12)


def test_conserves_mass_without_dangling(spark):
    # Every node has an out-edge -> total mass stays exactly 1 per round.
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "b")], ["src", "dst"]
    )
    for k in (1, 3, 5):
        total = sum(_ranks(pagerank(edges, iters=k)).values())
        assert math.isclose(total, 1.0, abs_tol=1e-9)


# ---------------------------------------------------------------------------
# prefix-filtered set-similarity join (llm_ops/dedup.set_similarity_pairs)
# ---------------------------------------------------------------------------

def test_prefix_join_matches_brute_force(spark):
    from itertools import combinations

    from synthea2omop_etl_spark.llm_ops.dedup import set_similarity_pairs

    docs = [
        (1, "a b c d e"),
        (2, "a b c d e f"),   # J(1,2)=5/6
        (3, "a b c d x"),     # J(1,3)=4/6
        (4, "z y x w v u t"),
        (5, "z y x w v u"),   # J(4,5)=6/7
        (6, ""),              # excluded (empty token set)
        (7, "a b c d e"),     # identical to 1 -> J=1.0
    ]
    t = 0.8
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in set_similarity_pairs(df, "text", "doc_id", t).collect()
    }
    sets = {i: set(s.split()) for i, s in docs if s}
    want = {}
    for i, j in combinations(sorted(sets), 2):
        jac = round(
            len(sets[i] & sets[j]) / len(sets[i] | sets[j]), 4
        )
        if jac >= t:
            want[(i, j)] = jac
    assert got == want
    assert (1, 7) in got and got[(1, 7)] == 1.0
