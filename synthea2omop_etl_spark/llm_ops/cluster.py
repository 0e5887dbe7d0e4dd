"""Connected components over a pair graph — dedup clustering.

Near-dup detection (MinHash/embedding) yields PAIRS; a usable dedup needs
CLUSTERS (each doc → canonical representative). This is iterative min-label
propagation (the standard large-graph CC algorithm on Spark, cf. the
Hash-to-Min approach): every node repeatedly adopts the smallest id among
itself and its neighbors until a fixed point.

Convergence in O(diameter) rounds; each round is one join + one aggregate
(shuffle on node id). Lineage is truncated every round via localCheckpoint
so the plan does not grow unboundedly — the canonical iterative-algorithm
pattern on Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from synthea2omop_etl_spark.operators.lineage import cut_lineage


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) for every node in ``edges``; component = min node
    id reachable. Deterministic.

    DELTA propagation (r12, guide §2.3 — shuffle fewer bytes): round k
    builds neighbor offers only from labels that CHANGED in round k-1.
    Sound because labels are monotone non-increasing and an absorbed
    offer persists: if neighbor v last changed in round j, its offer
    comp_j(v) was delivered in round j+1 and min-absorbed, so re-offering
    the unchanged label is pure waste. The per-round label state (and
    therefore the round count, the early-exit point, and the fixpoint)
    is IDENTICAL to full propagation; round 1 starts with every label
    marked changed. The changed side shrinks toward ∅, so late rounds
    join the edge list against a frame AQE broadcasts — at scale the
    per-round shuffle decays with the frontier instead of staying
    edge-list-sized.
    """
    # MATERIALIZED once (localCheckpoint): every propagation round joins
    # the symmetrized edge list, and a lazy plan would re-derive the
    # whole upstream pair generation (for dedup clusters: the full
    # MinHash/LSH candidate join + Jaccard verify) once per round —
    # O(diameter) × the detection cost. This single materialization was
    # the dominant sf1 constant in leakage_safe_split/corpus_curation
    # before round 9.
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(
            edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
        )
        .distinct()
        .transform(cut_lineage, eager=True)
    )
    labels = (
        sym.select("u")
        .distinct()
        .select("u", F.col("u").alias("comp"), F.lit(True).alias("__changed"))
    )
    for _ in range(max_iter):
        delta = labels.where("__changed").select(
            F.col("u").alias("lu"), F.col("comp").alias("lcomp")
        )
        neighbor_min = (
            sym.withColumnsRenamed({"u": "nu", "v": "nv"})
            .join(delta, F.col("nv") == F.col("lu"), "inner")
            .select(F.col("nu").alias("node"), F.col("lcomp"))
            .groupBy("node")
            .agg(F.min("lcomp").alias("nmin"))
        )
        # The adoption flag rides INSIDE the checkpointed frame: labels can
        # only DECREASE, so "changed" = any row whose new comp is below its
        # old one — detected by a scan of the materialized checkpoint
        # instead of a second labels join per round (one join + one shuffle
        # saved per iteration). The checkpoint is LAZY (r12, guide §1/§2.4
        # — fewer jobs): the convergence probe below is the action that
        # materializes it, so each round runs ONE job where the eager form
        # ran two (materialize, then probe). The limit(1) probe
        # early-exits on non-converged rounds (partial materialization —
        # the tail partitions fill in when the CONVERGED round's full
        # scan, or any downstream shuffle, computes through them; lazy
        # checkpoint partitions store on first computation, so nothing
        # re-derives twice). A full per-round count() was A/B-tested in
        # r12 and measured SLOWER (admission 14.9 s vs 10.5 s at sf1):
        # it forces the complete O(E) propagation job every round where
        # the early exit pays only a prefix.
        new_labels = (
            labels.join(neighbor_min, labels.u == neighbor_min.node, "left")
            .select(
                "u",
                F.least(
                    F.col("comp"), F.coalesce(F.col("nmin"), F.col("comp"))
                ).alias("comp"),
                (
                    F.coalesce(F.col("nmin"), F.col("comp")) < F.col("comp")
                ).alias("__changed"),
            )
            .transform(cut_lineage)
        )
        changed = new_labels.where("__changed").limit(1).count()
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("u").alias("node"), F.col("comp").alias("component"))


def dedup_clusters(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """Pair list → (doc, canonical_id): canonical = min doc id per cluster."""
    cc = connected_components(pairs, id_a, id_b)
    return cc.select(
        F.col("node").alias("doc"), F.col("component").alias("canonical_id")
    )
