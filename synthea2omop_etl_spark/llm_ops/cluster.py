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


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) for every node in ``edges``; component = min node
    id reachable. Deterministic."""
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
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select("u")
        .distinct()
        .withColumn("comp", F.col("u"))
    )
    for _ in range(max_iter):
        neighbor_min = (
            sym.withColumnsRenamed({"u": "nu", "v": "nv"})
            .join(
                labels.withColumnsRenamed({"u": "lu", "comp": "lcomp"}),
                F.col("nv") == F.col("lu"),
                "inner",
            )
            .select(F.col("nu").alias("node"), F.col("lcomp"))
            .groupBy("node")
            .agg(F.min("lcomp").alias("nmin"))
        )
        # The adoption flag rides INSIDE the checkpointed frame: labels can
        # only DECREASE, so "changed" = any row whose new comp is below its
        # old one — detected by a scan of the already-materialized
        # checkpoint instead of a second labels join per round (one join +
        # one shuffle saved per iteration).
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
            .localCheckpoint(eager=True)
        )
        changed = new_labels.where("__changed").limit(1).count()
        labels = new_labels.drop("__changed")
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
