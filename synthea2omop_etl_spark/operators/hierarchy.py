"""Iterative transitive closure over a DAG — the concept_ancestor builder.

The reference consumes Athena's pre-materialized CONCEPT_ANCESTOR table
(sql/omop_ddl.sql concept_ancestor; loaded by import_vocabulary.sh) and
never has to build it. An engine that claims the vocabulary surface should
also be able to PRODUCE that table from CONCEPT_RELATIONSHIP's 'Is a'
edges — the closure with min/max levels_of_separation is exactly what the
OHDSI vocabulary build pipeline materializes.

Spark-first design: min-plus / max-plus matrix "squaring" (path doubling).
Each round joins the current path set with itself, so path lengths double —
convergence in O(log2 diameter) rounds instead of O(diameter) one-hop BFS
rounds. Every round is one shuffle join + one groupBy (both keyed, both
AQE-planned); lineage is truncated per round with localCheckpoint, the
canonical Spark iterative-algorithm pattern (same as
llm_ops/cluster.py:connected_components).

Scale story at 100 TB: the output IS a materialized closure — it is big
because concept_ancestor is big (that is the point of materializing it).
Each doubling round shuffles on the join midpoint; skewed hub concepts are
AQE-split. The driver never sees rows: convergence is detected from a
two-scalar aggregate (count + sum of max depth), not a collect of data.

Requires a DAG: on a cyclic input max-depth doubling would diverge, so the
loop is capped by ``max_iter`` and documented as DAG-only (OMOP 'Is a' is
acyclic by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from synthea2omop_etl_spark.operators.lineage import cut_lineage


def transitive_closure(
    edges: DataFrame,
    src: str = "child",
    dst: str = "parent",
    max_iter: int = 12,
) -> DataFrame:
    """All (descendant, ancestor) pairs reachable via ``edges``, with the
    shortest and longest path lengths.

    Output columns: descendant, ancestor, min_depth, max_depth (bigint).
    Direct edges have depth 1; self-pairs are NOT emitted (callers wanting
    OMOP's 0-level self rows union them on — see build_concept_ancestor).

    ``max_iter`` caps doubling rounds: paths up to length 2**max_iter are
    found, far beyond any real vocabulary hierarchy (~20 levels deep).
    """
    paths = (
        edges.select(
            F.col(src).cast("long").alias("descendant"),
            F.col(dst).cast("long").alias("ancestor"),
        )
        .where(
            F.col("descendant").isNotNull()
            & F.col("ancestor").isNotNull()
            & (F.col("descendant") != F.col("ancestor"))
        )
        .distinct()
        .withColumn("min_depth", F.lit(1).cast("long"))
        .withColumn("max_depth", F.lit(1).cast("long"))
        # LAZY (r12, guide §1/§2.4 — fewer jobs): the convergence-state
        # aggregate is the action that materializes each checkpoint, so a
        # round runs ONE job instead of two (materialize, then aggregate).
        .transform(cut_lineage)
    )
    state = _closure_state(paths)
    for _ in range(max_iter):
        left = paths.select(
            "descendant",
            F.col("ancestor").alias("mid"),
            F.col("min_depth").alias("lmin"),
            F.col("max_depth").alias("lmax"),
        )
        right = paths.select(
            F.col("descendant").alias("mid"),
            F.col("ancestor").alias("up"),
            F.col("min_depth").alias("rmin"),
            F.col("max_depth").alias("rmax"),
        )
        doubled = left.join(right, "mid").select(
            "descendant",
            F.col("up").alias("ancestor"),
            (F.col("lmin") + F.col("rmin")).alias("min_depth"),
            (F.col("lmax") + F.col("rmax")).alias("max_depth"),
        )
        merged = (
            paths.unionByName(doubled)
            .groupBy("descendant", "ancestor")
            .agg(
                F.min("min_depth").alias("min_depth"),
                F.max("max_depth").alias("max_depth"),
            )
            .transform(cut_lineage)
        )
        new_state = _closure_state(merged)
        paths = merged
        if new_state == state:  # fixed point: no new pairs, no longer paths
            break
        state = new_state
    return paths


def _closure_state(paths: DataFrame) -> tuple:
    row = paths.agg(
        F.count("*").alias("n"), F.sum("max_depth").alias("s")
    ).collect()[0]
    return (row["n"], row["s"])


def build_concept_ancestor(
    concept_relationship: DataFrame,
    include_self: bool = True,
    max_iter: int = 12,
) -> DataFrame:
    """CONCEPT_ANCESTOR from CONCEPT_RELATIONSHIP 'Is a' edges.

    Output matches the OMOP DDL (sql/omop_ddl.sql concept_ancestor):
    ancestor_concept_id, descendant_concept_id,
    min_levels_of_separation, max_levels_of_separation — including the
    0-level self rows Athena ships when ``include_self``.
    """
    edges = concept_relationship.where(
        (F.col("relationship_id") == "Is a")
        & F.col("invalid_reason").isNull()
    ).select(
        F.col("concept_id_1").alias("child"),
        F.col("concept_id_2").alias("parent"),
    )
    closure = transitive_closure(edges, "child", "parent", max_iter=max_iter)
    out = closure.select(
        F.col("ancestor").alias("ancestor_concept_id"),
        F.col("descendant").alias("descendant_concept_id"),
        F.col("min_depth").alias("min_levels_of_separation"),
        F.col("max_depth").alias("max_levels_of_separation"),
    )
    if include_self:
        nodes = (
            edges.select(F.col("child").cast("long").alias("c"))
            .unionByName(edges.select(F.col("parent").cast("long").alias("c")))
            .distinct()
        )
        selfs = nodes.select(
            F.col("c").alias("ancestor_concept_id"),
            F.col("c").alias("descendant_concept_id"),
            F.lit(0).cast("long").alias("min_levels_of_separation"),
            F.lit(0).cast("long").alias("max_levels_of_separation"),
        )
        out = out.unionByName(selfs)
    return out
