"""Concept-map build + apply (SURVEY.md §2.3 J6, J8-J10; §2.12).

Re-expression of the reference's vocabulary mapping:

- ``build_concept_map`` — per distinct source code pick ONE concept row
  (DISTINCT ON, preferring exact-case match then lowest concept_id;
  sql/etl/populate_concept_map_v2.sql:17-33), restricted to the target
  vocabulary/domain and excluding invalidated concepts
  (populate_concept_map_v2.sql:30-33). Unmapped codes get concept_id 0
  ("No matching concept" — the core OMOP convention, SURVEY.md §2.2 P8).
- ``apply_concept_mapping`` — the reference's UPDATE..FROM 3-stage mapping
  (etl_pipeline/etl_concept_mapping.py:136-242) becomes: join facts to the
  map, coalesce to 0, full-column rewrite (no in-place update in Spark).

Scale note: CONCEPT is millions of rows, but filtered to one vocabulary +
domain it is small → filter FIRST, then broadcast the slice (the reference
does the same filter; we add the broadcast). The fact side never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from synthea2omop_etl_spark.operators.dedupe import first_per_group


def build_concept_map(
    source_codes: DataFrame,
    concept: DataFrame,
    code_col: str,
    vocabulary_id: str,
    domain_id: str | None = None,
    standard_only: bool = True,
) -> DataFrame:
    """Map distinct source codes → (concept_id, concept_name).

    Output columns: source_code, target_concept_id, target_concept_name.
    Every input code appears exactly once; unmapped → concept 0.
    """
    codes = source_codes.select(
        F.col(code_col).alias("source_code")
    ).where(F.col(code_col).isNotNull()).distinct()

    cand = concept.where(
        (F.col("vocabulary_id") == vocabulary_id)
        & F.col("invalid_reason").isNull()
    )
    if domain_id is not None:
        cand = cand.where(F.col("domain_id") == domain_id)
    if standard_only:
        cand = cand.where(F.col("standard_concept") == "S")
    cand = cand.select(
        F.col("concept_code"), F.col("concept_id"), F.col("concept_name")
    )

    joined = codes.join(
        F.broadcast(cand),
        F.lower(codes.source_code) == F.lower(cand.concept_code),
        "left",
    )
    # DISTINCT ON (source_code) ORDER BY exact-case-match first, concept_id
    # (python/enhanced_synthea_to_omop.py:789-811).
    picked = first_per_group(
        joined,
        ["source_code"],
        [
            F.when(F.col("source_code") == F.col("concept_code"), 0)
            .otherwise(1)
            .asc(),
            F.col("concept_id").asc_nulls_last(),
        ],
    )
    return picked.select(
        "source_code",
        F.coalesce(F.col("concept_id"), F.lit(0)).alias("target_concept_id"),
        F.coalesce(F.col("concept_name"), F.lit("No matching concept")).alias(
            "target_concept_name"
        ),
    )


def two_hop_standard_map(
    concept: DataFrame, concept_relationship: DataFrame
) -> DataFrame:
    """source concept → 'Maps to' → standard concept (J6).

    Output: source_concept_id, standard_concept_id. The relationship table
    filtered to 'Maps to' is small relative to facts → broadcast.
    """
    rel = concept_relationship.where(
        (F.col("relationship_id") == "Maps to")
        & F.col("invalid_reason").isNull()
    ).select(
        F.col("concept_id_1").alias("source_concept_id"),
        F.col("concept_id_2").alias("mapped_id"),
    )
    std = concept.where(
        (F.col("standard_concept") == "S") & F.col("invalid_reason").isNull()
    ).select(F.col("concept_id").alias("standard_concept_id"))
    return rel.join(
        std, rel.mapped_id == std.standard_concept_id, "inner"
    ).select("source_concept_id", "standard_concept_id")


def map_to_standard(
    source_codes: DataFrame,
    concept: DataFrame,
    concept_relationship: DataFrame,
    code_col: str,
    vocabulary_id: str,
    domain_id: str | None = None,
) -> DataFrame:
    """The reference's full 3-stage mapping
    (etl_pipeline/etl_concept_mapping.py:136-180):

    1. source code → source concept (standard or not),
    2. source concept → 'Maps to' → standard concept,
    3. fallback: if the source concept is itself standard, keep it.

    Output: source_code, target_concept_id (0 when no path exists).
    Exactly ONE row per source_code: a source concept with several valid
    'Maps to' relationships (common in real Athena vocabularies) would fan
    the hop join out, and a downstream fact join on source_code would then
    duplicate fact rows — something the reference's UPDATE..FROM
    (etl_concept_mapping.py:152-164) can never do. We collapse to the lowest
    standard concept_id, the same deterministic pick build_concept_map uses.
    """
    src = build_concept_map(
        source_codes, concept, code_col, vocabulary_id, domain_id,
        standard_only=False,
    ).select(
        "source_code", F.col("target_concept_id").alias("source_concept_id")
    )
    hop = two_hop_standard_map(concept, concept_relationship)
    std_ids = concept.where(
        (F.col("standard_concept") == "S") & F.col("invalid_reason").isNull()
    ).select(F.col("concept_id").alias("direct_standard_id"))
    out = (
        src.join(F.broadcast(hop), "source_concept_id", "left")
        .join(
            F.broadcast(std_ids),
            src.source_concept_id == F.col("direct_standard_id"),
            "left",
        )
        .select(
            "source_code",
            F.coalesce(
                F.col("standard_concept_id"),
                F.col("direct_standard_id"),
                F.lit(0),
            ).alias("target_concept_id"),
        )
    )
    return first_per_group(
        out, ["source_code"], [F.col("target_concept_id").asc()]
    )


def apply_concept_mapping(
    facts: DataFrame,
    concept_map: DataFrame,
    code_col: str,
    target_col: str,
) -> DataFrame:
    """Rewrite ``facts`` with ``target_col`` = mapped concept id (0 if none).

    The UPDATE..FROM (J8) becomes a broadcast left join + coalesce — a full
    recompute of the column, embracing immutability (SURVEY.md §7.3).
    """
    mapped = facts.join(
        F.broadcast(concept_map.select("source_code", "target_concept_id")),
        facts[code_col] == concept_map.source_code,
        "left",
    )
    return mapped.withColumn(
        target_col, F.coalesce(F.col("target_concept_id"), F.lit(0))
    ).drop("source_code", "target_concept_id")
