"""OMOP vocabulary loading: the full 8-table surface.

Reference: python/enhanced_vocabulary_loader.py:499-596 (table DDL) and
:607-650 (delimiter sniffing / ''→NULL). Athena vocabulary exports are
TSVs with YYYYMMDD dates; every load is read-as-string then cast-or-null
(same typing semantics as the Synthea layer).

Scale notes: concept (~7M rows) and concept_relationship (~50M) are
broadcast-sized only after filtering to the vocabularies in use — loaders
return plain DataFrames and let callers decide; concept_ancestor joins in
analytics are fact-side streamed with the (filtered) ancestor side
broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from synthea2omop_etl_spark.sources.readers import read_vocabulary_table

# table -> {col: dtype}; strings are omitted (pass through).
# Dates are Athena-style YYYYMMDD (enhanced_vocabulary_loader.py's loaders
# parse them the same way).
VOCABULARY_SCHEMAS: dict[str, dict[str, str]] = {
    "concept": {
        "concept_id": "int",
        "valid_start_date": "vocab_date",
        "valid_end_date": "vocab_date",
    },
    "vocabulary": {"vocabulary_concept_id": "int"},
    "domain": {"domain_concept_id": "int"},
    "concept_class": {"concept_class_concept_id": "int"},
    "relationship": {"relationship_concept_id": "int"},
    "concept_relationship": {
        "concept_id_1": "int",
        "concept_id_2": "int",
        "valid_start_date": "vocab_date",
        "valid_end_date": "vocab_date",
    },
    "concept_ancestor": {
        "ancestor_concept_id": "int",
        "descendant_concept_id": "int",
        "min_levels_of_separation": "int",
        "max_levels_of_separation": "int",
    },
    "drug_strength": {
        "drug_concept_id": "int",
        "ingredient_concept_id": "int",
        "amount_value": "double",
        "amount_unit_concept_id": "int",
        "numerator_value": "double",
        "numerator_unit_concept_id": "int",
        "denominator_value": "double",
        "denominator_unit_concept_id": "int",
        "box_size": "int",
        "valid_start_date": "vocab_date",
        "valid_end_date": "vocab_date",
    },
}


def _typed(df: DataFrame, schema: dict[str, str]) -> DataFrame:
    cols = []
    for name in df.columns:
        dtype = schema.get(name)
        if dtype is None:
            cols.append(F.col(name))
        elif dtype == "vocab_date":
            cols.append(F.to_date(F.col(name), "yyyyMMdd").alias(name))
        else:
            cols.append(F.col(name).cast(dtype).alias(name))
    return df.select(*cols)


def load_vocabulary_table(
    spark: SparkSession, path: str, table: str
) -> DataFrame:
    """One vocabulary TSV/CSV → typed DataFrame (delimiter-sniffed,
    ''→NULL, cast-or-null)."""
    if table not in VOCABULARY_SCHEMAS:
        raise ValueError(f"unknown vocabulary table: {table!r}")
    return _typed(read_vocabulary_table(spark, path), VOCABULARY_SCHEMAS[table])


def load_vocabulary(
    spark: SparkSession, vocab_dir: str, tables: list[str] | None = None
) -> dict[str, DataFrame]:
    """Load every (present) vocabulary table from an Athena export dir.

    File naming follows Athena: CONCEPT.csv, CONCEPT_ANCESTOR.csv, … —
    upper-cased table name, .csv extension, tab-separated content.
    """
    import os

    out: dict[str, DataFrame] = {}
    for table in tables or list(VOCABULARY_SCHEMAS):
        path = os.path.join(vocab_dir, f"{table.upper()}.csv")
        if os.path.exists(path):
            out[table] = load_vocabulary_table(spark, path, table)
    return out


def drug_class_rollup(
    drug_exposure: DataFrame,
    concept: DataFrame,
    concept_ancestor: DataFrame,
    class_concept_class_id: str = "ATC 3rd",
) -> DataFrame:
    """Exposure counts rolled up to drug classes via concept_ancestor —
    the canonical use of the ancestry table (every drug descends from its
    ATC classes / ingredients).

    Shape: fact → ancestor (descendant side) → class concept filter; the
    ancestor and concept sides are filtered-then-broadcast, the fact side
    never shuffles until the final per-class aggregate.
    """
    classes = concept.where(
        F.col("concept_class_id") == class_concept_class_id
    ).select(
        F.col("concept_id").alias("class_concept_id"),
        F.col("concept_name").alias("class_name"),
    )
    anc = concept_ancestor.select(
        F.col("ancestor_concept_id").alias("class_concept_id"),
        F.col("descendant_concept_id"),
    )
    return (
        drug_exposure.join(
            F.broadcast(
                anc.join(classes, "class_concept_id")
            ),
            drug_exposure["drug_concept_id"] == F.col("descendant_concept_id"),
        )
        .groupBy("class_concept_id", "class_name")
        .agg(
            F.count(F.lit(1)).alias("n_exposures"),
            F.countDistinct("person_id").alias("n_persons"),
        )
    )
