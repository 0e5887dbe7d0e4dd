"""OMOP era derivation: drug_era / condition_era.

Standard OMOP CDM derived tables (consumed by Achilles' 900/1000-series
analyses): consecutive exposures/occurrences of the same concept for the
same person merge into one era when the gap between them is at most the
persistence window (30 days for both eras in the CDM convention).

Gap-and-island implementation (the sessionize shape over dates):
``lag(end) OVER (person, concept ORDER BY start)`` marks era starts, a
running sum of the marks numbers the islands, one groupBy collapses each
island to (min start, max end, count). Two window passes + one aggregate,
all partitioned by (person_id, concept_id) — a single shuffle key, no
driver involvement, holds at 100 TB.

Reference relationship: the reference delegates era building to the OHDSI
toolchain over its Postgres CDM (run_achilles.sh); this is the
engine-native equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _eras(
    df: DataFrame,
    concept_col: str,
    start_col: str,
    end_col: str,
    persistence_days: int,
    out_prefix: str,
) -> DataFrame:
    w = Window.partitionBy("person_id", concept_col).orderBy(
        F.col(start_col), F.col(end_col)
    )
    # An exposure starts a new era when it begins more than
    # persistence_days after the latest end seen so far (running max —
    # plain lag(end) breaks on contained intervals).
    prev_max_end = F.max(F.col(end_col)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = df.select(
        "person_id",
        F.col(concept_col).alias("concept_id"),
        F.col(start_col).alias("_start"),
        F.coalesce(F.col(end_col), F.col(start_col)).alias("_end"),
        F.when(
            prev_max_end.isNull()
            | (
                F.datediff(F.col(start_col), prev_max_end)
                > persistence_days
            ),
            1,
        )
        .otherwise(0)
        .alias("_new_era"),
    )
    w2 = Window.partitionBy("person_id", "concept_id").orderBy(
        "_start", "_end"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    islands = flagged.withColumn("_era", F.sum("_new_era").over(w2))
    return (
        islands.groupBy("person_id", "concept_id", "_era")
        .agg(
            F.min("_start").alias(f"{out_prefix}_start_date"),
            F.max("_end").alias(f"{out_prefix}_end_date"),
            F.count(F.lit(1)).alias(f"{out_prefix}_exposure_count"),
        )
        .drop("_era")
        .withColumnRenamed("concept_id", f"{out_prefix}_concept_id")
    )


def drug_era(
    drug_exposure: DataFrame, persistence_days: int = 30
) -> DataFrame:
    """drug_exposure → drug_era (per person+drug concept, ≤30-day gaps
    merge). Output: person_id, drug_era_concept_id, drug_era_start_date,
    drug_era_end_date, drug_era_exposure_count."""
    return _eras(
        drug_exposure,
        "drug_concept_id",
        "drug_exposure_start_date",
        "drug_exposure_end_date",
        persistence_days,
        "drug_era",
    )


def condition_era(
    condition_occurrence: DataFrame, persistence_days: int = 30
) -> DataFrame:
    """condition_occurrence → condition_era (per person+condition concept,
    ≤30-day gaps merge)."""
    return _eras(
        condition_occurrence,
        "condition_concept_id",
        "condition_start_date",
        "condition_end_date",
        persistence_days,
        "condition_era",
    )
