"""medications → omop.drug_exposure (reference:
etl_pipeline/etl_medications.py:166-232; immunizations variant
sql/etl/synthea-omop-ETL.sql:436-501).

Semantics: refills = DISPENSES - 1 (missing → 0); days_supply =
datediff(STOP, START); quantity defaults to 1; end date falls back to
start; RxNorm/CVX code → source_value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from synthea2omop_etl_spark.domains._common import join_person_visit, with_row_ids
from synthea2omop_etl_spark.schemas import TYPE_EHR


def drug_exposure(
    medications_typed: DataFrame,
    person_map: DataFrame,
    visit_map: DataFrame,
    concept_map: DataFrame | None = None,
) -> DataFrame:
    m = join_person_visit(medications_typed, person_map, visit_map)
    out = m.select(
        F.col("person_id"),
        F.to_date("START").alias("drug_exposure_start_date"),
        F.coalesce(F.to_date("STOP"), F.to_date("START")).alias(
            "drug_exposure_end_date"
        ),
        F.lit(TYPE_EHR).alias("drug_type_concept_id"),
        (F.coalesce(F.col("DISPENSES"), F.lit(1)) - 1).alias("refills"),
        F.lit(1.0).alias("quantity"),
        F.datediff(
            F.coalesce(F.to_date("STOP"), F.to_date("START")),
            F.to_date("START"),
        ).alias("days_supply"),
        F.col("visit_occurrence_id"),
        F.col("CODE").alias("drug_source_value"),
        F.col("PATIENT").alias("_patient"),
        F.col("ENCOUNTER").alias("_encounter"),
    )
    if concept_map is not None:
        out = (
            out.join(
                F.broadcast(
                    concept_map.select(
                        F.col("source_code"),
                        F.col("target_concept_id").alias("drug_concept_id"),
                    )
                ),
                out["drug_source_value"] == F.col("source_code"),
                "left",
            )
            .drop("source_code")
            .withColumn(
                "drug_concept_id",
                F.coalesce(F.col("drug_concept_id"), F.lit(0)),
            )
        )
    else:
        out = out.withColumn("drug_concept_id", F.lit(0))
    out = with_row_ids(
        out,
        "drug_exposure_id",
        ["_patient", "_encounter", "drug_source_value", "drug_exposure_start_date"],
    ).drop("_patient", "_encounter")
    return out.select(
        "drug_exposure_id",
        "person_id",
        "drug_concept_id",
        "drug_exposure_start_date",
        "drug_exposure_end_date",
        "drug_type_concept_id",
        "refills",
        "quantity",
        "days_supply",
        "visit_occurrence_id",
        "drug_source_value",
    )
