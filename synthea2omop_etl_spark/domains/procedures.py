"""procedures → omop.procedure_occurrence (reference:
etl_pipeline/etl_procedures.py:156-203). Single event date, quantity = 1."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from synthea2omop_etl_spark.domains._common import join_person_visit, with_row_ids
from synthea2omop_etl_spark.schemas import TYPE_EHR


def procedure_occurrence(
    procedures_typed: DataFrame,
    person_map: DataFrame,
    visit_map: DataFrame,
    concept_map: DataFrame | None = None,
) -> DataFrame:
    p = join_person_visit(procedures_typed, person_map, visit_map)
    out = p.select(
        F.col("person_id"),
        F.to_date("DATE").alias("procedure_date"),
        F.col("DATE").alias("procedure_datetime"),
        F.lit(TYPE_EHR).alias("procedure_type_concept_id"),
        F.lit(1).alias("quantity"),
        F.col("visit_occurrence_id"),
        F.col("CODE").alias("procedure_source_value"),
        F.col("PATIENT").alias("_patient"),
        F.col("ENCOUNTER").alias("_encounter"),
    )
    if concept_map is not None:
        out = (
            out.join(
                F.broadcast(
                    concept_map.select(
                        F.col("source_code"),
                        F.col("target_concept_id").alias(
                            "procedure_concept_id"
                        ),
                    )
                ),
                out["procedure_source_value"] == F.col("source_code"),
                "left",
            )
            .drop("source_code")
            .withColumn(
                "procedure_concept_id",
                F.coalesce(F.col("procedure_concept_id"), F.lit(0)),
            )
        )
    else:
        out = out.withColumn("procedure_concept_id", F.lit(0))
    out = with_row_ids(
        out,
        "procedure_occurrence_id",
        ["_patient", "_encounter", "procedure_source_value", "procedure_date"],
    ).drop("_patient", "_encounter")
    return out.select(
        "procedure_occurrence_id",
        "person_id",
        "procedure_concept_id",
        "procedure_date",
        "procedure_datetime",
        "procedure_type_concept_id",
        "quantity",
        "visit_occurrence_id",
        "procedure_source_value",
    )
