"""conditions → omop.condition_occurrence (reference:
etl_pipeline/etl_conditions.py:154-203).

Semantics: person inner join, visit left join, NULL-safe stop date
(P7: empty → NULL), SNOMED source code carried to source_value, concept
mapping applied separately (operators.concepts), EHR type concept.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from synthea2omop_etl_spark.domains._common import join_person_visit, with_row_ids
from synthea2omop_etl_spark.schemas import TYPE_EHR


def condition_occurrence(
    conditions_typed: DataFrame,
    person_map: DataFrame,
    visit_map: DataFrame,
    concept_map: DataFrame | None = None,
) -> DataFrame:
    c = join_person_visit(conditions_typed, person_map, visit_map)
    out = c.select(
        F.col("person_id"),
        F.to_date("START").alias("condition_start_date"),
        F.to_date("STOP").alias("condition_end_date"),
        F.lit(TYPE_EHR).alias("condition_type_concept_id"),
        F.col("visit_occurrence_id"),
        F.col("CODE").alias("condition_source_value"),
        F.col("PATIENT").alias("_patient"),
        F.col("ENCOUNTER").alias("_encounter"),
    )
    if concept_map is not None:
        out = out.join(
            F.broadcast(
                concept_map.select(
                    F.col("source_code"),
                    F.col("target_concept_id").alias("condition_concept_id"),
                )
            ),
            out["condition_source_value"] == F.col("source_code"),
            "left",
        ).drop("source_code")
        out = out.withColumn(
            "condition_concept_id",
            F.coalesce(F.col("condition_concept_id"), F.lit(0)),
        )
    else:
        out = out.withColumn("condition_concept_id", F.lit(0))
    out = with_row_ids(
        out,
        "condition_occurrence_id",
        ["_patient", "_encounter", "condition_source_value", "condition_start_date"],
    ).drop("_patient", "_encounter")
    return out.select(
        "condition_occurrence_id",
        "person_id",
        "condition_concept_id",
        "condition_start_date",
        "condition_end_date",
        "condition_type_concept_id",
        "visit_occurrence_id",
        "condition_source_value",
    )
