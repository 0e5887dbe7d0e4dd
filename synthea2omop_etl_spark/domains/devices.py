"""devices → omop.device_exposure (reference:
sql/etl/synthea-omop-ETL.sql:242-296). UDI carried through."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from synthea2omop_etl_spark.domains._common import join_person_visit, with_row_ids
from synthea2omop_etl_spark.schemas import TYPE_EHR


def device_exposure(
    devices_typed: DataFrame,
    person_map: DataFrame,
    visit_map: DataFrame,
    concept_map: DataFrame | None = None,
) -> DataFrame:
    d = join_person_visit(devices_typed, person_map, visit_map)
    out = d.select(
        F.col("person_id"),
        F.to_date("START").alias("device_exposure_start_date"),
        F.to_date("STOP").alias("device_exposure_end_date"),
        F.lit(TYPE_EHR).alias("device_type_concept_id"),
        F.col("UDI").alias("unique_device_id"),
        F.col("visit_occurrence_id"),
        F.col("CODE").alias("device_source_value"),
        F.col("PATIENT").alias("_patient"),
        F.col("ENCOUNTER").alias("_encounter"),
    )
    if concept_map is not None:
        out = out.join(
            F.broadcast(
                concept_map.select(
                    F.col("source_code"),
                    F.col("target_concept_id").alias("device_concept_id"),
                )
            ),
            out["device_source_value"] == F.col("source_code"),
            "left",
        ).drop("source_code")
        out = out.withColumn(
            "device_concept_id",
            F.coalesce(F.col("device_concept_id"), F.lit(0)),
        )
    else:
        out = out.withColumn("device_concept_id", F.lit(0))
    out = with_row_ids(
        out,
        "device_exposure_id",
        ["_patient", "_encounter", "device_source_value", "device_exposure_start_date"],
    ).drop("_patient", "_encounter")
    return out.select(
        "device_exposure_id",
        "person_id",
        "device_concept_id",
        "device_exposure_start_date",
        "device_exposure_end_date",
        "device_type_concept_id",
        "unique_device_id",
        "visit_occurrence_id",
        "device_source_value",
    )
