"""death: patients with a DEATHDATE (reference: sql/etl/transform_death.sql:
4-30) — filter not-null + person_map join; idempotency via anti-join is the
writer's job (sources.writers.insert_if_absent)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from synthea2omop_etl_spark.schemas import TYPE_EHR


def death(patients_typed: DataFrame, person_map: DataFrame) -> DataFrame:
    return (
        patients_typed.where(F.col("DEATHDATE").isNotNull())
        .join(
            person_map.select("patient_uuid", "person_id"),
            F.col("Id") == F.col("patient_uuid"),
            "inner",
        )
        .select(
            "person_id",
            F.to_date("DEATHDATE").alias("death_date"),
            F.col("DEATHDATE").cast("timestamp").alias("death_datetime"),
            F.lit(TYPE_EHR).alias("death_type_concept_id"),
        )
    )
