"""encounters → omop.visit_occurrence (reference:
etl_pipeline/etl_encounters.py:362-410; sql/etl/transform_visit_occurrence_v2
.sql:7-69).

Semantics reproduced:
- ENCOUNTERCLASS → visit_concept_id CASE over ILIKE matches
  (9201 inpatient / 9202 ambulatory-outpatient-wellness / 9203
  emergency-urgentcare / 581476 home / 42898160 hospice / 5083 virtual;
  unmapped → 0);
- visit ids come from the visit_map (carries person_id — the monolith's
  variant, enhanced_synthea_to_omop.py:935-944);
- duplicate encounter ids deduped DISTINCT ON-style before mapping
  (sql/etl/populate_visit_map_v2.sql:9-14);
- end date falls back to start date when STOP is NULL;
- preceding_visit_occurrence_id is always NULL (synthea-omop-ETL.sql:109).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from synthea2omop_etl_spark.operators.dedupe import first_per_group
from synthea2omop_etl_spark.schemas import TYPE_EHR, VISIT_CLASS_CONCEPTS


def visit_concept_expr(col: str):
    c = F.lower(F.col(col))
    expr = None
    for k, v in VISIT_CLASS_CONCEPTS.items():
        cond = c.contains(k)
        expr = F.when(cond, v) if expr is None else expr.when(cond, v)
    return expr.otherwise(0)


def visit_occurrence(
    encounters_typed: DataFrame,
    visit_map: DataFrame,
    person_map: DataFrame,
    provider_map: DataFrame | None = None,
    care_site_map: DataFrame | None = None,
) -> DataFrame:
    """Build omop.visit_occurrence.

    ``visit_map``: (encounter_uuid, visit_occurrence_id);
    ``person_map``: (patient_uuid, person_id);
    ``provider_map``/``care_site_map`` (optional): encounters carry PROVIDER
    and ORGANIZATION UUIDs — the reference leaves these joins as a comment
    ("Could join to provider_map if available",
    transform_visit_occurrence_v2.sql:49-50); when the maps are given the
    join is performed, otherwise the columns are NULL as in the reference.
    """
    enc = first_per_group(
        encounters_typed, ["Id"], [F.col("START").asc_nulls_last()]
    )
    e = (
        enc.join(
            visit_map, enc["Id"] == visit_map["encounter_uuid"]
        )
        .join(
            person_map,
            enc["PATIENT"] == person_map["patient_uuid"],
        )
    )
    if provider_map is not None and "PROVIDER" in enc.columns:
        e = e.join(
            F.broadcast(provider_map.select("provider_uuid", "provider_id")),
            e["PROVIDER"] == F.col("provider_uuid"),
            "left",
        ).drop("provider_uuid")
    else:
        e = e.withColumn("provider_id", F.lit(None).cast("long"))
    if care_site_map is not None and "ORGANIZATION" in enc.columns:
        e = e.join(
            F.broadcast(care_site_map.select("care_site_uuid", "care_site_id")),
            e["ORGANIZATION"] == F.col("care_site_uuid"),
            "left",
        ).drop("care_site_uuid")
    else:
        e = e.withColumn("care_site_id", F.lit(None).cast("long"))
    return e.select(
        F.col("visit_occurrence_id"),
        F.col("person_id"),
        visit_concept_expr("ENCOUNTERCLASS").alias("visit_concept_id"),
        F.to_date("START").alias("visit_start_date"),
        F.col("START").alias("visit_start_datetime"),
        F.coalesce(F.to_date("STOP"), F.to_date("START")).alias(
            "visit_end_date"
        ),
        F.coalesce(F.col("STOP"), F.col("START")).alias("visit_end_datetime"),
        F.lit(TYPE_EHR).alias("visit_type_concept_id"),
        F.col("provider_id"),
        F.col("care_site_id"),
        F.col("Id").alias("visit_source_value"),
        F.col("ENCOUNTERCLASS").alias("visit_source_concept_value"),
        F.lit(None).cast("long").alias("preceding_visit_occurrence_id"),
    )
