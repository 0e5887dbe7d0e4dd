"""providers → omop.provider, organizations → omop.care_site.

Reference: staging maps sql/staging/synthea-omop-staging.sql:37-48
(provider_map/care_site_map sequences + mapping tables); output columns per
sql/omop_ddl/OMOPCDM_postgresql_5.4_ddl.sql:281-302. The reference's ETL
declares the maps and leaves fact-table provider_id/care_site_id as "join
the map if you have it" (transform_visit_occurrence_v2.sql:49-50); here the
maps are built and the joins are performed.

Both inputs are dimension-sized (one row per practitioner / facility), so
every map join in the fact transforms is a broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from synthea2omop_etl_spark.schemas import GENDER_CONCEPTS, NO_MATCHING_CONCEPT


def _gender_concept(col: str):
    expr = None
    for k, v in GENDER_CONCEPTS.items():
        cond = F.col(col) == k
        expr = F.when(cond, v) if expr is None else expr.when(cond, v)
    return expr.otherwise(NO_MATCHING_CONCEPT)


def provider(
    providers_typed: DataFrame,
    provider_map: DataFrame,
    care_site_map: DataFrame | None = None,
) -> DataFrame:
    """Build omop.provider (DDL :289-302).

    ``provider_map``: (provider_uuid, provider_id);
    ``care_site_map``: (care_site_uuid, care_site_id) joined over the
    provider's ORGANIZATION so each practitioner points at their facility.
    """
    p = providers_typed.join(
        F.broadcast(provider_map.select("provider_uuid", "provider_id")),
        providers_typed["Id"] == F.col("provider_uuid"),
        "inner",
    ).drop("provider_uuid")
    if care_site_map is not None:
        p = p.join(
            F.broadcast(care_site_map.select("care_site_uuid", "care_site_id")),
            p["ORGANIZATION"] == F.col("care_site_uuid"),
            "left",
        ).drop("care_site_uuid")
    else:
        p = p.withColumn("care_site_id", F.lit(None).cast("long"))
    return p.select(
        F.col("provider_id"),
        F.col("NAME").alias("provider_name"),
        F.lit(None).cast("string").alias("npi"),
        F.lit(None).cast("string").alias("dea"),
        F.lit(NO_MATCHING_CONCEPT).alias("specialty_concept_id"),
        F.col("care_site_id"),
        F.lit(None).cast("int").alias("year_of_birth"),
        _gender_concept("GENDER").alias("gender_concept_id"),
        F.col("Id").alias("provider_source_value"),
        F.col("SPECIALITY").alias("specialty_source_value"),
        F.col("GENDER").alias("gender_source_value"),
    )


def care_site(
    organizations_typed: DataFrame,
    care_site_map: DataFrame,
    locations: DataFrame | None = None,
) -> DataFrame:
    """Build omop.care_site (DDL :281-287). ``locations`` fuses the
    location_id lookup (broadcast, derived/location.py) into the single
    organizations scan — same shape as domains/person.py."""
    o = organizations_typed.join(
        F.broadcast(care_site_map.select("care_site_uuid", "care_site_id")),
        organizations_typed["Id"] == F.col("care_site_uuid"),
        "inner",
    ).drop("care_site_uuid")
    loc_col = F.lit(None).cast("long").alias("location_id")
    if locations is not None:
        from synthea2omop_etl_spark.derived.location import (
            keyed_locations,
            source_address_key,
        )

        key = source_address_key(organizations_typed)
        if key is not None:
            loc_keyed = keyed_locations(locations)
            o = o.join(
                loc_keyed, key == loc_keyed["__key"], "left"
            ).drop("__key")
            loc_col = F.col("location_id").cast("long").alias("location_id")
    return o.select(
        F.col("care_site_id"),
        F.col("NAME").alias("care_site_name"),
        F.lit(NO_MATCHING_CONCEPT).alias("place_of_service_concept_id"),
        loc_col,
        F.col("Id").alias("care_site_source_value"),
        F.lit(None).cast("string").alias("place_of_service_source_value"),
    )
