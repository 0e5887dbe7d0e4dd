"""observations → omop.measurement + omop.observation (the routing
workhorse — reference: python/enhanced_synthea_to_omop.py:1950-2071;
routing variants etl_pipeline/etl_observations.py:33-96 and
sql/etl/synthea-omop-ETL.sql:367-368,425).

Numeric VALUEs (declared regex: signed sci-notation, SURVEY.md §7.3) →
measurement with value_as_number; everything else → observation with
value_as_string. The alternative LOINC-whitelist and category routings are
available via ``mode``.

Also implements the post-hoc "non-numeric transfer" (sql/etl/
transfer_non_numeric_to_observation.sql): because routing is done up front
with the same predicate, the transfer is a no-op here by construction —
documented invariant, asserted in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from synthea2omop_etl_spark.domains._common import join_person_visit, with_row_ids
from synthea2omop_etl_spark.functions import truncate_str
from synthea2omop_etl_spark.operators.split import route_numeric
from synthea2omop_etl_spark.schemas import TYPE_EHR


def measurement_and_observation(
    observations_typed: DataFrame,
    person_map: DataFrame,
    visit_map: DataFrame,
    mode: str = "regex",
    concept_map: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Returns (omop.measurement, omop.observation).

    ``concept_map`` (LOINC → standard, operators.concepts) fills
    measurement_concept_id / observation_concept_id; absent map → 0, the
    unmapped-concept convention (reference mapping step 9,
    etl_pipeline/etl_concept_mapping.py:136-242).
    """

    def _with_concept(df: DataFrame, src_col: str, target: str) -> DataFrame:
        if concept_map is None:
            return df.withColumn(target, F.lit(0))
        out = df.join(
            F.broadcast(
                concept_map.select(
                    F.col("source_code"),
                    F.col("target_concept_id").alias(target),
                )
            ),
            df[src_col] == F.col("source_code"),
            "left",
        ).drop("source_code")
        return out.withColumn(target, F.coalesce(F.col(target), F.lit(0)))

    o = join_person_visit(observations_typed, person_map, visit_map)
    meas_rows, obs_rows = route_numeric(
        o, "VALUE", mode=mode, code_col="CODE", category_col="CATEGORY"
    )

    measurement = meas_rows.select(
        F.col("person_id"),
        F.to_date("DATE").alias("measurement_date"),
        F.col("DATE").alias("measurement_datetime"),
        F.lit(TYPE_EHR).alias("measurement_type_concept_id"),
        F.col("VALUE").cast("double").alias("value_as_number"),
        truncate_str(F.col("UNITS"), 50).alias("unit_source_value"),
        F.col("visit_occurrence_id"),
        F.col("CODE").alias("measurement_source_value"),
        truncate_str(F.col("VALUE"), 50).alias("value_source_value"),
        F.col("PATIENT").alias("_patient"),
        F.col("ENCOUNTER").alias("_encounter"),
    )
    measurement = _with_concept(
        measurement, "measurement_source_value", "measurement_concept_id"
    )
    measurement = with_row_ids(
        measurement,
        "measurement_id",
        ["_patient", "_encounter", "measurement_source_value", "measurement_date", "value_source_value"],
    ).drop("_patient", "_encounter")

    observation = obs_rows.select(
        F.col("person_id"),
        F.to_date("DATE").alias("observation_date"),
        F.col("DATE").alias("observation_datetime"),
        F.lit(TYPE_EHR).alias("observation_type_concept_id"),
        truncate_str(F.col("VALUE"), 60).alias("value_as_string"),
        F.col("visit_occurrence_id"),
        F.col("CODE").alias("observation_source_value"),
        F.col("PATIENT").alias("_patient"),
        F.col("ENCOUNTER").alias("_encounter"),
    )
    observation = _with_concept(
        observation, "observation_source_value", "observation_concept_id"
    )
    observation = with_row_ids(
        observation,
        "observation_id",
        ["_patient", "_encounter", "observation_source_value", "observation_date", "value_as_string"],
    ).drop("_patient", "_encounter")

    return (
        measurement.select(
            "measurement_id",
            "person_id",
            "measurement_concept_id",
            "measurement_date",
            "measurement_datetime",
            "measurement_type_concept_id",
            "value_as_number",
            "unit_source_value",
            "visit_occurrence_id",
            "measurement_source_value",
            "value_source_value",
        ),
        observation.select(
            "observation_id",
            "person_id",
            "observation_concept_id",
            "observation_date",
            "observation_datetime",
            "observation_type_concept_id",
            "value_as_string",
            "visit_occurrence_id",
            "observation_source_value",
        ),
    )
