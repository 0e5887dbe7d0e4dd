"""patient_expenses → omop.payer_plan_period (reference:
sql/etl/synthea-omop-ETL.sql:530-570): one row per patient-year,
period = Jan 1 .. Jan 1 + 1 year - 1 day."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from synthea2omop_etl_spark.domains._common import with_row_ids
from synthea2omop_etl_spark.functions import date_plus_one_year_minus_day


def payer_plan_period(
    patient_expenses_typed: DataFrame, person_map: DataFrame
) -> DataFrame:
    pe = patient_expenses_typed.join(
        person_map.select("patient_uuid", "person_id"),
        patient_expenses_typed["PATIENT"] == F.col("patient_uuid"),
        "inner",
    ).drop("patient_uuid")
    year_start = F.make_date(F.col("YEAR"), F.lit(1), F.lit(1))
    out = pe.select(
        F.col("person_id"),
        year_start.alias("payer_plan_period_start_date"),
        date_plus_one_year_minus_day(year_start).alias(
            "payer_plan_period_end_date"
        ),
        F.col("PATIENT").alias("_patient"),
        F.col("YEAR").alias("_year"),
    )
    out = with_row_ids(
        out, "payer_plan_period_id", ["_patient", "_year"]
    ).drop("_patient", "_year")
    return out.select(
        "payer_plan_period_id",
        "person_id",
        "payer_plan_period_start_date",
        "payer_plan_period_end_date",
    )
