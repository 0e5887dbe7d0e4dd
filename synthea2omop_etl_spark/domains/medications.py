"""medications (+ immunizations) → omop.drug_exposure.

Reference: etl_pipeline/etl_medications.py:166-232 (medications variant);
sql/etl/synthea-omop-ETL.sql:436-501 (immunizations variant).

Medications semantics: refills = DISPENSES - 1 (missing → 0); days_supply =
datediff(STOP, START); quantity defaults to 1; end date falls back to
start; RxNorm code → source_value.

Immunizations semantics (synthea-omop-ETL.sql:436-501): single-date
exposure (start = end = DATE), refills/quantity/days_supply NULL, CVX code
→ source_value, drug_type 38000177; the reference's NOT-EXISTS guard
against an identical medication row becomes an anti-join on
(person_id, start_date, source_value) — CVX and RxNorm code spaces are
disjoint, so this never drops a real immunization.

Both variants produce id-less rows; ids are assigned once over the union so
drug_exposure_id is dense across sources (the reference draws both inserts
from the same staging.drug_exposure_seq).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from synthea2omop_etl_spark.domains._common import join_person_visit, with_row_ids
from synthea2omop_etl_spark.schemas import IMMUNIZATION_DRUG_TYPE, TYPE_EHR

_OUT_COLS = [
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
]


def _medication_rows(
    medications_typed: DataFrame,
    person_map: DataFrame,
    visit_map: DataFrame,
) -> DataFrame:
    m = join_person_visit(medications_typed, person_map, visit_map)
    return m.select(
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


def _immunization_rows(
    immunizations_typed: DataFrame,
    person_map: DataFrame,
    visit_map: DataFrame,
) -> DataFrame:
    i = join_person_visit(immunizations_typed, person_map, visit_map)
    return i.select(
        F.col("person_id"),
        F.to_date("DATE").alias("drug_exposure_start_date"),
        F.to_date("DATE").alias("drug_exposure_end_date"),
        F.lit(IMMUNIZATION_DRUG_TYPE).alias("drug_type_concept_id"),
        F.lit(None).cast("int").alias("refills"),
        F.lit(None).cast("double").alias("quantity"),
        F.lit(None).cast("int").alias("days_supply"),
        F.col("visit_occurrence_id"),
        F.col("CODE").alias("drug_source_value"),
        F.col("PATIENT").alias("_patient"),
        F.col("ENCOUNTER").alias("_encounter"),
    )


def drug_exposure(
    medications_typed: DataFrame | None,
    person_map: DataFrame,
    visit_map: DataFrame,
    concept_map: DataFrame | None = None,
    immunizations_typed: DataFrame | None = None,
) -> DataFrame:
    """Either source may be absent (a partial Synthea export): an
    immunizations-only input still produces its drug_exposure rows."""
    if medications_typed is None and immunizations_typed is None:
        raise ValueError(
            "drug_exposure needs medications and/or immunizations input"
        )
    out = (
        _medication_rows(medications_typed, person_map, visit_map)
        if medications_typed is not None
        else None
    )
    if immunizations_typed is not None:
        imm = _immunization_rows(immunizations_typed, person_map, visit_map)
        if out is not None:
            # NOT-EXISTS guard (synthea-omop-ETL.sql:495-501): drop
            # immunization rows that duplicate a medication exposure.
            dedup_key = [
                "person_id", "drug_exposure_start_date", "drug_source_value"
            ]
            imm = imm.join(out.select(*dedup_key), dedup_key, "left_anti")
            out = out.unionByName(imm)
        else:
            out = imm
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
    return out.select(*_OUT_COLS)
