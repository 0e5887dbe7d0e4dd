"""Typing specs for the Synthea raw layer and OMOP fixed concept ids.

The raw ingest layer is all-string (CSV, header-derived — SURVEY.md §1.2);
``TYPING_SPECS`` drives operators.typing.apply_typing to produce the typed
layer with cast-or-null semantics (reference: sql/synthea_typing/
synthea-typedtables-transformation.sql, 19 tables; the 8 below are the ones
the OMOP transforms consume).

Fixed concept ids from the reference's config/CASE expressions
(etl_pipeline/etl_patients.py:240-258; sql/etl/transform_visit_occurrence_v2
.sql:29-47; sql/etl/transform_cost.sql:35-36; FIXTURES.md §7).
"""

from __future__ import annotations

from synthea2omop_etl_spark.operators.typing import (
    TIMESTAMP_RE,
    UNSIGNED_NUMERIC_RE,
    UUID_RE,
)

# col -> (dtype, guard regex or None for the dtype default)
TYPING_SPECS: dict[str, dict[str, tuple[str, str | None]]] = {
    "patients": {
        "Id": ("string", None),  # UUID shape validated separately
        "BIRTHDATE": ("date", TIMESTAMP_RE),
        "DEATHDATE": ("date", TIMESTAMP_RE),
        "LAT": ("double", None),
        "LON": ("double", None),
        "HEALTHCARE_EXPENSES": ("double", UNSIGNED_NUMERIC_RE),
        "HEALTHCARE_COVERAGE": ("double", UNSIGNED_NUMERIC_RE),
        "INCOME": ("double", UNSIGNED_NUMERIC_RE),
    },
    "encounters": {
        "START": ("timestamp", TIMESTAMP_RE),
        "STOP": ("timestamp", TIMESTAMP_RE),
        "BASE_ENCOUNTER_COST": ("double", None),
        "TOTAL_CLAIM_COST": ("double", None),
        "PAYER_COVERAGE": ("double", None),
    },
    "conditions": {
        "START": ("date", TIMESTAMP_RE),
        "STOP": ("date", TIMESTAMP_RE),
    },
    "medications": {
        "START": ("timestamp", TIMESTAMP_RE),
        "STOP": ("timestamp", TIMESTAMP_RE),
        "BASE_COST": ("double", None),
        "PAYER_COVERAGE": ("double", None),
        "TOTALCOST": ("double", None),
        "DISPENSES": ("int", None),
    },
    "procedures": {
        "DATE": ("timestamp", TIMESTAMP_RE),
        "BASE_COST": ("double", None),
    },
    "observations": {
        "DATE": ("timestamp", TIMESTAMP_RE),
    },
    "devices": {
        "START": ("timestamp", TIMESTAMP_RE),
        "STOP": ("timestamp", TIMESTAMP_RE),
    },
    "patient_expenses": {
        "YEAR": ("int", None),
        "HEALTHCARE_EXPENSES": ("double", None),
        "INSURANCE_COSTS": ("double", None),
        "COVERED_COSTS": ("double", None),
    },
}

UUID_GUARD = UUID_RE

# --- fixed OMOP concept ids (FIXTURES.md §7) -------------------------------
GENDER_CONCEPTS = {"M": 8507, "F": 8532}
RACE_CONCEPTS = {
    "white": 8527,
    "black": 8516,
    "asian": 8515,
    "native": 8657,
    "hawaiian": 8522,
}
ETHNICITY_CONCEPTS = {"hispanic": 38003563, "nonhispanic": 38003564}
VISIT_CLASS_CONCEPTS = {
    "ambulatory": 9202,
    "outpatient": 9202,
    "wellness": 9202,
    "emergency": 9203,
    "urgentcare": 9203,
    "inpatient": 9201,
    "home": 581476,
    "virtual": 5083,
    "hospice": 42898160,
}
TYPE_EHR = 32817  # type_concept_id "EHR" for every domain row
COST_TYPE_CALCULATED = 5031
CURRENCY_USD = 44818668
NO_MATCHING_CONCEPT = 0
