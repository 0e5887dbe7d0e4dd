"""Tiny Synthea-shaped all-string fixtures per FIXTURES.md — exercising the
CASE branches, invalid values (must null out), orphans, duplicates, and the
numeric/text VALUE mix."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

P1 = "11111111-1111-1111-1111-111111111111"
P2 = "22222222-2222-2222-2222-222222222222"
P3 = "33333333-3333-3333-3333-333333333333"  # dead patient
E1 = "aaaaaaaa-aaaa-aaaa-aaaa-aaaaaaaaaaaa"
E2 = "bbbbbbbb-bbbb-bbbb-bbbb-bbbbbbbbbbbb"
E3 = "cccccccc-cccc-cccc-cccc-cccccccccccc"
ORPHAN = "99999999-9999-9999-9999-999999999999"

PATIENT_COLS = [
    "Id", "BIRTHDATE", "DEATHDATE", "MARITAL", "RACE", "ETHNICITY", "GENDER",
    "HEALTHCARE_EXPENSES", "CITY", "STATE", "ZIP",
]
PATIENTS = [
    (P1, "1980-05-15", "", "M", "white", "nonhispanic", "M", "1234.50",
     "Boston", "Massachusetts", "02108"),
    (P2, "1999-12-31", "", "S", "black", "hispanic", "female", "20.00",
     "Salem", "Massachusetts", "01970"),
    (P3, "1950-01-01", "2020-06-30", "W", "martian", "other", "X",
     "not-a-number", "Boston", "Massachusetts", "02108"),  # shares P1's addr
]

ENCOUNTER_COLS = [
    "Id", "START", "STOP", "PATIENT", "ENCOUNTERCLASS", "CODE",
    "TOTAL_CLAIM_COST", "PAYER_COVERAGE", "PROVIDER", "ORGANIZATION",
]
_PR1 = "ffffffff-ffff-ffff-ffff-ffffffffffff"
_O1 = "dddddddd-dddd-dddd-dddd-dddddddddddd"
ENCOUNTERS = [
    (E1, "2015-03-01 10:00:00", "2015-03-01 11:00:00", P1, "ambulatory", "185349003", "100.00", "80.00", _PR1, _O1),
    (E2, "2016-07-04 08:30:00", "", P2, "inpatient", "32485007", "5000.00", "4500.00", "", _O1),
    (E2, "2016-07-04 08:30:00", "", P2, "inpatient", "32485007", "5000.00", "4500.00", "", _O1),  # dup id
    # empty PAYER_COVERAGE → NULL after typing: cost must PROPAGATE the
    # NULL (transform_cost.sql:38-41), not coalesce it to zero
    (E3, "2020-01-15 14:00:00", "2020-01-15 15:00:00", P3, "emergency", "50849002", "750.00", "", _PR1, ""),
]

CONDITION_COLS = ["START", "STOP", "PATIENT", "ENCOUNTER", "CODE", "DESCRIPTION"]
CONDITIONS = [
    ("2015-03-01", "2015-04-01", P1, E1, "44054006", "Diabetes"),
    ("2016-07-04", "", P2, E2, "38341003", "Hypertension"),
    ("2020-01-15", "", P3, "", "195662009", "Sore throat"),  # no encounter
    ("2020-02-01", "", ORPHAN, E3, "44054006", "orphan patient"),  # dropped
]

MEDICATION_COLS = [
    "START", "STOP", "PATIENT", "ENCOUNTER", "CODE", "TOTALCOST",
    "PAYER_COVERAGE", "DISPENSES",
]
MEDICATIONS = [
    ("2015-03-01 10:30:00", "2015-06-01 10:30:00", P1, E1, "860975", "300.00", "250.00", "3"),
    ("2016-07-04 09:00:00", "", P2, E2, "308136", "50.00", "45.00", ""),
]

PROCEDURE_COLS = ["DATE", "PATIENT", "ENCOUNTER", "CODE", "BASE_COST"]
PROCEDURES = [
    ("2015-03-01 10:45:00", P1, E1, "430193006", "125.00"),
    ("2020-01-15 14:30:00", P3, E3, "117015009", "88.00"),
]

OBSERVATION_COLS = [
    "DATE", "PATIENT", "ENCOUNTER", "CATEGORY", "CODE", "VALUE", "UNITS", "TYPE",
]
OBSERVATIONS = [
    ("2015-03-01 10:15:00", P1, E1, "vital-signs", "8302-2", "175.2", "cm", "numeric"),
    ("2015-03-01 10:15:00", P1, E1, "vital-signs", "8867-4", "72", "/min", "numeric"),
    ("2015-03-01 10:16:00", P1, E1, "laboratory", "2093-3", "1.2e2", "mg/dL", "numeric"),
    ("2016-07-04 09:30:00", P2, E2, "social-history", "72166-2", "Never smoker", "", "text"),
    ("2020-01-15 14:10:00", P3, E3, "vital-signs", "8310-5", "-0.5", "Cel", "numeric"),
]


def raw_tables(spark: SparkSession) -> dict[str, DataFrame]:
    return {
        "patients": spark.createDataFrame(PATIENTS, PATIENT_COLS),
        "encounters": spark.createDataFrame(ENCOUNTERS, ENCOUNTER_COLS),
        "conditions": spark.createDataFrame(CONDITIONS, CONDITION_COLS),
        "medications": spark.createDataFrame(MEDICATIONS, MEDICATION_COLS),
        "procedures": spark.createDataFrame(PROCEDURES, PROCEDURE_COLS),
        "observations": spark.createDataFrame(OBSERVATIONS, OBSERVATION_COLS),
    }


def raw_tables_full(spark: SparkSession) -> dict[str, DataFrame]:
    """The core six plus provider/organization/immunization/device/expense
    sources — the full wired-pipeline input surface."""
    out = raw_tables(spark)
    out["immunizations"] = spark.createDataFrame(
        IMMUNIZATIONS, IMMUNIZATION_COLS
    )
    out["organizations"] = spark.createDataFrame(
        ORGANIZATIONS, ORGANIZATION_COLS
    )
    out["providers"] = spark.createDataFrame(PROVIDERS, PROVIDER_COLS)
    out["devices"] = spark.createDataFrame(DEVICES, DEVICE_COLS)
    out["patient_expenses"] = spark.createDataFrame(
        PATIENT_EXPENSES, EXPENSE_COLS
    )
    return out

DEVICE_COLS = ["START", "STOP", "PATIENT", "ENCOUNTER", "CODE", "DESCRIPTION", "UDI"]
DEVICES = [
    ("2015-03-01 10:50:00", "", P1, E1, "337414009", "Blood glucose meter", "UDI-001"),
    ("2020-01-15 14:40:00", "2020-02-15 00:00:00", P3, E3, "705417005", "Catheter", "UDI-002"),
]

EXPENSE_COLS = ["PATIENT", "YEAR", "HEALTHCARE_EXPENSES", "INSURANCE_COSTS", "COVERED_COSTS"]
PATIENT_EXPENSES = [
    (P1, "2015", "1500.00", "1200.00", "1100.00"),
    (P1, "2016", "800.00", "1200.00", "700.00"),
    (P2, "2016", "5000.00", "2400.00", "4500.00"),
]

O1 = "dddddddd-dddd-dddd-dddd-dddddddddddd"
O2 = "eeeeeeee-eeee-eeee-eeee-eeeeeeeeeeee"
PR1 = "ffffffff-ffff-ffff-ffff-ffffffffffff"
PR2 = "abababab-abab-abab-abab-abababababab"

IMMUNIZATION_COLS = ["DATE", "PATIENT", "ENCOUNTER", "CODE", "DESCRIPTION", "BASE_COST"]
IMMUNIZATIONS = [
    ("2015-03-01 10:20:00", P1, E1, "140", "Influenza", "140.52"),
    ("2016-07-04 09:15:00", P2, E2, "08", "Hep B adolescent", "9.99"),
    ("2020-01-15 14:05:00", P3, E3, "999", "bogus CVX", "bad"),  # code+cost null out
    ("2020-02-01 00:00:00", ORPHAN, E1, "140", "orphan", "140.52"),  # dropped
]

ORGANIZATION_COLS = [
    "Id", "NAME", "CITY", "STATE", "ZIP", "LAT", "LON", "REVENUE",
    "UTILIZATION",
]
ORGANIZATIONS = [
    (O1, "General Hospital", "Boston", "Massachusetts", "02108", "42.36",
     "-71.06", "1000000.00", "250"),
    (O2, "Community Clinic", "Salem", "Massachusetts", "01970", "not-a-lat",
     "-70.9", "", "10"),
]

PROVIDER_COLS = [
    "Id", "ORGANIZATION", "NAME", "GENDER", "SPECIALITY", "ENCOUNTERS", "PROCEDURES",
]
PROVIDERS = [
    (PR1, O1, "Dr. Alpha", "F", "GENERAL PRACTICE", "120", "30"),
    (PR2, O2, "Dr. Beta", "X", "CARDIOLOGY", "80", "abc"),  # gender+procedures null
]
