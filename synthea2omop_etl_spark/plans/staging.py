"""Typed → staging projection layer, all 19 tables.

Reference: sql/etl/transfer_population_to_staging.sql:38-650 — a snake_case
rename/projection from the typed layer into ``staging.*_raw`` tables that
the set-based ETL SQL consumes. The reference runs it as 19 INSERT..SELECT
statements (batched with LIMIT/OFFSET loops for the big tables); in Spark
each projection is a single narrow ``select`` — no shuffle, no batching
loop (partitioned execution replaces OFFSET pagination, SURVEY.md S5-S7).

Specs are data-driven: ``staging_col -> (source_col, transform)`` with
``transform`` one of None (carry), "date" (truncate timestamp→date),
"year_date" (make_date(year,1,1)), "null" (the reference explicitly
transfers NULL — kept for parity, see patient_expenses :471-472).
Source columns are our typed layer's raw CSV names.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Spec = dict[str, tuple[str | None, str | None]]

STAGING_PROJECTIONS: dict[str, Spec] = {
    # :42-66
    "patients": {
        "id": ("Id", None),
        "birthdate": ("BIRTHDATE", "date"),
        "deathdate": ("DEATHDATE", "date"),
        "race": ("RACE", None),
        "ethnicity": ("ETHNICITY", None),
        "gender": ("GENDER", None),
        "first_name": ("FIRST", None),
        "last_name": ("LAST", None),
        "address": ("ADDRESS", None),
        "city": ("CITY", None),
        "state": ("STATE", None),
        "zip": ("ZIP", None),
        "county": ("COUNTY", None),
        "latitude": ("LAT", None),
        "longitude": ("LON", None),
        "income": ("INCOME", None),
        "healthcare_expenses": ("HEALTHCARE_EXPENSES", None),
        "healthcare_coverage": ("HEALTHCARE_COVERAGE", None),
    },
    # :74-94
    "encounters": {
        "id": ("Id", None),
        "patient_id": ("PATIENT", None),
        "start_timestamp": ("START", None),
        "stop_timestamp": ("STOP", None),
        "encounter_class": ("ENCOUNTERCLASS", None),
        "code": ("CODE", None),
        "description": ("DESCRIPTION", None),
        "base_encounter_cost": ("BASE_ENCOUNTER_COST", None),
        "total_claim_cost": ("TOTAL_CLAIM_COST", None),
        "payer_coverage": ("PAYER_COVERAGE", None),
        "reason_code": ("REASONCODE", None),
        "reason_description": ("REASONDESCRIPTION", None),
        "organization_id": ("ORGANIZATION", None),
        "provider_id": ("PROVIDER", None),
    },
    # :122-144
    "conditions": {
        "patient_id": ("PATIENT", None),
        "encounter_id": ("ENCOUNTER", None),
        "code": ("CODE", None),
        "system": ("SYSTEM", None),
        "description": ("DESCRIPTION", None),
        "start_date": ("START", "date"),
        "start_datetime": ("START", None),
        "stop_date": ("STOP", "date"),
        "stop_datetime": ("STOP", None),
    },
    # :179-199
    "medications": {
        "patient_id": ("PATIENT", None),
        "encounter_id": ("ENCOUNTER", None),
        "code": ("CODE", None),
        "description": ("DESCRIPTION", None),
        "start_timestamp": ("START", None),
        "stop_timestamp": ("STOP", None),
        "base_cost": ("BASE_COST", None),
        "payer_coverage": ("PAYER_COVERAGE", None),
        "dispenses": ("DISPENSES", None),
        "total_cost": ("TOTALCOST", None),
        "reason_code": ("REASONCODE", None),
        "reason_description": ("REASONDESCRIPTION", None),
    },
    # :238-253
    "procedures": {
        "patient_id": ("PATIENT", None),
        "encounter_id": ("ENCOUNTER", None),
        "code": ("CODE", None),
        "description": ("DESCRIPTION", None),
        "base_cost": ("BASE_COST", None),
        "timestamp": ("DATE", None),
        "reason_code": ("REASONCODE", None),
        "reason_description": ("REASONDESCRIPTION", None),
    },
    # :292-305
    "observations": {
        "patient_id": ("PATIENT", None),
        "encounter_id": ("ENCOUNTER", None),
        "observation_type": ("CATEGORY", None),
        "code": ("CODE", None),
        "description": ("DESCRIPTION", None),
        "value_as_string": ("VALUE", None),
        "timestamp": ("DATE", None),
    },
    # :325-346
    "allergies": {
        "patient_id": ("PATIENT", None),
        "encounter_id": ("ENCOUNTER", None),
        "code": ("CODE", None),
        "system": ("SYSTEM", None),
        "description": ("DESCRIPTION", None),
        "type": ("TYPE", None),
        "category": ("CATEGORY", None),
        "reaction1_code": ("REACTION1", None),
        "reaction1_desc": ("DESCRIPTION1", None),
        "severity1": ("SEVERITY1", None),
        "reaction2_code": ("REACTION2", None),
        "reaction2_desc": ("DESCRIPTION2", None),
        "severity2": ("SEVERITY2", None),
        "start_date": ("START", "date"),
        "stop_date": ("STOP", "date"),
    },
    # :354-369
    "careplans": {
        "id": ("Id", None),
        "patient_id": ("PATIENT", None),
        "encounter_id": ("ENCOUNTER", None),
        "start_date": ("START", "date"),
        "stop_date": ("STOP", "date"),
        "code": ("CODE", None),
        "description": ("DESCRIPTION", None),
        "reason_code": ("REASONCODE", None),
        "reason_description": ("REASONDESCRIPTION", None),
    },
    # :376-388
    "devices": {
        "patient_id": ("PATIENT", None),
        "encounter_id": ("ENCOUNTER", None),
        "code": ("CODE", None),
        "description": ("DESCRIPTION", None),
        "udi": ("UDI", None),
        "start_timestamp": ("START", None),
        "stop_timestamp": ("STOP", None),
    },
    # :397-417
    "imaging_studies": {
        "id": ("Id", None),
        "patient_id": ("PATIENT", None),
        "encounter_id": ("ENCOUNTER", None),
        "date": ("DATE", None),
        "series_uid": ("SERIES_UID", None),
        "body_site_code": ("BODYSITE_CODE", None),
        "body_site_description": ("BODYSITE_DESCRIPTION", None),
        "modality_code": ("MODALITY_CODE", None),
        "modality_description": ("MODALITY_DESCRIPTION", None),
        "sop_code": ("SOP_CODE", None),
        "sop_description": ("SOP_DESCRIPTION", None),
    },
    # :422-434
    "immunizations": {
        "patient_id": ("PATIENT", None),
        "encounter_id": ("ENCOUNTER", None),
        "code": ("CODE", None),
        "description": ("DESCRIPTION", None),
        "date": ("DATE", None),
        "base_cost": ("BASE_COST", None),
    },
    # :442-455
    "organizations": {
        "id": ("Id", None),
        "name": ("NAME", None),
        "address": ("ADDRESS", None),
        "city": ("CITY", None),
        "state": ("STATE", None),
        "zip": ("ZIP", None),
        "phone": ("PHONE", None),
        "revenue": ("REVENUE", None),
        "utilization": ("UTILIZATION", None),
    },
    # :463-473 — the reference transfers NULL for insurance/covered costs
    # even though the typed table has them; kept for parity.
    "patient_expenses": {
        "patient_id": ("PATIENT_ID", None),
        "year_date": ("YEAR", "year_date"),
        "payer_id": ("PAYER_ID", None),
        "healthcare_expenses": ("HEALTHCARE_EXPENSES", None),
        "insurance_costs": (None, "null"),
        "covered_costs": (None, "null"),
    },
    # :481-491
    "payer_transitions": {
        "patient_id": ("PATIENT", None),
        "member_id": ("MEMBERID", None),
        "start_date": ("START_DATE", None),
        "end_date": ("END_DATE", None),
        "payer_id": ("PAYER", None),
        "ownership": ("PLAN_OWNERSHIP", None),
    },
    # :499-524
    "payers": {
        "id": ("Id", None),
        "name": ("NAME", None),
        "address": ("ADDRESS", None),
        "city": ("CITY", None),
        "state_headquartered": ("STATE_HEADQUARTERED", None),
        "zip": ("ZIP", None),
        "phone": ("PHONE", None),
        "amount_covered": ("AMOUNT_COVERED", None),
        "amount_uncovered": ("AMOUNT_UNCOVERED", None),
        "revenue": ("REVENUE", None),
        "covered_encounters": ("COVERED_ENCOUNTERS", None),
        "uncovered_encounters": ("UNCOVERED_ENCOUNTERS", None),
        "covered_medications": ("COVERED_MEDICATIONS", None),
        "uncovered_medications": ("UNCOVERED_MEDICATIONS", None),
        "covered_procedures": ("COVERED_PROCEDURES", None),
        "uncovered_procedures": ("UNCOVERED_PROCEDURES", None),
        "covered_immunizations": ("COVERED_IMMUNIZATIONS", None),
        "uncovered_immunizations": ("UNCOVERED_IMMUNIZATIONS", None),
        "unique_customers": ("UNIQUE_CUSTOMERS", None),
        "qols_avg": ("QOLS_AVG", None),
        "member_months": ("MEMBER_MONTHS", None),
    },
    # :532-545
    "providers": {
        "id": ("Id", None),
        "organization_id": ("ORGANIZATION", None),
        "name": ("NAME", None),
        "gender": ("GENDER", None),
        "speciality": ("SPECIALITY", None),
        "address": ("ADDRESS", None),
        "city": ("CITY", None),
        "state": ("STATE", None),
        "zip": ("ZIP", None),
        "utilization": ("UTILIZATION", None),
    },
    # :554-566
    "supplies": {
        "patient_id": ("PATIENT", None),
        "encounter_id": ("ENCOUNTER", None),
        "code": ("CODE", None),
        "description": ("DESCRIPTION", None),
        "date": ("DATE", None),
        "quantity": ("QUANTITY", None),
    },
    # :573-591
    "claims": {
        "id": ("Id", None),
        "patient_id": ("PATIENTID", None),
        "provider_id": ("PROVIDERID", None),
        "payer_id": ("PRIMARYPATIENTINSURANCEID", None),
        "department_id": ("DEPARTMENTID", None),
        "diagnosis1": ("DIAGNOSIS1", None),
        "diagnosis2": ("DIAGNOSIS2", None),
        "status1": ("STATUS1", None),
        "status2": ("STATUS2", None),
        "outstanding1": ("OUTSTANDING1", None),
        "outstanding2": ("OUTSTANDING2", None),
        "service_date": ("SERVICEDATE", None),
    },
    # :619-637
    "claims_transactions": {
        "id": ("ID", None),
        "claim_id": ("CLAIMID", None),
        "patient_id": ("PATIENTID", None),
        "type": ("TYPE", None),
        "amount": ("AMOUNT", None),
        "payment_method": ("METHOD", None),
        "from_date": ("FROMDATE", None),
        "to_date": ("TODATE", None),
        "procedure_code": ("PROCEDURECODE", None),
        "diagnosis_ref1": ("DIAGNOSISREF1", None),
        "units": ("UNITS", None),
        "provider_id": ("PROVIDERID", None),
    },
}


def to_staging(typed: DataFrame, table: str) -> DataFrame:
    """Project a typed table into its staging shape. Source columns absent
    from the input produce NULL (a Synthea export may omit optional
    columns; the reference's INSERT would fail, which helps nobody)."""
    spec = STAGING_PROJECTIONS.get(table)
    if spec is None:
        raise ValueError(f"no staging projection for table: {table!r}")
    cols = []
    for out_name, (src, transform) in spec.items():
        if transform == "null":
            # Reference transfers NULL for these cost columns; carry the
            # reference's numeric type (a bare NullType column would be
            # rejected by the parquet writer).
            c = F.lit(None).cast("double")
        elif src is not None and src not in typed.columns:
            # Absent optional source column → typed NULL matching what the
            # transform would have produced, so the staging schema does not
            # depend on export completeness (and stays parquet-writable).
            null_type = "date" if transform in ("date", "year_date") else "string"
            c = F.lit(None).cast(null_type)
        elif transform == "date":
            c = F.to_date(F.col(src))
        elif transform == "year_date":
            c = F.make_date(F.col(src), F.lit(1), F.lit(1))
        else:
            c = F.col(src)
        cols.append(c.alias(out_name))
    return typed.select(*cols)


def stage_all(typed_tables: dict[str, DataFrame]) -> dict[str, DataFrame]:
    """Every present typed table → ``staging_<table>`` projection."""
    return {
        f"staging_{t}": to_staging(df, t)
        for t, df in typed_tables.items()
        if t in STAGING_PROJECTIONS
    }
