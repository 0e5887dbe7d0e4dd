"""cost: three source domains → omop.cost (reference:
sql/etl/transform_cost.sql:7-179): one UNION of per-domain projections,
'Calculated' cost type, USD currency.

Reference column mapping (transform_cost.sql:37-41 visit, :97-101 drug,
:160-164 procedure): total_charge = the claim total (TOTAL_CLAIM_COST /
TOTALCOST / BASE_COST), total_cost = the base cost
(BASE_ENCOUNTER_COST / BASE_COST / BASE_COST), total_paid =
paid_by_payer = payer coverage, paid_by_patient = charge − coverage.
NULL coverage PROPAGATES (a visit/drug row with NULL payer_coverage
carries NULL total_paid/paid_by_payer and NULL paid_by_patient via the
subtraction), and rows whose cost fields are all NULL are dropped —
both exactly the reference's WHERE clauses (transform_cost.sql:60-61,
:119-120, :178-179). Procedures carry NO coverage data, so their
total_paid / paid_by_payer / paid_by_patient are NULL — exactly the
reference's NULLs, not zeros. A base-cost column absent from a partial
Synthea export yields NULL total_cost (the loader's optional-source
rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from synthea2omop_etl_spark.domains._common import with_row_ids
from synthea2omop_etl_spark.schemas import COST_TYPE_CALCULATED, CURRENCY_USD


def _domain_cost(
    df: DataFrame,
    event_id_col: str,
    domain_id: str,
    total_col: str,
    coverage_col: str | None,
    base_col: str | None = None,
) -> DataFrame:
    total = F.col(total_col).cast("double")
    null_d = F.lit(None).cast("double")
    # base cost column is optional per-export (the loader's
    # optional-source rule): absent → NULL total_cost
    raw_base = (
        F.col(base_col).cast("double")
        if base_col and base_col in df.columns
        else null_d
    )
    base = F.round(raw_base, 2)
    if coverage_col:
        # NULL coverage PROPAGATES (transform_cost.sql:38-41: total_paid
        # and paid_by_payer are the raw payer_coverage; paid_by_patient =
        # total_claim_cost - payer_coverage, NULL when coverage is NULL)
        cov = F.col(coverage_col).cast("double")
        paid_by_payer = F.round(cov, 2)
        total_paid = paid_by_payer  # transform_cost.sql:39-40
        paid_by_patient = F.round(total - cov, 2)
        # reference drops rows whose cost fields are ALL NULL
        # (transform_cost.sql:60-61, :119-120)
        keep = total.isNotNull() | raw_base.isNotNull() | cov.isNotNull()
    else:
        # procedures carry no coverage data → reference emits NULLs
        # (transform_cost.sql:162-164), not zeros — and keeps only rows
        # with a base cost (transform_cost.sql:178-179)
        paid_by_payer = total_paid = paid_by_patient = null_d
        keep = raw_base.isNotNull()
    return df.where(keep).select(
        F.col(event_id_col).alias("cost_event_id"),
        F.lit(domain_id).alias("cost_domain_id"),
        F.lit(COST_TYPE_CALCULATED).alias("cost_type_concept_id"),
        F.lit(CURRENCY_USD).alias("currency_concept_id"),
        F.round(total, 2).alias("total_charge"),
        base.alias("total_cost"),
        total_paid.alias("total_paid"),
        paid_by_payer.alias("paid_by_payer"),
        paid_by_patient.alias("paid_by_patient"),
    )


def cost(
    visit_occurrence: DataFrame | None,
    encounters_typed: DataFrame | None,
    drug_exposure: DataFrame | None,
    medications_typed: DataFrame | None,
    procedure_occurrence: DataFrame | None,
    procedures_typed: DataFrame | None,
    person_map: DataFrame | None = None,
) -> DataFrame:
    """Assemble omop.cost from the three costed domains.

    Each *_typed source is joined back to its OMOP table on source value +
    person linkage (the reference joins the same source columns,
    transform_cost.sql:31-61). Drug/procedure sources carry PATIENT uuids
    while the OMOP side carries person_id, so ``person_map`` translates —
    joining on source code ALONE would cross-multiply whenever two people
    share a code. A domain whose OMOP table or typed source is absent
    (partial Synthea export) simply contributes no rows — mirroring the
    per-domain INSERTs, which insert nothing when their source is empty.
    """

    def _person_linked(typed: DataFrame, code_alias: str, cols: list[str]):
        if person_map is None:
            raise ValueError(
                "person_map is required for drug/procedure cost linkage"
            )
        linked = typed.join(
            person_map.select("patient_uuid", "person_id"),
            typed["PATIENT"] == F.col("patient_uuid"),
            "inner",
        )
        return linked.select(
            F.col("CODE").alias(code_alias), "person_id", *cols
        ).dropDuplicates([code_alias, "person_id"])

    parts: list[DataFrame] = []
    if visit_occurrence is not None and encounters_typed is not None:
        enc_cols = ["TOTAL_CLAIM_COST", "PAYER_COVERAGE"] + (
            ["BASE_ENCOUNTER_COST"]
            if "BASE_ENCOUNTER_COST" in encounters_typed.columns
            else []
        )
        parts.append(
            _domain_cost(
                visit_occurrence.join(
                    # duplicate encounter ids are collapsed before the visit
                    # transform; the cost source must collapse identically or
                    # a duplicated source row would double-count the cost
                    encounters_typed.select(
                        F.col("Id").alias("visit_source_value"), *enc_cols
                    ).dropDuplicates(["visit_source_value"]),
                    "visit_source_value",
                ),
                "visit_occurrence_id",
                "Visit",
                "TOTAL_CLAIM_COST",
                "PAYER_COVERAGE",
                base_col="BASE_ENCOUNTER_COST",
            )
        )
    if drug_exposure is not None and medications_typed is not None:
        med_cols = ["TOTALCOST", "PAYER_COVERAGE"] + (
            ["BASE_COST"]
            if "BASE_COST" in medications_typed.columns
            else []
        )
        parts.append(
            _domain_cost(
                drug_exposure.join(
                    _person_linked(
                        medications_typed, "drug_source_value", med_cols
                    ),
                    ["drug_source_value", "person_id"],
                ),
                "drug_exposure_id",
                "Drug",
                "TOTALCOST",
                "PAYER_COVERAGE",
                base_col="BASE_COST",
            )
        )
    if procedure_occurrence is not None and procedures_typed is not None:
        parts.append(
            _domain_cost(
                procedure_occurrence.join(
                    _person_linked(
                        procedures_typed,
                        "procedure_source_value",
                        ["BASE_COST"],
                    ),
                    ["procedure_source_value", "person_id"],
                ),
                "procedure_occurrence_id",
                "Procedure",
                "BASE_COST",
                None,
                base_col="BASE_COST",
            )
        )
    if not parts:
        raise ValueError("cost needs at least one costed domain input")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return with_row_ids(out, "cost_id", ["cost_domain_id", "cost_event_id"]).select(
        "cost_id",
        "cost_event_id",
        "cost_domain_id",
        "cost_type_concept_id",
        "currency_concept_id",
        "total_charge",
        "total_cost",
        "total_paid",
        "paid_by_payer",
        "paid_by_patient",
    )
