"""cost: three source domains → omop.cost (reference:
sql/etl/transform_cost.sql:7-179): one UNION of per-domain projections,
paid_by_patient = total_charge - paid_by_payer, 'Calculated' cost type,
USD currency.
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
) -> DataFrame:
    total = F.col(total_col).cast("double")
    paid_by_payer = (
        F.coalesce(F.col(coverage_col).cast("double"), F.lit(0.0))
        if coverage_col
        else F.lit(0.0)
    )
    return df.select(
        F.col(event_id_col).alias("cost_event_id"),
        F.lit(domain_id).alias("cost_domain_id"),
        F.lit(COST_TYPE_CALCULATED).alias("cost_type_concept_id"),
        F.lit(CURRENCY_USD).alias("currency_concept_id"),
        F.round(total, 2).alias("total_charge"),
        F.round(paid_by_payer, 2).alias("paid_by_payer"),
        F.round(total - paid_by_payer, 2).alias("paid_by_patient"),
    )


def cost(
    visit_occurrence: DataFrame,
    encounters_typed: DataFrame,
    drug_exposure: DataFrame,
    medications_typed: DataFrame,
    procedure_occurrence: DataFrame,
    procedures_typed: DataFrame,
) -> DataFrame:
    """Assemble omop.cost from the three costed domains.

    Each *_typed source is joined back to its OMOP table on source value +
    person linkage already embedded in the OMOP ids (the reference joins on
    the same source columns, transform_cost.sql:31-61).
    """
    visit_costs = _domain_cost(
        visit_occurrence.join(
            # duplicate encounter ids are collapsed before the visit
            # transform; the cost source must collapse identically or a
            # duplicated source row would double-count the visit's cost
            encounters_typed.select(
                F.col("Id").alias("visit_source_value"),
                "TOTAL_CLAIM_COST",
                "PAYER_COVERAGE",
            ).dropDuplicates(["visit_source_value"]),
            "visit_source_value",
        ),
        "visit_occurrence_id",
        "Visit",
        "TOTAL_CLAIM_COST",
        "PAYER_COVERAGE",
    )
    drug_costs = _domain_cost(
        drug_exposure.join(
            medications_typed.select(
                F.col("CODE").alias("drug_source_value"),
                F.col("PATIENT"),
                "TOTALCOST",
                "PAYER_COVERAGE",
            ).dropDuplicates(["drug_source_value", "PATIENT"]),
            "drug_source_value",
        ),
        "drug_exposure_id",
        "Drug",
        "TOTALCOST",
        "PAYER_COVERAGE",
    )
    proc_costs = _domain_cost(
        procedure_occurrence.join(
            procedures_typed.select(
                F.col("CODE").alias("procedure_source_value"),
                F.col("PATIENT"),
                "BASE_COST",
            ).dropDuplicates(["procedure_source_value", "PATIENT"]),
            "procedure_source_value",
        ),
        "procedure_occurrence_id",
        "Procedure",
        "BASE_COST",
        None,
    )
    out = visit_costs.unionByName(drug_costs).unionByName(proc_costs)
    return with_row_ids(out, "cost_id", ["cost_domain_id", "cost_event_id"]).select(
        "cost_id",
        "cost_event_id",
        "cost_domain_id",
        "cost_type_concept_id",
        "currency_concept_id",
        "total_charge",
        "paid_by_payer",
        "paid_by_patient",
    )
