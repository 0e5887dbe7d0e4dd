"""Post-ETL validation suite — the reference's 5 weighted checks
(etl_pipeline/etl_validation.py:54-537) as DataFrame assertions.

Checks: (1) record counts non-zero; (2) referential integrity (FK orphans
via left-join-is-null); (3) date ranges (end ≥ start, no future dates);
(4) demographics (valid gender concepts, plausible birth years);
(5) concept-mapping completeness (>20% unmapped ⇒ FAIL).

Each check returns (name, passed, weight, details); ``validate`` aggregates
a weighted score and a JSON-able report, like the reference's report writer
(etl_validation.py:499-537).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Check = tuple[str, bool, float, dict[str, Any]]


def check_record_counts(tables: dict[str, DataFrame]) -> Check:
    counts = {name: df.count() for name, df in tables.items()}
    empty = [n for n, c in counts.items() if c == 0]
    return ("record_counts", not empty, 0.2, {"counts": counts, "empty": empty})


def check_referential_integrity(
    facts: dict[str, tuple[DataFrame, str]],
    dim: DataFrame,
    id_col: str = "person_id",
    name: str = "referential_integrity",
    weight: float = 0.3,
) -> Check:
    """facts: {table: (df, fk_col)}; orphans = non-NULL FK not in ``dim``.

    NULL FKs are not orphans — left-joined links (visit without an
    encounter, visit without a provider) legitimately carry NULL.
    """
    orphans = {}
    dim_ids = dim.select(id_col)
    for fact_name, (df, fk) in facts.items():
        n = (
            df.where(F.col(fk).isNotNull())
            .join(dim_ids, df[fk] == dim_ids[id_col], "left_anti")
            .count()
        )
        orphans[fact_name] = n
    ok = all(v == 0 for v in orphans.values())
    return (name, ok, weight, {"orphans": orphans})


def check_date_ranges(
    ranged: dict[str, tuple[DataFrame, str, str]]
) -> Check:
    """ranged: {table: (df, start_col, end_col)} — end ≥ start, no future."""
    bad = {}
    for name, (df, start, end) in ranged.items():
        n_reversed = df.where(F.col(end) < F.col(start)).count()
        n_future = df.where(F.col(start) > F.current_date()).count()
        bad[name] = {"end_before_start": n_reversed, "future": n_future}
    ok = all(v["end_before_start"] == 0 and v["future"] == 0 for v in bad.values())
    return ("date_ranges", ok, 0.2, bad)


def check_demographics(person: DataFrame) -> Check:
    n = person.count()
    bad_gender = person.where(
        ~F.col("gender_concept_id").isin(8507, 8532)
    ).count()
    bad_birth = person.where(
        (F.col("year_of_birth") < 1900)
        | (F.col("year_of_birth") > F.year(F.current_date()))
    ).count()
    ok = n > 0 and bad_gender == 0 and bad_birth == 0
    return (
        "demographics",
        ok,
        0.15,
        {"persons": n, "invalid_gender": bad_gender, "invalid_birth_year": bad_birth},
    )


def check_mapping_completeness(
    mapped: dict[str, tuple[DataFrame, str]], threshold: float = 0.2
) -> Check:
    """mapped: {table: (df, concept_id_col)} — fraction of concept_id==0."""
    stats = {}
    for name, (df, col) in mapped.items():
        agg = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col(col) == 0, 1).otherwise(0)).alias("unmapped"),
        ).collect()[0]
        frac = (agg.unmapped or 0) / agg.n if agg.n else 0.0
        stats[name] = {"rows": agg.n, "unmapped": agg.unmapped, "fraction": round(frac, 4)}
    ok = all(v["fraction"] <= threshold for v in stats.values())
    return ("mapping_completeness", ok, 0.15, stats)


def dqd_results(checks: list[Check], spark=None) -> DataFrame:
    """Render validation checks in the reference's
    ``dataqualitydashboard_results`` shape (issue_id, issue_description,
    prevalence, record_count, failed — query_achilles_results.sh:236-239),
    so a dashboard built against the reference reads this table unchanged.

    prevalence: the failing fraction where a check reports one (mapping
    completeness), else 0/1 by pass state; record_count: the failing row
    count the check counted, where available.
    """
    import json as _json

    rows = []
    for issue_id, (name, ok, _w, details) in enumerate(checks, start=1):
        record_count = 0
        prevalence = 0.0 if ok else 1.0
        if name == "referential_integrity":
            record_count = sum(details.get("orphans", {}).values())
        elif name == "date_ranges":
            record_count = sum(
                v["end_before_start"] + v["future"] for v in details.values()
            )
        elif name == "demographics":
            record_count = details.get("invalid_gender", 0) + details.get(
                "invalid_birth_year", 0
            )
        elif name == "mapping_completeness":
            record_count = sum(
                v.get("unmapped") or 0 for v in details.values()
            )
            fracs = [v["fraction"] for v in details.values()]
            prevalence = round(max(fracs), 4) if fracs else 0.0
        rows.append(
            (
                issue_id,
                f"{name}: {_json.dumps(details, default=str)[:200]}",
                float(prevalence),
                int(record_count),
                not ok,
            )
        )
    if spark is None:
        from synthea2omop_etl_spark.session import get_spark

        spark = get_spark()
    return spark.createDataFrame(rows, DQD_SCHEMA)


#: fact table → per-field DQD spec: primary key, required (non-NULL)
#: fields, and the temporal pair. Drives ≥3 check families per table —
#: Completeness (measureValueCompleteness), Conformance (isPrimaryKey,
#: isForeignKey person_id), Plausibility (plausibleTemporalAfter,
#: plausibleAfterBirth) — the core taxonomy of the reference's
#: DataQualityDashboard results table.
DQD_SPECS: dict[str, dict[str, Any]] = {
    "visit_occurrence": {
        "pk": "visit_occurrence_id",
        "required": ["person_id", "visit_concept_id", "visit_start_date"],
        "start": "visit_start_date",
        "end": "visit_end_date",
    },
    "condition_occurrence": {
        "pk": "condition_occurrence_id",
        "required": ["person_id", "condition_concept_id",
                     "condition_start_date"],
        "start": "condition_start_date",
        "end": "condition_end_date",
    },
    "drug_exposure": {
        "pk": "drug_exposure_id",
        "required": ["person_id", "drug_concept_id",
                     "drug_exposure_start_date"],
        "start": "drug_exposure_start_date",
        "end": "drug_exposure_end_date",
        # DQD plausibleValueLow/High for the dosing fields (NULL-safe:
        # immunization rows carry NULL days_supply by construction)
        "values": {"days_supply": (0.0, 365.0), "refills": (0.0, 24.0)},
    },
    "procedure_occurrence": {
        "pk": "procedure_occurrence_id",
        "required": ["person_id", "procedure_concept_id", "procedure_date"],
        "start": "procedure_date",
        "end": None,
    },
    "measurement": {
        "pk": "measurement_id",
        "required": ["person_id", "measurement_date"],
        "start": "measurement_date",
        "end": None,
        # global sanity range; concept-appropriate ranges come from the
        # measurement_ranges= argument (plausibleValueLow/High per concept)
        "values": {"value_as_number": (-1000.0, 100000.0)},
    },
    "observation": {
        "pk": "observation_id",
        "required": ["person_id", "observation_date"],
        "start": "observation_date",
        "end": None,
        "values": {"value_as_number": (-1000.0, 100000.0)},
    },
    "device_exposure": {
        "pk": "device_exposure_id",
        "required": ["person_id", "device_exposure_start_date"],
        "start": "device_exposure_start_date",
        "end": None,  # open-ended device exposures carry NULL end
    },
}

DQD_SCHEMA = (
    "issue_id int, issue_description string, prevalence double, "
    "record_count bigint, failed boolean"
)

#: run_dqd_checks output: the OHDSI DataQualityDashboard results columns
#: (check_name / check_level / category — what a DQD user queries by,
#: e.g. WHERE check_name = 'isPrimaryKey' AND failed) FOLLOWED BY the
#: reference's legacy dataqualitydashboard_results columns, so both the
#: DQD-style queries and query_achilles_results.sh:233-238's
#: issue_id/issue_description/prevalence/record_count/failed query read
#: this one table unchanged.
DQD_FULL_SCHEMA = (
    "issue_id int, check_name string, check_level string, "
    "category string, cdm_table_name string, cdm_field_name string, "
    "num_violated_rows bigint, pct_violated_rows double, "
    "num_denominator_rows bigint, threshold double, "
    "issue_description string, prevalence double, "
    "record_count bigint, failed boolean"
)


#: default concept-appropriate plausibility ranges for the measurement
#: value check, keyed on measurement_source_value (LOINC). The DQD ships
#: per-concept thresholds (plausibleValueLow/High); these cover the vitals
#: Synthea emits most — callers override/extend via measurement_ranges=.
MEASUREMENT_RANGES: dict[str, tuple[float, float]] = {
    "8302-2": (30.0, 250.0),    # body height, cm
    "29463-7": (0.5, 500.0),    # body weight, kg
    "8867-4": (10.0, 300.0),    # heart rate, /min
    "8480-6": (40.0, 300.0),    # systolic BP, mmHg
    "8462-4": (20.0, 200.0),    # diastolic BP, mmHg
    "2093-3": (50.0, 1000.0),   # total cholesterol, mg/dL
    "8310-5": (25.0, 45.0),     # body temperature, Cel
}


def run_dqd_checks(
    tables: dict[str, DataFrame], person: DataFrame, spark,
    measurement_ranges: dict[str, tuple[float, float]] | None = None,
) -> DataFrame:
    """Per-table/per-field DQD check rows over the OMOP layer, in the
    OHDSI DataQualityDashboard results shape (``DQD_FULL_SCHEMA``):
    check_name / check_level (TABLE|FIELD|CONCEPT) / category /
    cdm_table_name / cdm_field_name / num_violated_rows /
    pct_violated_rows / num_denominator_rows / threshold / failed — what
    a DQD user queries by (``WHERE check_name = 'isPrimaryKey' AND
    failed``) — plus the reference's legacy
    issue_id/issue_description/prevalence/record_count/failed columns, so
    the reference dashboard's data-quality query also reads it unchanged
    (query_achilles_results.sh:233-238).

    Check families per fact table: Completeness
    (measureValueCompleteness FIELD; measurePersonCompleteness TABLE,
    with the DQD's lenient threshold since most persons legitimately lack
    records in any one domain), Conformance (isPrimaryKey, isForeignKey
    person_id), Plausibility (plausibleTemporalAfter, plausibleAfterBirth,
    and plausibleValueLow/High over each spec'd numeric field plus the
    concept-appropriate measurement ranges at CONCEPT level). Person gets
    its own plausibility block (year_of_birth bounds — the DQD's
    plausibleValueLow/High field check on the demographic table).

    Execution shape (holds at 100 TB): ONE aggregate job per table batches
    every null-count / reversed-date / pk-distinct / out-of-range measure
    as conditional sums (single pass, map-side combinable), plus one
    anti-join for FK orphans and one broadcast-join pass for the birth
    plausibility check — three jobs per table regardless of how many
    fields are checked.
    """
    birth = person.select(
        "person_id", F.to_date("birth_datetime").alias("__bd")
    )
    person_ids = person.select("person_id")
    rows: list[tuple] = []
    issue_id = 1000  # separate id range from the 5-check weighted suite

    def emit(
        desc: str,
        violated: int,
        denom: int,
        *,
        check_name: str,
        level: str,
        table: str,
        field: str | None,
        category: str,
        threshold: float = 0.0,
    ) -> None:
        nonlocal issue_id
        # failed compares the UNROUNDED ratio: with the OHDSI-default
        # threshold of 0.0, any violation fails the check — rounding to 4dp
        # would mask rates below 0.00005 (e.g. 4 dup PKs in 100k rows).
        # The rounded prevalence is kept for the display columns only.
        prevalence = round(violated / denom, 4) if denom else 0.0
        failed = (violated > threshold * denom) if denom else False
        rows.append(
            (
                issue_id,
                check_name,
                level,
                category,
                table,
                field,
                int(violated),
                float(prevalence),
                int(denom),
                float(threshold),
                desc,
                float(prevalence),
                int(violated),
                failed,
            )
        )
        issue_id += 1

    def out_of_range(col: str, lo: float, hi: float):
        # NULL-safe: a NULL value is a Completeness finding, not an
        # implausible one
        return F.sum(
            F.when(
                F.col(col).isNotNull()
                & ~F.col(col).cast("double").between(lo, hi),
                1,
            ).otherwise(0)
        )

    # person-level plausibility: year_of_birth within [1850, current year]
    pstat = person.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(
            F.when(
                F.col("year_of_birth").isNotNull()
                & ~F.col("year_of_birth").between(
                    F.lit(1850), F.year(F.current_date())
                ),
                1,
            ).otherwise(0)
        ).alias("__yob"),
    ).collect()[0]
    emit(
        "person.year_of_birth plausibleValueLowHigh [Plausibility]",
        pstat["__yob"],
        pstat["__n"],
        check_name="plausibleValueLowHigh",
        level="FIELD",
        table="person",
        field="year_of_birth",
        category="Plausibility",
    )

    for name, spec in DQD_SPECS.items():
        df = tables.get(name)
        if df is None:
            continue
        value_checks: list[tuple[str, str, float, float]] = [
            (c, f"__rng_{c}", lo, hi)
            for c, (lo, hi) in spec.get("values", {}).items()
            if c in df.columns
        ]
        if name == "measurement" and {
            "measurement_source_value", "value_as_number"
        } <= set(df.columns):
            for code, (lo, hi) in (
                measurement_ranges
                if measurement_ranges is not None
                else MEASUREMENT_RANGES
            ).items():
                value_checks.append(
                    (code, f"__rng_c_{code}", lo, hi)
                )
        aggs = [
            F.count(F.lit(1)).alias("__n"),
            F.countDistinct(spec["pk"]).alias("__pk_distinct"),
        ]
        for c in spec["required"]:
            aggs.append(
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(
                    f"__null_{c}"
                )
            )
        for c, alias, lo, hi in value_checks:
            if alias.startswith("__rng_c_"):
                # concept-scoped: violations among rows OF that concept
                aggs.append(
                    F.sum(
                        F.when(
                            (F.col("measurement_source_value") == c)
                            & F.col("value_as_number").isNotNull()
                            & ~F.col("value_as_number").between(lo, hi),
                            1,
                        ).otherwise(0)
                    ).alias(alias)
                )
            else:
                aggs.append(out_of_range(c, lo, hi).alias(alias))
        if spec["end"]:
            aggs.append(
                F.sum(
                    F.when(
                        F.col(spec["end"]) < F.col(spec["start"]), 1
                    ).otherwise(0)
                ).alias("__rev")
            )
        stat = df.agg(*aggs).collect()[0]
        n = stat["__n"]
        for c in spec["required"]:
            emit(
                f"{name}.{c} measureValueCompleteness [Completeness]",
                stat[f"__null_{c}"],
                n,
                check_name="measureValueCompleteness",
                level="FIELD",
                table=name,
                field=c,
                category="Completeness",
            )
        emit(
            f"{name}.{spec['pk']} isPrimaryKey [Conformance]",
            n - stat["__pk_distinct"],
            n,
            check_name="isPrimaryKey",
            level="FIELD",
            table=name,
            field=spec["pk"],
            category="Conformance",
        )
        for c, alias, lo, hi in value_checks:
            concept_scoped = alias.startswith("__rng_c_")
            label = (
                f"{name}.value_as_number ({c}) plausibleValueLowHigh "
                f"[{lo},{hi}] [Plausibility]"
                if concept_scoped
                else f"{name}.{c} plausibleValueLowHigh [{lo},{hi}] "
                "[Plausibility]"
            )
            emit(
                label,
                stat[alias],
                n,
                check_name="plausibleValueLowHigh",
                level="CONCEPT" if concept_scoped else "FIELD",
                table=name,
                field="value_as_number" if concept_scoped else c,
                category="Plausibility",
            )
        orphans = (
            df.where(F.col("person_id").isNotNull())
            .join(person_ids, "person_id", "left_anti")
            .count()
        )
        emit(
            f"{name}.person_id isForeignKey [Conformance]",
            orphans,
            n,
            check_name="isForeignKey",
            level="FIELD",
            table=name,
            field="person_id",
            category="Conformance",
        )
        if spec["end"]:
            emit(
                f"{name}.{spec['end']} plausibleTemporalAfter "
                f"{spec['start']} [Plausibility]",
                stat["__rev"],
                n,
                check_name="plausibleTemporalAfter",
                level="FIELD",
                table=name,
                field=spec["end"],
                category="Plausibility",
            )
        before_birth = (
            df.join(F.broadcast(birth), "person_id")
            .where(F.col(spec["start"]) < F.col("__bd"))
            .count()
        )
        emit(
            f"{name}.{spec['start']} plausibleAfterBirth [Plausibility]",
            before_birth,
            n,
            check_name="plausibleAfterBirth",
            level="FIELD",
            table=name,
            field=spec["start"],
            category="Plausibility",
        )
        # TABLE-level family: persons with no record in this fact table
        # (DQD measurePersonCompleteness). Informational at low rates —
        # most persons legitimately lack e.g. device exposures — so the
        # DQD-style threshold makes it fail only when >95% of persons are
        # absent (the table is effectively empty relative to the cohort).
        n_person = pstat["__n"]
        absent = (
            person_ids.join(
                df.select("person_id").distinct(), "person_id", "left_anti"
            ).count()
        )
        emit(
            f"{name}.person_id measurePersonCompleteness [Completeness]",
            absent,
            n_person,
            check_name="measurePersonCompleteness",
            level="TABLE",
            table=name,
            field=None,
            category="Completeness",
            threshold=0.95,
        )
    return spark.createDataFrame(rows, DQD_FULL_SCHEMA)


def validate(checks: list[Check]) -> dict[str, Any]:
    score = sum(w for _, ok, w, _ in checks if ok)
    total = sum(w for _, _, w, _ in checks)
    return {
        "passed": all(ok for _, ok, _, _ in checks),
        "score": round(score / total, 4) if total else 1.0,
        "checks": {
            name: {"passed": ok, "weight": w, "details": d}
            for name, ok, w, d in checks
        },
    }
