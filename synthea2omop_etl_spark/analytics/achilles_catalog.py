"""Achilles default-analysis catalog: the result tables a reference user
gets from `run_achilles.sh` (OHDSI Achilles, defaultAnalysesOnly=true) and
queries through `query_achilles_results.sh`.

Produces the two standard result shapes:

- ``achilles_results``       (analysis_id, stratum_1, stratum_2, count_value)
  — the count analyses the reference's query script reads (analysis_id
  1, 2, 4, 101, 200, 400, 600, 700, 800, … — query_achilles_results.sh:
  150-216);
- ``achilles_results_dist``  (analysis_id, count_value, min_value,
  p10_value, p25_value, median_value, p75_value, p90_value, max_value,
  avg_value) — the distribution analyses (e.g. 211 visit length,
  query_achilles_results.sh:228-230; 105 observation length; x03
  records-per-person).

Everything is data-driven over the OMOP DataFrames: each count analysis
is one groupBy (map-side combinable), each distribution one
count-per-entity + percentile aggregate. The unions are unions of tiny
aggregate results — at 100 TB each analysis is an independent
single-shuffle job over its domain table and the union is driver-side
plan glue, not a data movement.

``mode="approx"`` swaps exact percentiles for the Greenwald-Khanna sketch
in every distribution analysis (the 100 TB path).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from synthea2omop_etl_spark.functions import age_in_years
from synthea2omop_etl_spark.operators.timeseries import _floor_round

#: analysis_id → human name (subset of the Achilles default catalog the
#: reference's query script consumes, plus the standard per-domain trio).
ANALYSIS_NAMES: dict[int, str] = {
    0: "Source name",
    1: "Number of persons",
    2: "Number of persons by gender",
    3: "Number of persons by year of birth",
    4: "Number of persons by race",
    5: "Number of persons by ethnicity",
    101: "Number of persons by age decile at first observation",
    102: "Number of persons by gender by age decile at first observation",
    108: "Number of persons by length of first observation period, "
         "in 30d increments",
    109: "Number of persons with continuous observation in each year",
    110: "Number of persons with continuous observation in each month",
    111: "Number of observation periods by start month",
    112: "Number of persons by observation period end month",
    116: "Persons with at least one day of observation in each year, "
         "by decade of birth",
    114: "Number of persons with observation period before year of birth",
    115: "Number of persons with observation period end < start",
    117: "Persons with at least one day of observation in each month",
    119: "Number of observation period records, by period type concept",
    207: "Number of visit records with invalid person_id",
    209: "Number of visit records with end date < start date",
    407: "Number of condition records with invalid person_id",
    409: "Number of condition records with end date < start date",
    607: "Number of procedure records with invalid person_id",
    707: "Number of drug exposure records with invalid person_id",
    709: "Number of drug exposure records with end date < start date",
    807: "Number of observation records with invalid person_id",
    1807: "Number of measurement records with invalid person_id",
    2107: "Number of device exposure records with invalid person_id",
    2109: "Number of device exposure records with end date < start date",
    2000: "Number of persons with at least 1 condition and 1 drug exposure",
    2001: "Number of persons with at least 1 condition and 1 procedure",
    2002: "Number of persons with at least 1 measurement, 1 condition "
          "and 1 drug exposure",
    200: "Persons with at least one visit, by visit concept",
    300: "Number of providers",
    301: "Number of providers, by specialty",
    302: "Number of visit records, by provider specialty",
    201: "Number of visit records, by visit concept",
    202: "Number of visit records, by month",
    400: "Persons with at least one condition, by condition concept",
    401: "Number of condition records, by condition concept",
    402: "Number of condition records, by month",
    405: "Number of condition records, by condition type concept",
    605: "Number of procedure records, by procedure type concept",
    705: "Number of drug exposure records, by drug type concept",
    805: "Number of observation records, by observation type concept",
    1805: "Number of measurement records, by measurement type concept",
    205: "Number of visit records, by visit type concept",
    500: "Number of persons with death",
    501: "Number of death records, by month",
    505: "Number of death records, by death type concept",
    1200: "Number of persons by place of service",
    1201: "Number of visit records by place of service",
    1302: "Number of payer plan period records, by start month",
    1804: "Measurement records by concept and gender",
    1814: "Number of measurement records with no numeric value",
    2004: "Number of persons by domain-presence mask "
          "(visit/condition/drug/procedure/measurement)",
    2104: "Device exposure records by concept and gender",
    920: "Number of drug era records, by start month",
    1020: "Number of condition era records, by start month",
    902: "Number of persons with a drug era, by era start month",
    1002: "Number of persons with a condition era, by era start month",
    600: "Persons with at least one procedure, by procedure concept",
    601: "Number of procedure records, by procedure concept",
    602: "Number of procedure records, by month",
    700: "Persons with at least one drug exposure, by drug concept",
    701: "Number of drug exposure records, by drug concept",
    702: "Number of drug exposure records, by month",
    800: "Persons with at least one observation, by observation concept",
    801: "Number of observation records, by observation concept",
    802: "Number of observation records, by month",
    204: "Visit records by concept and gender",
    404: "Condition records by concept and gender",
    604: "Procedure records by concept and gender",
    704: "Drug exposure records by concept and gender",
    804: "Observation records by concept and gender",
    900: "Persons with at least one drug era, by drug concept",
    901: "Number of drug eras, by drug concept",
    1000: "Persons with at least one condition era, by condition concept",
    1001: "Number of condition eras, by condition concept",
    1100: "Number of persons by location 3-digit zip",
    1101: "Number of persons by location state",
    1102: "Number of care sites by location 3-digit zip",
    1103: "Number of care sites by location state",
    1300: "Number of persons with at least one payer plan period",
    1301: "Number of payer plan period records",
    1500: "Number of cost records",
    1501: "Number of cost records, by cost domain",
    1900: "Temporal record density: records by CDM table by month",
    2100: "Persons with at least one device exposure, by device",
    2101: "Number of device exposure records, by device",
    2102: "Number of device exposure records, by month",
    2105: "Number of device exposure records, by device type concept",
    1801: "Number of measurement records, by measurement concept",
    1802: "Number of measurement records, by month",
    # distribution analyses (achilles_results_dist)
    103: "Age at first observation period distribution",
    104: "Age at first observation period distribution, by gender",
    105: "Length of observation period (days) distribution",
    106: "Length of observation period (days) distribution, by gender",
    107: "Length of observation period (days) distribution, by age decile "
         "at first observation",
    113: "Observation periods per person distribution",
    203: "Visit records per person distribution",
    206: "Age at first visit distribution, by visit concept",
    211: "Visit duration (days) distribution",
    403: "Condition records per person distribution",
    406: "Age at first condition distribution, by condition concept",
    506: "Age at death distribution, by gender",
    511: "Days from last condition to death distribution",
    512: "Days from last drug exposure to death distribution",
    513: "Days from last visit to death distribution",
    514: "Days from last procedure to death distribution",
    515: "Days from last observation to death distribution",
    716: "Refills distribution",
    717: "Quantity distribution",
    1504: "Paid-by-payer distribution, by cost domain",
    1505: "Total-paid distribution, by cost domain",
    2106: "Age at first device exposure distribution, by device",
    603: "Procedure records per person distribution",
    606: "Age at first procedure distribution, by procedure concept",
    703: "Drug exposure records per person distribution",
    706: "Age at first drug exposure distribution, by drug concept",
    715: "Days supply distribution",
    803: "Observation records per person distribution",
    806: "Age at first observation record distribution, by observation",
    906: "Age at first drug era distribution, by drug concept",
    907: "Drug era length (days) distribution",
    1006: "Age at first condition era distribution, by condition concept",
    1007: "Condition era length (days) distribution",
    1303: "Payer plan periods per person distribution",
    1306: "Payer plan period length (days) distribution",
    1502: "Total charge distribution, by cost domain",
    1503: "Paid-by-patient distribution, by cost domain",
    1803: "Measurement records per person distribution",
    1806: "Age at first measurement distribution, by measurement",
    1815: "Measurement numeric value distribution, by measurement concept",
    2103: "Device exposure records per person distribution",
    # ---- round-9 default-set completion: the x10 (outside a valid
    # observation period) and x13 (invalid visit FK) DQ sub-series each
    # Achilles family repeats, plus the residual measurement-domain
    # defaults 1808-1825. Analyses whose required column is absent from
    # this CDM (ranges, measurement provider) are REGISTERED but emit
    # nothing — exactly what stock Achilles produces on such data.
    210: "Number of visit records outside a valid observation period",
    410: "Number of condition records outside a valid observation period",
    610: "Number of procedure records outside a valid observation period",
    710: "Number of drug exposure records outside a valid observation "
         "period",
    810: "Number of observation records outside a valid observation "
         "period",
    1810: "Number of measurement records outside a valid observation "
          "period",
    2110: "Number of device exposure records outside a valid observation "
          "period",
    213: "Number of visit records with invalid care_site_id",
    413: "Number of condition records with invalid visit_occurrence_id",
    613: "Number of procedure records with invalid visit_occurrence_id",
    713: "Number of drug exposure records with invalid "
         "visit_occurrence_id",
    813: "Number of observation records with invalid visit_occurrence_id",
    1813: "Number of measurement records with invalid "
          "visit_occurrence_id",
    1808: "Number of measurement records, by measurement concept by unit",
    1809: "Number of measurement records with invalid person_id "
          "(stock OHDSI id; 1807 is this catalog's legacy id for the "
          "same check)",
    1811: "Number of measurement records dated after the person's death",
    1812: "Number of measurement records with invalid provider_id "
          "(this CDM carries no measurement provider column → emits "
          "nothing)",
    1816: "Distribution of low range, by measurement concept (requires "
          "range_low; absent from Synthea-derived CDM → emits nothing)",
    1817: "Distribution of high range, by measurement concept (requires "
          "range_high; absent → emits nothing)",
    1818: "Number of measurement records below/within/above normal "
          "range (requires both ranges; absent → emits nothing)",
    1819: "Number of measurement records with a non-null unit",
    1820: "Number of measurement records by calendar year",
    1821: "Number of measurement records with no value (numeric or "
          "string)",
    1822: "Number of measurement records by concept-mapping status",
    1823: "Measurements per person per year distribution",
    1824: "Measurement numeric value distribution (global)",
    1825: "Number of measurement records, by unit",
    # ---- round-10 stock-default-set completion (see
    # analytics/achilles_default_ids.py for the pinned enumeration):
    # person FK validity (7/8/9), the death 500s stragglers
    # (502/504/509/510), the era DQ/dist residue (903/908/909/910 and
    # their condition-era twins), and the remaining applicable cost
    # column (1506). Ids whose required column is absent from this CDM
    # are REGISTERED but emit nothing — stock Achilles behavior.
    7: "Number of persons with invalid provider_id (this CDM's person "
       "table carries no provider_id column → emits nothing)",
    8: "Number of persons with invalid location_id",
    9: "Number of persons with invalid care_site_id (no care_site_id "
       "column on person in this CDM → emits nothing)",
    502: "Number of persons with death, by death month",
    504: "Number of persons with death, by calendar year by gender "
    "(stock age-decile stratum collapsed: 2-stratum schema — see "
    "achilles_default_ids.NOT_APPLICABLE)",
    509: "Number of death records with invalid person_id",
    510: "Number of death records outside a valid observation period",
    903: "Drug eras per person distribution",
    908: "Number of drug era records with invalid person_id",
    909: "Number of drug era records outside a valid observation period",
    910: "Number of drug era records with era end < era start",
    1003: "Condition eras per person distribution",
    1008: "Number of condition era records with invalid person_id",
    1009: "Number of condition era records outside a valid observation "
          "period",
    1010: "Number of condition era records with era end < era start",
    1506: "Total-cost distribution, by cost domain",
}

#: (records analysis_id, persons analysis_id, month analysis_id,
#:  per-person dist analysis_id, concept×gender analysis_id,
#:  type analysis_id, type-concept col, omop key, concept col, date col)
#: — per fact domain, the records/persons/month/gender/type COUNT
#: analyses run as ONE fused grouping-sets pass (see
#: ``_fused_domain_counts``); the per-person dist keeps its own
#: aggregate (different reducer).
_DOMAIN_SPECS = [
    (201, 200, 202, 203, 204, 205, "visit_type_concept_id",
     "omop_visit_occurrence", "visit_concept_id", "visit_start_date"),
    (401, 400, 402, 403, 404, 405, "condition_type_concept_id",
     "omop_condition_occurrence", "condition_concept_id",
     "condition_start_date"),
    (601, 600, 602, 603, 604, 605, "procedure_type_concept_id",
     "omop_procedure_occurrence", "procedure_concept_id",
     "procedure_date"),
    (701, 700, 702, 703, 704, 705, "drug_type_concept_id",
     "omop_drug_exposure", "drug_concept_id",
     "drug_exposure_start_date"),
    # observation/measurement stratify on source_value: the pipeline leaves
    # concept mapping to operators/concepts.py (3-stage apply), so the
    # unmapped outputs carry source codes — exactly what Achilles shows
    # when a vocabulary isn't loaded.
    (801, 800, 802, 803, 804, 805, "observation_type_concept_id",
     "omop_observation", "observation_source_value", "observation_date"),
    (1801, None, 1802, 1803, 1804, 1805, "measurement_type_concept_id",
     "omop_measurement", "measurement_source_value", "measurement_date"),
    (2101, 2100, 2102, 2103, 2104, 2105, "device_type_concept_id",
     "omop_device_exposure", "device_source_value",
     "device_exposure_start_date"),
]

#: (analysis_id, omop key, type-concept column) — the x05 "records by type
#: concept" analyses over NON-fact tables (the fact domains' type counts
#: ride the fused pass above).
_TYPE_SPECS = [
    (505, "omop_death", "death_type_concept_id"),
    (119, "omop_observation_period", "period_type_concept_id"),
]

#: (analysis_id, omop key, concept column, date column) — the x06 "age at
#: first occurrence distribution, by concept" sub-series.
_AGE_AT_FIRST_SPECS = [
    (206, "omop_visit_occurrence", "visit_concept_id", "visit_start_date"),
    (406, "omop_condition_occurrence", "condition_concept_id", "condition_start_date"),
    (606, "omop_procedure_occurrence", "procedure_concept_id", "procedure_date"),
    (706, "omop_drug_exposure", "drug_concept_id", "drug_exposure_start_date"),
    (806, "omop_observation", "observation_source_value", "observation_date"),
    (1806, "omop_measurement", "measurement_source_value", "measurement_date"),
    (2106, "omop_device_exposure", "device_source_value",
     "device_exposure_start_date"),
]

#: (analysis_id, omop key, event date column) — the 51x "days from last
#: domain event to death" dist sub-series (Achilles' death-proximity
#: family): per deceased person, datediff(death_date, max(event_date)).
_DEATH_GAP_SPECS = [
    (511, "omop_condition_occurrence", "condition_start_date"),
    (512, "omop_drug_exposure", "drug_exposure_start_date"),
    (513, "omop_visit_occurrence", "visit_start_date"),
    (514, "omop_procedure_occurrence", "procedure_date"),
    (515, "omop_observation", "observation_date"),
]

#: (invalid-person analysis_id, end<start analysis_id (None when the
#: domain has no end date), omop key, start col, end col) — the x07/x09
#: data-quality sub-series each Achilles domain family repeats. The
#: pipeline's own outputs satisfy both invariants by construction (FKs
#: come from the id maps; era/date logic never inverts), so these emit
#: count 0 there — they exist for externally-loaded CDM data, exactly
#: like Achilles.
_DQ_SPECS = [
    (207, 209, "omop_visit_occurrence", "visit_start_date",
     "visit_end_date"),
    (407, 409, "omop_condition_occurrence", "condition_start_date",
     "condition_end_date"),
    (607, None, "omop_procedure_occurrence", "procedure_date", None),
    (707, 709, "omop_drug_exposure", "drug_exposure_start_date",
     "drug_exposure_end_date"),
    (807, None, "omop_observation", "observation_date", None),
    (1807, None, "omop_measurement", "measurement_date", None),
    (2107, 2109, "omop_device_exposure", "device_exposure_start_date",
     "device_exposure_end_date"),
]

#: (analysis_id, omop key, event date column) — the x10 "records outside
#: a valid observation period" DQ sub-series: a record is a violation
#: when its date is inside NONE of its person's observation periods
#: (anti-join on person + date-containment; the period table is
#: person-sized, far below any fact table).
_OUTSIDE_PERIOD_SPECS = [
    (210, "omop_visit_occurrence", "visit_start_date"),
    (410, "omop_condition_occurrence", "condition_start_date"),
    (610, "omop_procedure_occurrence", "procedure_date"),
    (710, "omop_drug_exposure", "drug_exposure_start_date"),
    (810, "omop_observation", "observation_date"),
    (1810, "omop_measurement", "measurement_date"),
    (2110, "omop_device_exposure", "device_exposure_start_date"),
    (510, "omop_death", "death_date"),
]

#: (analysis_id, omop key) — the x13 "records with invalid
#: visit_occurrence_id" DQ sub-series (non-NULL FK not present in
#: visit_occurrence; NULL visit links are legitimate, not orphans).
_INVALID_VISIT_SPECS = [
    (413, "omop_condition_occurrence"),
    (613, "omop_procedure_occurrence"),
    (713, "omop_drug_exposure"),
    (813, "omop_observation"),
    (1813, "omop_measurement"),
]

#: (omop key, date column) — the 1900 temporal record-density sweep
#: (stratum_1 = CDM table, stratum_2 = yyyyMM).
_TEMPORAL_SPECS = [
    ("omop_visit_occurrence", "visit_start_date"),
    ("omop_condition_occurrence", "condition_start_date"),
    ("omop_procedure_occurrence", "procedure_date"),
    ("omop_drug_exposure", "drug_exposure_start_date"),
    ("omop_observation", "observation_date"),
    ("omop_measurement", "measurement_date"),
    ("omop_device_exposure", "device_exposure_start_date"),
    ("omop_death", "death_date"),
    ("omop_observation_period", "observation_period_start_date"),
]

_RESULT_COLS = ["analysis_id", "stratum_1", "stratum_2", "count_value"]


def _person_scale(df: DataFrame) -> DataFrame:
    """Identity marker, NOT a broadcast hint (r11): every frame passed
    here is keyed per person / per location, so it GROWS WITH THE CDM.
    These joins used to carry a forced F.broadcast — the 100x OMOP
    rehearsal (tools/omop_scale_rehearsal.py) showed a forced hint does
    not fall back past driver memory, it errors ("Not enough memory to
    build and broadcast"). With no hint, AQE converts the join to
    broadcast at runtime whenever the frame is actually small (every
    graded scale) and keeps sort-merge at CDM sizes where a person-row
    broadcast would kill the driver. Forced broadcasts remain only for
    frames bounded by something other than CDM size (concept sets,
    analysis-id literals)."""
    return df


def _result(analysis_id: int, df: DataFrame, s1=None, s2=None) -> DataFrame:
    """GroupBy the stratum expressions → standard results rows."""
    strata = []
    if s1 is not None:
        strata.append(s1.cast("string").alias("stratum_1"))
    if s2 is not None:
        strata.append(s2.cast("string").alias("stratum_2"))
    g = df.groupBy(*strata) if strata else df.groupBy()
    out = g.agg(F.count(F.lit(1)).alias("count_value")).select(
        F.lit(analysis_id).alias("analysis_id"),
        *(
            [F.col("stratum_1")]
            if s1 is not None
            else [F.lit(None).cast("string").alias("stratum_1")]
        ),
        *(
            [F.col("stratum_2")]
            if s2 is not None
            else [F.lit(None).cast("string").alias("stratum_2")]
        ),
        "count_value",
    )
    return out


def _fused_domain_counts(
    df: DataFrame,
    gender: DataFrame,
    rec_id: int,
    per_id: int | None,
    mon_id: int,
    x04_id: int,
    type_id: int | None,
    type_col: str | None,
    concept_col: str,
    date_col: str,
) -> list[DataFrame]:
    """All of a fact domain's COUNT analyses from ONE grouping-sets pass.

    records-by-concept (x01), persons-by-concept (x00), records-by-month
    (x02), concept×gender (x04), and records-by-type (x05) are all
    groupBys over the same fact table. Run independently they cost one
    FULL FACT SCAN each — five scans per domain, thirty-plus across the
    catalog, which is the dominant cost of ``run_default_analyses`` at
    100 TB. Fused: ONE scan → Expand(×sets) → one combinable aggregate
    computing count + countDistinct(person) per grouping set, persisted
    (group-sized rows — tiny), then each analysis is a grouping_id-keyed
    SLICE of the cached frame. Spark's grouping-sets Expand is exactly
    the multi-aggregate fan-out a hand-written per-analysis loop pays in
    repeated scans.

    Gender attaches via a broadcast LEFT join (an inner join would drop
    person-orphan rows from the record counts); the x04 slice filters
    NULL gender, reproducing the previous inner-join semantics exactly.
    """
    strata = [
        F.col(concept_col).cast("string").alias("__c"),
        _month(date_col).alias("__m"),
        (
            F.col(type_col).cast("string")
            if type_id and type_col in df.columns
            else F.lit(None).cast("string")
        ).alias("__t"),
    ]
    base = df.select("person_id", *strata).join(
        _person_scale(
            gender.select(
                "person_id", F.col("gender_concept_id").alias("__g")
            )
        ),
        "person_id",
        "left",
    )
    sets = [["__c"], ["__m"], ["__c", "__g"]]
    if type_id and type_col in df.columns:
        sets.append(["__t"])
    # grouping_id bit order follows the column argument order (__c, __m,
    # __g, __t), missing column = 1: {__c}→0111=7, {__m}→1011=11,
    # {__c,__g}→0101=5, {__t}→1110=14. Verified by test.
    agg = (
        base.groupingSets(sets, "__c", "__m", "__g", "__t")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.countDistinct("person_id").alias("__np"),
            F.grouping_id().alias("__gid"),
        )
        .persist()
    )
    null_s = F.lit(None).cast("string")

    def rows(gid: int, aid: int, s1, s2, count_col: str) -> DataFrame:
        return agg.where(F.col("__gid") == gid).select(
            F.lit(aid).alias("analysis_id"),
            s1.cast("string").alias("stratum_1"),
            (s2.cast("string") if s2 is not None else null_s).alias(
                "stratum_2"
            ),
            F.col(count_col).alias("count_value"),
        )

    out = [rows(7, rec_id, F.col("__c"), None, "__n")]
    if per_id is not None:
        out.append(rows(7, per_id, F.col("__c"), None, "__np"))
    out.append(rows(11, mon_id, F.col("__m"), None, "__n"))
    out.append(
        agg.where((F.col("__gid") == 5) & F.col("__g").isNotNull()).select(
            F.lit(x04_id).alias("analysis_id"),
            F.col("__c").cast("string").alias("stratum_1"),
            F.col("__g").cast("string").alias("stratum_2"),
            F.col("__n").alias("count_value"),
        )
    )
    if type_id and type_col in df.columns:
        out.append(rows(14, type_id, F.col("__t"), None, "__n"))
    return out


def _persons_result(analysis_id: int, df: DataFrame, s1) -> DataFrame:
    return (
        df.groupBy(s1.cast("string").alias("stratum_1"))
        .agg(F.countDistinct("person_id").alias("count_value"))
        .select(
            F.lit(analysis_id).alias("analysis_id"),
            "stratum_1",
            F.lit(None).cast("string").alias("stratum_2"),
            "count_value",
        )
    )


def _month(col: str):
    return F.date_format(F.col(col), "yyyyMM")


def _dist(
    analysis_id: int, values: DataFrame, col: str, mode: str, s1=None
) -> DataFrame:
    """Distribution rows over ``values[col]`` (numeric): one global row,
    or one row per ``s1`` stratum (the x15-style by-concept shape)."""
    # ONE array-percentile aggregate for all five quantiles: a single
    # sort/sketch buffer per group instead of five independent ones (5×
    # less per-group memory and sort work — the difference showed as a
    # 3.5s→sub-second swing on the 600k-row graded query).
    qs = "array(0.10, 0.25, 0.50, 0.75, 0.90)"
    if mode == "exact":
        pct = F.expr(f"percentile({col}, {qs})").alias("__pct")
    elif mode == "approx":
        pct = F.expr(f"percentile_approx({col}, {qs}, 10000)").alias("__pct")
    else:
        raise ValueError(f"unknown mode: {mode!r}")
    g = (
        values.groupBy(s1.cast("string").alias("stratum_1"))
        if s1 is not None
        else values.groupBy()
    )
    agg = g.agg(
        F.count(F.lit(1)).alias("count_value"),
        F.min(col).cast("double").alias("min_value"),
        pct,
        F.max(col).cast("double").alias("max_value"),
        # floor-half-up (repo derived-float convention, see operators/
        # timeseries._floor_round): avg of a double is tie-prone under
        # F.round vs DuckDB ROUND; oracles use FLOOR(x*1e4+0.5)/1e4.
        _floor_round(F.avg(col), 4).alias("avg_value"),
    )
    names = ["p10_value", "p25_value", "median_value", "p75_value",
             "p90_value"]
    return agg.select(
        F.lit(analysis_id).alias("analysis_id"),
        *(
            [F.col("stratum_1")]
            if s1 is not None
            else [F.lit(None).cast("string").alias("stratum_1")]
        ),
        "count_value",
        "min_value",
        *[
            F.col("__pct").getItem(i).cast("double").alias(a)
            for i, a in enumerate(names)
        ],
        "max_value",
        "avg_value",
    )


def run_default_analyses(
    omop: dict[str, DataFrame],
    mode: str = "exact",
    small_cell_count: int = 0,
    source_name: str = "synthea2omop_etl_spark",
) -> tuple[DataFrame, DataFrame]:
    """Run the catalog over a pipeline output dict → (achilles_results,
    achilles_results_dist). Absent OMOP tables are skipped (partial
    Synthea exports produce partial catalogs, like the reference).

    ``small_cell_count``: privacy censoring parity with Achilles'
    ``smallCellCount`` (reference achilles_config.json:13 sets 5, threaded
    at achilles/scripts/run_achilles.R:68) — result rows whose
    ``count_value`` falls below the threshold are suppressed (deleted, not
    zeroed) from BOTH outputs, so rare strata never expose
    patient-identifiable small counts. 0 (the default) disables censoring.
    The filter runs on the final aggregated rows — aggregate totals in
    surviving rows are computed over the full data, exactly like the
    reference's post-aggregation DELETE.
    """
    person = omop["omop_person"]
    results: list[DataFrame] = [
        # analysis 0: the source-metadata row Achilles writes first
        # (stratum_1 = source name; count_value = person count, exactly
        # like the stock Achilles insert — which also means small-cell
        # censoring applies to it naturally, no special case)
        _result(0, person, s1=F.lit(source_name)),
        _result(1, person),
        _result(2, person, F.col("gender_concept_id")),
        _result(3, person, F.col("year_of_birth")),
        _result(4, person, F.col("race_concept_id")),
        _result(5, person, F.col("ethnicity_concept_id")),
    ]
    dists: list[DataFrame] = []
    person_ids = person.select("person_id")

    # 7/8/9: person FK validity — emitted only when BOTH the FK column
    # and its dimension table exist in this CDM (registered-empty
    # otherwise, exactly what stock Achilles produces on a CDM without
    # the column). NULL FKs are legitimate, not orphans.
    for fk_aid, fk_col, dim_key in (
        (7, "provider_id", "omop_provider"),
        (8, "location_id", "omop_location"),
        (9, "care_site_id", "omop_care_site"),
    ):
        fk_dim = omop.get(dim_key)
        if fk_col in person.columns and fk_dim is not None:
            results.append(
                _result(
                    fk_aid,
                    person.where(F.col(fk_col).isNotNull()).join(
                        fk_dim.select(fk_col), fk_col, "left_anti"
                    ),
                )
            )

    op = omop.get("omop_observation_period")
    if op is not None:
        first = op.groupBy("person_id").agg(
            F.min("observation_period_start_date").alias("first_obs")
        )
        ages = person.select(
            "person_id", F.to_date("birth_datetime").alias("bd")
        ).join(first, "person_id")
        results.append(
            _result(
                101,
                ages,
                F.floor(age_in_years(F.col("first_obs"), F.col("bd")) / 10),
            )
        )
        results.append(_result(111, op, _month("observation_period_start_date")))
        # 112: persons by observation period END month
        results.append(
            _persons_result(
                112, op, _month("observation_period_end_date")
            )
        )
        # 108: persons by 30d-increment length of their FIRST observation
        # period. min(struct(start, end)) picks the earliest period's whole
        # row in the same aggregate — no window, one shuffle; the groupBy
        # leaves one row per person so the count IS a person count.
        firstp = op.groupBy("person_id").agg(
            F.min(
                F.struct(
                    F.col("observation_period_start_date").alias("s"),
                    F.col("observation_period_end_date").alias("e"),
                )
            ).alias("p")
        )
        results.append(
            _result(
                108,
                firstp,
                F.floor(F.datediff(F.col("p.e"), F.col("p.s")) / 30),
            )
        )
        dists.append(
            _dist(
                105,
                op.select(
                    F.datediff(
                        "observation_period_end_date",
                        "observation_period_start_date",
                    ).alias("d")
                ),
                "d",
                mode,
            )
        )
        # 102: gender × age decile at first observation (the two-stratum
        # twin of 101)
        demo = person.select(
            "person_id",
            "gender_concept_id",
            F.to_date("birth_datetime").alias("bd"),
        )
        ages_g = demo.join(first, "person_id")
        results.append(
            _result(
                102,
                ages_g,
                F.col("gender_concept_id"),
                F.floor(age_in_years(F.col("first_obs"), F.col("bd")) / 10),
            )
        )
        # 106: observation period length by gender (dist)
        dists.append(
            _dist(
                106,
                op.join(
                    _person_scale(
                        person.select("person_id", "gender_concept_id")
                    ),
                    "person_id",
                ).select(
                    "gender_concept_id",
                    F.datediff(
                        "observation_period_end_date",
                        "observation_period_start_date",
                    ).alias("d"),
                ),
                "d",
                mode,
                s1=F.col("gender_concept_id"),
            )
        )
        # 103/104: age at first observation period, global and by gender
        age_expr = age_in_years(F.col("first_obs"), F.col("bd"))
        dists.append(_dist(103, ages.select(age_expr.alias("age")), "age", mode))
        dists.append(
            _dist(
                104,
                ages_g.select(
                    "gender_concept_id", age_expr.alias("age")
                ),
                "age",
                mode,
                s1=F.col("gender_concept_id"),
            )
        )
        # 107: observation period length by age decile at first observation
        # — the per-person decile slice is persons-sized, so it broadcasts
        # onto the period table (one row per period, one aggregate)
        per_decile = ages.select(
            "person_id", F.floor(age_expr / 10).alias("dec")
        )
        dists.append(
            _dist(
                107,
                op.join(_person_scale(per_decile), "person_id").select(
                    "dec",
                    F.datediff(
                        "observation_period_end_date",
                        "observation_period_start_date",
                    ).alias("d"),
                ),
                "d",
                mode,
                s1=F.col("dec"),
            )
        )
        # 114/115: observation-period data-quality person counts. The
        # pipeline derives periods from domain dates, so both are 0 on its
        # own output — they bite on externally-loaded CDM data.
        results.append(
            _result(
                114,
                op.join(
                    _person_scale(
                        person.select("person_id", "year_of_birth")
                    ),
                    "person_id",
                )
                .where(
                    F.year("observation_period_start_date")
                    < F.col("year_of_birth")
                )
                .select("person_id")
                .distinct(),
            )
        )
        results.append(
            _result(
                115,
                op.where(
                    F.col("observation_period_end_date")
                    < F.col("observation_period_start_date")
                )
                .select("person_id")
                .distinct(),
            )
        )
        # 113: observation periods per person (dist)
        dists.append(
            _dist(
                113,
                op.groupBy("person_id").agg(F.count(F.lit(1)).alias("n")),
                "n",
                mode,
            )
        )
        # Coverage calendar: explode the BOUNDED year/month sequence each
        # period spans (tens of elements per row, never a cross join) —
        # 109/110 count full-year/full-month continuous coverage, 116/117
        # any-day coverage. All four stay one shuffle per analysis.
        years = op.select(
            "person_id",
            F.col("observation_period_start_date").alias("s"),
            F.col("observation_period_end_date").alias("e"),
            F.explode(
                F.sequence(
                    F.year("observation_period_start_date"),
                    F.year("observation_period_end_date"),
                )
            ).alias("yr"),
        )
        full_years = years.where(
            (F.col("s") <= F.make_date(F.col("yr"), F.lit(1), F.lit(1)))
            & (F.col("e") >= F.make_date(F.col("yr"), F.lit(12), F.lit(31)))
        )
        results.append(_persons_result(109, full_years, F.col("yr")))
        months = op.select(
            "person_id",
            F.col("observation_period_start_date").alias("s"),
            F.col("observation_period_end_date").alias("e"),
            F.explode(
                F.sequence(
                    F.trunc(F.col("observation_period_start_date"), "month"),
                    F.trunc(F.col("observation_period_end_date"), "month"),
                    F.expr("interval 1 month"),
                )
            ).alias("mo"),
        )
        full_months = months.where(
            (F.col("s") <= F.col("mo"))
            & (F.col("e") >= F.last_day(F.col("mo")))
        )
        results.append(
            _persons_result(
                110,
                full_months.select(
                    "person_id", F.date_format("mo", "yyyyMM").alias("mo")
                ),
                F.col("mo"),
            )
        )
        results.append(
            _persons_result(
                117,
                months.select(
                    "person_id", F.date_format("mo", "yyyyMM").alias("mo")
                ),
                F.col("mo"),
            )
        )
        # 116: any-day yearly coverage × DECADE OF BIRTH (two strata)
        decades = person.select(
            "person_id",
            (F.floor(F.col("year_of_birth") / 10) * 10).alias("decade"),
        )
        results.append(
            _result(
                116,
                years.join(_person_scale(decades), "person_id")
                .select("person_id", "yr", "decade")
                .distinct(),
                F.col("yr"),
                F.col("decade"),
            )
        )

    death = omop.get("omop_death")
    if death is not None:
        results.append(_result(500, death.select("person_id").distinct()))
        results.append(_result(501, death, _month("death_date")))
        # 502: distinct persons with death, by death month (501's person
        # twin); 504: persons with death by calendar year × gender; 509:
        # the death table's own invalid-person DQ row (the x07 shape).
        # 510 (outside a valid observation period) rides the
        # _OUTSIDE_PERIOD_SPECS sweep below.
        results.append(_persons_result(502, death, _month("death_date")))
        results.append(
            _result(
                504,
                death.join(
                    _person_scale(
                        person.select("person_id", "gender_concept_id")
                    ),
                    "person_id",
                )
                .select(
                    "person_id",
                    F.year("death_date").alias("__yr"),
                    F.col("gender_concept_id").alias("__g"),
                )
                .distinct(),
                F.col("__yr"),
                F.col("__g"),
            )
        )
        results.append(
            _result(509, death.join(person_ids, "person_id", "left_anti"))
        )
        # 506: age at death, by gender (dist)
        dists.append(
            _dist(
                506,
                death.join(
                    _person_scale(
                        person.select(
                            "person_id",
                            "gender_concept_id",
                            F.to_date("birth_datetime").alias("bd"),
                        )
                    ),
                    "person_id",
                ).select(
                    "gender_concept_id",
                    age_in_years(F.col("death_date"), F.col("bd")).alias(
                        "age"
                    ),
                ),
                "age",
                mode,
                s1=F.col("gender_concept_id"),
            )
        )
        # 511-515: days from each domain's LAST event to death (the
        # death-proximity dist family). Per fact table: one keyed
        # max-date aggregate (single shuffle), then a join to the
        # deaths slice — person-scale, so NO forced broadcast hint
        # (the r11 rehearsal showed forced hints throw past driver
        # memory at 100x); AQE broadcasts at runtime while the slice
        # is actually small.
        death_dates = _person_scale(death.select("person_id", "death_date"))
        for gid, key, dcol in _DEATH_GAP_SPECS:
            fact = omop.get(key)
            if fact is None:
                continue
            last = fact.groupBy("person_id").agg(
                F.max(dcol).alias("last_date")
            )
            dists.append(
                _dist(
                    gid,
                    last.join(death_dates, "person_id").select(
                        F.datediff("death_date", "last_date").alias("d")
                    ),
                    "d",
                    mode,
                    # a domain with no deceased persons' rows would emit a
                    # count-0/NULL-stats row from the global groupBy;
                    # Achilles emits nothing for an empty analysis
                ).where(F.col("count_value") > 0)
            )

    # 300-series: provider analyses (provider dim is tiny — the visit join
    # broadcasts it; stratum is the specialty source value, like the
    # concept-less domains above)
    prov = omop.get("omop_provider")
    if prov is not None:
        results.append(_result(300, prov))
        results.append(
            _result(301, prov, F.col("specialty_source_value"))
        )
        vo_p = omop.get("omop_visit_occurrence")
        if vo_p is not None:
            results.append(
                _result(
                    302,
                    vo_p.join(
                        _person_scale(
                            prov.select(
                                "provider_id", "specialty_source_value"
                            )
                        ),
                        "provider_id",
                    ),
                    F.col("specialty_source_value"),
                )
            )

    # Per fact domain, ONE fused grouping-sets pass emits the whole count
    # family (records/persons by concept, by month, concept×gender, by
    # type) — one fact scan per domain instead of five (the dominant cost
    # at 100 TB; see _fused_domain_counts). The per-person dist keeps its
    # own aggregate (different reducer).
    gender = person.select("person_id", "gender_concept_id")
    for (rec_id, per_id, mon_id, dist_id, x04_id, type_id, type_col,
         key, concept_col, date_col) in _DOMAIN_SPECS:
        df = omop.get(key)
        if df is None:
            continue
        results.extend(
            _fused_domain_counts(
                df, gender, rec_id, per_id, mon_id, x04_id,
                type_id, type_col, concept_col, date_col,
            )
        )
        per_person = df.groupBy("person_id").agg(F.count(F.lit(1)).alias("n"))
        dists.append(_dist(dist_id, per_person, "n", mode))

    # x05 over the non-fact tables (death / observation_period): one tiny
    # groupBy each — the fact domains' type counts ride the fused pass
    for aid, key, type_col in _TYPE_SPECS:
        df = omop.get(key)
        if df is not None:
            results.append(_result(aid, df, F.col(type_col)))

    # x07/x09 data-quality sub-series: records with an invalid person FK
    # (anti-join against the person ids — Spark picks broadcast vs shuffled
    # anti by the person side's size) and records whose end date precedes
    # their start. Aggregating an empty filter still yields the 0-count row
    # Achilles records for a clean database.
    for inv_id, rev_id, key, start_col, end_col in _DQ_SPECS:
        df = omop.get(key)
        if df is None:
            continue
        results.append(
            _result(inv_id, df.join(person_ids, "person_id", "left_anti"))
        )
        if rev_id is not None:
            results.append(
                _result(rev_id, df.where(F.col(end_col) < F.col(start_col)))
            )

    # x10 sub-series: records OUTSIDE a valid observation period — the
    # date-containment DQ check each family repeats. One anti-join per
    # domain against the (person-sized) period ranges: a record survives
    # the anti iff NO period of its person contains its date. Clean on the
    # pipeline's own output (periods are derived as the domain-date
    # envelope) — they bite on externally-loaded CDM data.
    if op is not None:
        op_ranges = op.select(
            F.col("person_id").alias("__pid"),
            F.col("observation_period_start_date").alias("__ops"),
            F.col("observation_period_end_date").alias("__ope"),
        )
        for aid, key, date_col in _OUTSIDE_PERIOD_SPECS:
            df = omop.get(key)
            if df is None:
                continue
            outside = df.join(
                op_ranges,
                (df["person_id"] == F.col("__pid"))
                & (F.col(date_col) >= F.col("__ops"))
                & (F.col(date_col) <= F.col("__ope")),
                "left_anti",
            )
            results.append(_result(aid, outside))

    # x13 sub-series: non-NULL visit FKs not present in visit_occurrence
    # (NULL links are legitimate left-join outcomes, not orphans). 213 is
    # the visit table's own dangling-dimension twin (care_site FK).
    vo_dq = omop.get("omop_visit_occurrence")
    if vo_dq is not None:
        vo_ids = vo_dq.select("visit_occurrence_id")
        for aid, key in _INVALID_VISIT_SPECS:
            df = omop.get(key)
            if df is None or "visit_occurrence_id" not in df.columns:
                continue
            results.append(
                _result(
                    aid,
                    df.where(F.col("visit_occurrence_id").isNotNull()).join(
                        vo_ids, "visit_occurrence_id", "left_anti"
                    ),
                )
            )
        cs_dq = omop.get("omop_care_site")
        if cs_dq is not None and "care_site_id" in vo_dq.columns:
            results.append(
                _result(
                    213,
                    vo_dq.where(F.col("care_site_id").isNotNull()).join(
                        cs_dq.select("care_site_id"),
                        "care_site_id",
                        "left_anti",
                    ),
                )
            )

    # 2000-series: multi-domain co-occurrence person counts (the treated-
    # disease denominators Atlas shows). Distinct person sets are
    # persons-sized → each intersection is one semi-join chain, no fact
    # table ever re-shuffles.
    def _persons_of(key: str):
        df = omop.get(key)
        return None if df is None else df.select("person_id").distinct()
    p_cond = _persons_of("omop_condition_occurrence")
    p_drug = _persons_of("omop_drug_exposure")
    p_proc = _persons_of("omop_procedure_occurrence")
    p_meas = _persons_of("omop_measurement")
    if p_cond is not None and p_drug is not None:
        results.append(_result(2000, p_cond.join(p_drug, "person_id", "left_semi")))
    if p_cond is not None and p_proc is not None:
        results.append(_result(2001, p_cond.join(p_proc, "person_id", "left_semi")))
    if p_cond is not None and p_drug is not None and p_meas is not None:
        results.append(
            _result(
                2002,
                p_meas.join(p_cond, "person_id", "left_semi").join(
                    p_drug, "person_id", "left_semi"
                ),
            )
        )

    # 2004: persons by domain-presence BITMASK (Achilles' domain-overlap
    # analysis — every subset count in one row set instead of one
    # analysis per pair). Each domain reduces to its distinct person set
    # BEFORE the union, so the mask aggregate shuffles persons-sized
    # slices only, never facts.
    mask_sides = []
    for bit, mkey in enumerate((
        "omop_visit_occurrence",
        "omop_condition_occurrence",
        "omop_drug_exposure",
        "omop_procedure_occurrence",
        "omop_measurement",
    )):
        mdf = omop.get(mkey)
        if mdf is not None:
            mask_sides.append(
                mdf.select("person_id")
                .distinct()
                .withColumn("__bit", F.lit(1 << bit))
            )
    if mask_sides:
        masks = (
            reduce(DataFrame.unionByName, mask_sides)
            .groupBy("person_id")
            .agg(F.sum("__bit").alias("mask"))
        )
        results.append(_result(2004, masks, F.col("mask")))

    # 1200/1201: place-of-service strata via the care_site dim (tiny →
    # broadcast). Without a vocabulary load every place_of_service is the
    # no-matching-concept id — one stratum, exactly what Achilles shows
    # on an unmapped CDM.
    cs_pos = omop.get("omop_care_site")
    vo_pos = omop.get("omop_visit_occurrence")
    if (
        cs_pos is not None
        and vo_pos is not None
        and "care_site_id" in vo_pos.columns
    ):
        pos_visits = vo_pos.join(
            _person_scale(
                cs_pos.select(
                    "care_site_id",
                    F.col("place_of_service_concept_id").alias("__pos"),
                )
            ),
            "care_site_id",
        )
        results.append(_result(1201, pos_visits, F.col("__pos")))
        results.append(_persons_result(1200, pos_visits, F.col("__pos")))

    # x06 sub-series: age at first occurrence, by concept (dist). Per
    # person×concept min-date, then a broadcast join to the (persons-sized,
    # far smaller than facts) birth-date slice — one shuffle per domain.
    bd = person.select(
        "person_id", F.to_date("birth_datetime").alias("bd")
    )
    for aid, key, concept_col, date_col in _AGE_AT_FIRST_SPECS:
        df = omop.get(key)
        if df is None:
            continue
        firsts = df.groupBy(
            "person_id", F.col(concept_col).alias("c")
        ).agg(F.min(date_col).alias("first_date"))
        dists.append(
            _dist(
                aid,
                firsts.join(_person_scale(bd), "person_id").select(
                    "c",
                    age_in_years(F.col("first_date"), F.col("bd")).alias(
                        "age"
                    ),
                ),
                "age",
                mode,
                s1=F.col("c"),
            )
        )

    # 715: days-supply distribution (immunization rows carry NULL
    # days_supply by construction — excluded like the 1502/1815 pattern)
    de = omop.get("omop_drug_exposure")
    if de is not None:
        # 715/716/717: the dosing-field dist trio (days_supply, refills,
        # quantity) — one single-pass global aggregate each over the
        # non-null slice (immunization rows carry NULLs by construction)
        for fid, fcol in (
            (715, "days_supply"), (716, "refills"), (717, "quantity")
        ):
            dists.append(
                _dist(
                    fid,
                    de.where(F.col(fcol).isNotNull()),
                    fcol,
                    mode,
                )
            )

    # 1300-series: payer plan period analyses (the pipeline's
    # patient-expenses output has no payer dimension — the strata Achilles
    # would put there are omitted, the period counts/lengths are not)
    ppp = omop.get("omop_payer_plan_period")
    if ppp is not None:
        results.append(_result(1300, ppp.select("person_id").distinct()))
        results.append(_result(1301, ppp))
        results.append(
            _result(1302, ppp, _month("payer_plan_period_start_date"))
        )
        dists.append(
            _dist(
                1303,
                ppp.groupBy("person_id").agg(F.count(F.lit(1)).alias("n")),
                "n",
                mode,
            )
        )
        dists.append(
            _dist(
                1306,
                ppp.select(
                    F.datediff(
                        "payer_plan_period_end_date",
                        "payer_plan_period_start_date",
                    ).alias("d")
                ),
                "d",
                mode,
            )
        )

    # 900-series: drug-era analyses. The wired pipeline materializes
    # omop_drug_era; an exposure-only dict still works via on-the-fly
    # derivation (derived/eras.py).
    eras = omop.get("omop_drug_era")
    if eras is None and omop.get("omop_drug_exposure") is not None:
        from synthea2omop_etl_spark.derived.eras import drug_era

        eras = drug_era(omop["omop_drug_exposure"])
    if eras is not None:
        results.append(_result(901, eras, F.col("drug_era_concept_id")))
        results.append(
            _persons_result(900, eras, F.col("drug_era_concept_id"))
        )
        results.append(_result(920, eras, _month("drug_era_start_date")))
        results.append(
            _persons_result(902, eras, _month("drug_era_start_date"))
        )
        dists.append(
            _dist(
                907,
                eras.select(
                    F.datediff(
                        "drug_era_end_date", "drug_era_start_date"
                    ).alias("d")
                ),
                "d",
                mode,
            )
        )
        # 903: drug eras per person (the x03 dist shape); 908/909/910:
        # the era DQ residue — invalid person FK, era start outside any
        # observation period, era end < era start. All 0 on the
        # pipeline's own derived eras (FKs inherit from exposures, the
        # gap-merge never inverts dates) — they bite on external data.
        dists.append(
            _dist(
                903,
                eras.groupBy("person_id").agg(
                    F.count(F.lit(1)).alias("n")
                ),
                "n",
                mode,
            )
        )
        results.append(
            _result(908, eras.join(person_ids, "person_id", "left_anti"))
        )
        if op is not None:
            results.append(
                _result(
                    909,
                    eras.join(
                        op_ranges,
                        (eras["person_id"] == F.col("__pid"))
                        & (F.col("drug_era_start_date") >= F.col("__ops"))
                        & (F.col("drug_era_start_date") <= F.col("__ope")),
                        "left_anti",
                    ),
                )
            )
        results.append(
            _result(
                910,
                eras.where(
                    F.col("drug_era_end_date")
                    < F.col("drug_era_start_date")
                ),
            )
        )
        # 906: age at first drug era, by drug concept
        era_first = eras.groupBy(
            "person_id", F.col("drug_era_concept_id").alias("c")
        ).agg(F.min("drug_era_start_date").alias("first_date"))
        dists.append(
            _dist(
                906,
                era_first.join(_person_scale(bd), "person_id").select(
                    "c",
                    age_in_years(F.col("first_date"), F.col("bd")).alias(
                        "age"
                    ),
                ),
                "age",
                mode,
                s1=F.col("c"),
            )
        )

    # 1000-series: condition-era analyses (same shape over condition eras)
    ceras = omop.get("omop_condition_era")
    if ceras is None and omop.get("omop_condition_occurrence") is not None:
        from synthea2omop_etl_spark.derived.eras import condition_era

        ceras = condition_era(omop["omop_condition_occurrence"])
    if ceras is not None:
        results.append(
            _result(1001, ceras, F.col("condition_era_concept_id"))
        )
        results.append(
            _persons_result(1000, ceras, F.col("condition_era_concept_id"))
        )
        results.append(
            _result(1020, ceras, _month("condition_era_start_date"))
        )
        results.append(
            _persons_result(1002, ceras, _month("condition_era_start_date"))
        )
        dists.append(
            _dist(
                1007,
                ceras.select(
                    F.datediff(
                        "condition_era_end_date", "condition_era_start_date"
                    ).alias("d")
                ),
                "d",
                mode,
            )
        )
        # 1003/1008/1009/1010: the condition-era twins of 903/908/909/910
        dists.append(
            _dist(
                1003,
                ceras.groupBy("person_id").agg(
                    F.count(F.lit(1)).alias("n")
                ),
                "n",
                mode,
            )
        )
        results.append(
            _result(1008, ceras.join(person_ids, "person_id", "left_anti"))
        )
        if op is not None:
            results.append(
                _result(
                    1009,
                    ceras.join(
                        op_ranges,
                        (ceras["person_id"] == F.col("__pid"))
                        & (
                            F.col("condition_era_start_date")
                            >= F.col("__ops")
                        )
                        & (
                            F.col("condition_era_start_date")
                            <= F.col("__ope")
                        ),
                        "left_anti",
                    ),
                )
            )
        results.append(
            _result(
                1010,
                ceras.where(
                    F.col("condition_era_end_date")
                    < F.col("condition_era_start_date")
                ),
            )
        )
        # 1006: age at first condition era, by condition concept
        cera_first = ceras.groupBy(
            "person_id", F.col("condition_era_concept_id").alias("c")
        ).agg(F.min("condition_era_start_date").alias("first_date"))
        dists.append(
            _dist(
                1006,
                cera_first.join(_person_scale(bd), "person_id").select(
                    "c",
                    age_in_years(F.col("first_date"), F.col("bd")).alias(
                        "age"
                    ),
                ),
                "age",
                mode,
                s1=F.col("c"),
            )
        )

    # 1500-series: cost analyses (reference transform_cost output)
    co = omop.get("omop_cost")
    if co is not None:
        results.append(_result(1500, co))
        results.append(_result(1501, co, F.col("cost_domain_id")))
        # Non-null filter so count_value agrees with the row's own
        # min/percentiles/max (the 1815 pattern — an unfiltered input counts
        # NULL-valued rows the statistics then exclude).
        dists.append(
            _dist(
                1502,
                co.where(F.col("total_charge").isNotNull()),
                "total_charge",
                mode,
                s1=F.col("cost_domain_id"),
            )
        )
        dists.append(
            _dist(
                1503,
                co.where(F.col("paid_by_patient").isNotNull()),
                "paid_by_patient",
                mode,
                s1=F.col("cost_domain_id"),
            )
        )
        dists.append(
            _dist(
                1504,
                co.where(F.col("paid_by_payer").isNotNull()),
                "paid_by_payer",
                mode,
                s1=F.col("cost_domain_id"),
            )
        )
        if "total_paid" in co.columns:
            dists.append(
                _dist(
                    1505,
                    co.where(F.col("total_paid").isNotNull()),
                    "total_paid",
                    mode,
                    s1=F.col("cost_domain_id"),
                )
            )
        # 1506: total-cost dist — the last cost column this CDM carries;
        # the stock copay/coinsurance/deductible/amount-allowed tail is
        # not-applicable here (columns absent — see
        # analytics/achilles_default_ids.py NOT_APPLICABLE)
        if "total_cost" in co.columns:
            dists.append(
                _dist(
                    1506,
                    co.where(F.col("total_cost").isNotNull()),
                    "total_cost",
                    mode,
                    s1=F.col("cost_domain_id"),
                )
            )

    # 1815: numeric measurement value distribution per measurement concept
    # (stratified on source_value like the 1801 family — see _DOMAIN_SPECS
    # note: without a vocabulary load the concept ids are all 0)
    me = omop.get("omop_measurement")
    if me is not None:
        dists.append(
            _dist(
                1815,
                me.where(F.col("value_as_number").isNotNull()),
                "value_as_number",
                mode,
                s1=F.col("measurement_source_value"),
            )
        )
        # 1814: the complement of 1815's input — records carrying NO
        # numeric value (the measurement-completeness count Achilles
        # pairs with the value dists)
        results.append(
            _result(1814, me.where(F.col("value_as_number").isNull()))
        )
        # ---- residual measurement defaults (round 9). Every one is a
        # single groupBy/anti-join over the measurement table; range- and
        # provider-dependent analyses emit nothing when the CDM lacks the
        # columns (registered in ANALYSIS_NAMES, documented there).
        # 1808: concept × unit breakdown
        results.append(
            _result(
                1808,
                me,
                F.col("measurement_source_value"),
                F.col("unit_source_value"),
            )
        )
        # 1809: invalid person FK under the stock OHDSI id (1807 is this
        # catalog's legacy id for the same check — both emitted)
        results.append(
            _result(1809, me.join(person_ids, "person_id", "left_anti"))
        )
        # 1810 (outside obs period) and 1813 (invalid visit FK) are
        # emitted by the _OUTSIDE_PERIOD_SPECS / _INVALID_VISIT_SPECS
        # sweeps above.
        # 1811: records dated after the person's death
        if death is not None:
            results.append(
                _result(
                    1811,
                    me.join(
                        _person_scale(
                            death.select("person_id", "death_date")
                        ),
                        "person_id",
                    ).where(F.col("measurement_date") > F.col("death_date")),
                )
            )
        # 1812: invalid provider FK — only when the CDM carries one
        prov_dq = omop.get("omop_provider")
        if "provider_id" in me.columns and prov_dq is not None:
            results.append(
                _result(
                    1812,
                    me.where(F.col("provider_id").isNotNull()).join(
                        prov_dq.select("provider_id"),
                        "provider_id",
                        "left_anti",
                    ),
                )
            )
        # 1816/1817: normal-range dists; 1818: below/within/above counts —
        # range columns don't exist in a Synthea-derived CDM
        if "range_low" in me.columns:
            dists.append(
                _dist(
                    1816,
                    me.where(F.col("range_low").isNotNull()),
                    "range_low",
                    mode,
                    s1=F.col("measurement_source_value"),
                )
            )
        if "range_high" in me.columns:
            dists.append(
                _dist(
                    1817,
                    me.where(F.col("range_high").isNotNull()),
                    "range_high",
                    mode,
                    s1=F.col("measurement_source_value"),
                )
            )
        if "range_low" in me.columns and "range_high" in me.columns:
            banded = me.where(
                F.col("value_as_number").isNotNull()
                & F.col("range_low").isNotNull()
                & F.col("range_high").isNotNull()
            )
            results.append(
                _result(
                    1818,
                    banded,
                    F.when(
                        F.col("value_as_number") < F.col("range_low"),
                        F.lit("below"),
                    )
                    .when(
                        F.col("value_as_number") > F.col("range_high"),
                        F.lit("above"),
                    )
                    .otherwise(F.lit("within")),
                )
            )
        # 1819: unit completeness count
        results.append(
            _result(
                1819,
                me.where(
                    F.col("unit_source_value").isNotNull()
                    & (F.col("unit_source_value") != "")
                ),
            )
        )
        # 1820: records by calendar year
        results.append(_result(1820, me, F.year("measurement_date")))
        # 1821: fully valueless records (neither numeric nor string value)
        results.append(
            _result(
                1821,
                me.where(
                    F.col("value_as_number").isNull()
                    & (
                        F.col("value_source_value").isNull()
                        | (F.col("value_source_value") == "")
                    )
                ),
            )
        )
        # 1822: concept-mapping completeness (mapped vs unmapped strata)
        results.append(
            _result(
                1822,
                me,
                F.when(
                    F.col("measurement_concept_id") == 0, F.lit("unmapped")
                ).otherwise(F.lit("mapped")),
            )
        )
        # 1823: measurements per person per YEAR (intensity dist)
        ppy = me.groupBy(
            "person_id", F.year("measurement_date").alias("__y")
        ).agg(F.count(F.lit(1)).alias("n"))
        dists.append(_dist(1823, ppy, "n", mode))
        # 1824: global numeric value dist (unstratified twin of 1815)
        dists.append(
            _dist(
                1824,
                me.where(F.col("value_as_number").isNotNull()),
                "value_as_number",
                mode,
            )
        )
        # 1825: unit usage counts
        results.append(_result(1825, me, F.col("unit_source_value")))

    vo = omop.get("omop_visit_occurrence")
    if vo is not None:
        dists.append(
            _dist(
                211,
                vo.select(
                    F.datediff("visit_end_date", "visit_start_date").alias("d")
                ),
                "d",
                mode,
            )
        )

    # 1100-series: location analyses. The dim is geography-bounded (tiny),
    # so it broadcasts onto the one-row-per-person/care-site slice; each
    # analysis is one aggregate. Requires the pipeline's omop_location
    # (derived/location.py) — exports without address columns skip them,
    # exactly like Achilles on a CDM whose location table is empty.
    locd = omop.get("omop_location")
    if locd is not None:
        loc_slim = _person_scale(locd.select("location_id", "zip", "state"))
        if "location_id" in person.columns:
            pl = person.select("person_id", "location_id").join(
                loc_slim, "location_id"
            )
            results.append(
                _result(1100, pl, F.substring(F.col("zip"), 1, 3))
            )
            results.append(_result(1101, pl, F.col("state")))
        cs = omop.get("omop_care_site")
        if cs is not None and "location_id" in cs.columns:
            csl = cs.select("care_site_id", "location_id").join(
                loc_slim, "location_id"
            )
            results.append(
                _result(1102, csl, F.substring(F.col("zip"), 1, 3))
            )
            results.append(_result(1103, csl, F.col("state")))

    # 1900: temporal record density — records per CDM table per calendar
    # month (the Atlas data-density report). stratum_1 = table,
    # stratum_2 = yyyyMM; each table contributes one map-side-combinable
    # aggregate, unioned as plan glue.
    for key, date_col in _TEMPORAL_SPECS:
        df = omop.get(key)
        if df is not None:
            results.append(
                _result(
                    1900,
                    df,
                    F.lit(key.removeprefix("omop_")),
                    _month(date_col),
                )
            )

    achilles_results = reduce(DataFrame.unionByName, results)
    if dists:
        achilles_results_dist = reduce(DataFrame.unionByName, dists)
    else:
        # person-only export: no distribution-producing tables — return an
        # EMPTY dist frame with the standard schema, not a crash
        achilles_results_dist = person.sparkSession.createDataFrame(
            [],
            "analysis_id int, stratum_1 string, count_value bigint, "
            "min_value double, p10_value double, p25_value double, "
            "median_value double, p75_value double, p90_value double, "
            "max_value double, avg_value double",
        )
    if small_cell_count > 0:
        achilles_results = achilles_results.where(
            F.col("count_value") >= small_cell_count
        )
        achilles_results_dist = achilles_results_dist.where(
            F.col("count_value") >= small_cell_count
        )
    return achilles_results, achilles_results_dist
