"""Deterministic synthetic Synthea-shaped raw tables for ETL benchmarking.

Generated entirely with spark.range + column expressions (no driver loops,
no RNG state): row i's attributes derive from xxhash64(i), so any scale is
reproducible and generation runs at cluster speed. Shapes follow
FIXTURES.md (all-string columns, the real ingest contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _uuid_from(col):
    h = F.lower(F.hex(F.abs(F.xxhash64(col))))
    pad = F.lpad(h, 32, "0")
    return F.concat_ws(
        "-",
        F.substring(pad, 1, 8),
        F.substring(pad, 9, 4),
        F.substring(pad, 13, 4),
        F.substring(pad, 17, 4),
        F.substring(pad, 21, 12),
    )


def synth_raw_tables(
    spark: SparkSession, n_patients: int = 10_000
) -> dict[str, DataFrame]:
    """Raw all-string tables: ~2 encounters, 3 conditions, 2 medications,
    2 procedures, 8 observations per patient."""
    pat = spark.range(n_patients).select(
        _uuid_from(F.col("id")).alias("Id"),
        F.date_format(
            F.date_add(F.lit("1940-01-01").cast("date"), (F.pmod(F.xxhash64("id"), 25000)).cast("int")),
            "yyyy-MM-dd",
        ).alias("BIRTHDATE"),
        F.when(F.pmod(F.xxhash64("id", F.lit(1)), 20) == 0,
               F.lit("2020-06-30")).otherwise(F.lit("")).alias("DEATHDATE"),
        F.element_at(
            F.array(F.lit("M"), F.lit("S"), F.lit("D"), F.lit("W")),
            (F.pmod(F.xxhash64("id", F.lit(2)), 4) + 1).cast("int"),
        ).alias("MARITAL"),
        F.element_at(
            F.array(*[F.lit(x) for x in ("white", "black", "asian", "native", "hawaiian", "other")]),
            (F.pmod(F.xxhash64("id", F.lit(3)), 6) + 1).cast("int"),
        ).alias("RACE"),
        F.element_at(
            F.array(F.lit("hispanic"), F.lit("nonhispanic")),
            (F.pmod(F.xxhash64("id", F.lit(4)), 2) + 1).cast("int"),
        ).alias("ETHNICITY"),
        F.element_at(
            F.array(F.lit("M"), F.lit("F")),
            (F.pmod(F.xxhash64("id", F.lit(5)), 2) + 1).cast("int"),
        ).alias("GENDER"),
        (F.pmod(F.xxhash64("id", F.lit(6)), 100000) / 100).cast("string").alias("HEALTHCARE_EXPENSES"),
    )

    def fact(mult: int, seed: int):
        return spark.range(n_patients * mult).select(
            F.col("id"),
            _uuid_from(F.pmod(F.col("id"), n_patients)).alias("PATIENT"),
            _uuid_from(F.xxhash64("id", F.lit(seed))).alias("ENC_ID"),
            F.date_format(
                F.date_add(
                    F.lit("2010-01-01").cast("date"),
                    (F.pmod(F.xxhash64("id", F.lit(seed + 1)), 4000)).cast("int"),
                ),
                "yyyy-MM-dd HH:mm:ss",
            ).alias("TS"),
            F.pmod(F.xxhash64("id", F.lit(seed + 2)), 1000).alias("H"),
        )

    enc = fact(2, 10).select(
        F.col("ENC_ID").alias("Id"),
        F.col("TS").alias("START"),
        F.col("TS").alias("STOP"),
        "PATIENT",
        F.element_at(
            F.array(*[F.lit(x) for x in ("ambulatory", "emergency", "inpatient", "wellness", "urgentcare", "outpatient")]),
            (F.pmod(F.col("H"), 6) + 1).cast("int"),
        ).alias("ENCOUNTERCLASS"),
        (F.col("H") + 100000).cast("string").alias("CODE"),
        (F.col("H") / 2 + 50).cast("string").alias("TOTAL_CLAIM_COST"),
        (F.col("H") / 4).cast("string").alias("PAYER_COVERAGE"),
    )
    # facts reference encounter uuids from the same hash space
    cond = fact(3, 20).select(
        F.substring("TS", 1, 10).alias("START"),
        F.lit("").alias("STOP"),
        "PATIENT",
        _uuid_from(F.xxhash64(F.pmod(F.col("id"), n_patients * 2), F.lit(10))).alias("ENCOUNTER"),
        (F.col("H") + 200000).cast("string").alias("CODE"),
        F.lit("condition").alias("DESCRIPTION"),
    )
    meds = fact(2, 30).select(
        F.col("TS").alias("START"),
        F.lit("").alias("STOP"),
        "PATIENT",
        _uuid_from(F.xxhash64(F.pmod(F.col("id"), n_patients * 2), F.lit(10))).alias("ENCOUNTER"),
        (F.col("H") + 300000).cast("string").alias("CODE"),
        (F.col("H") / 3).cast("string").alias("TOTALCOST"),
        (F.col("H") / 6).cast("string").alias("PAYER_COVERAGE"),
        F.pmod(F.col("H"), 5).cast("string").alias("DISPENSES"),
    )
    proc = fact(2, 40).select(
        F.col("TS").alias("DATE"),
        "PATIENT",
        _uuid_from(F.xxhash64(F.pmod(F.col("id"), n_patients * 2), F.lit(10))).alias("ENCOUNTER"),
        (F.col("H") + 400000).cast("string").alias("CODE"),
        (F.col("H") / 5).cast("string").alias("BASE_COST"),
    )
    obs = fact(8, 50).select(
        F.col("TS").alias("DATE"),
        "PATIENT",
        _uuid_from(F.xxhash64(F.pmod(F.col("id"), n_patients * 2), F.lit(10))).alias("ENCOUNTER"),
        F.element_at(
            F.array(*[F.lit(x) for x in ("vital-signs", "laboratory", "survey", "social-history")]),
            (F.pmod(F.col("H"), 4) + 1).cast("int"),
        ).alias("CATEGORY"),
        F.element_at(
            F.array(*[F.lit(x) for x in ("8302-2", "8867-4", "8480-6", "2093-3", "72166-2")]),
            (F.pmod(F.col("H"), 5) + 1).cast("int"),
        ).alias("CODE"),
        F.when(F.pmod(F.col("H"), 4) == 3, F.lit("Never smoker"))
        .otherwise((F.col("H") / 7).cast("string"))
        .alias("VALUE"),
        F.lit("cm").alias("UNITS"),
        F.when(F.pmod(F.col("H"), 4) == 3, F.lit("text"))
        .otherwise(F.lit("numeric"))
        .alias("TYPE"),
    )
    # Provider/organization dims + immunizations: exercises the id-map
    # broadcast joins for provider_id/care_site_id and the
    # immunizations→drug_exposure union/anti-join — the full reference
    # workload, not just the core five domains.
    n_orgs = max(1, n_patients // 200)
    orgs = spark.range(n_orgs).select(
        _uuid_from(F.xxhash64("id", F.lit(60))).alias("Id"),
        F.concat(F.lit("Org "), F.col("id")).alias("NAME"),
        F.lit("Boston").alias("CITY"),
        F.lit("42.36").alias("LAT"),
        F.lit("-71.06").alias("LON"),
        (F.pmod(F.xxhash64("id", F.lit(61)), 1000000)).cast("string").alias("REVENUE"),
        F.pmod(F.xxhash64("id", F.lit(62)), 500).cast("string").alias("UTILIZATION"),
    )
    n_prov = max(1, n_patients // 100)
    prov = spark.range(n_prov).select(
        _uuid_from(F.xxhash64("id", F.lit(70))).alias("Id"),
        _uuid_from(F.xxhash64(F.pmod(F.col("id"), n_orgs), F.lit(60))).alias(
            "ORGANIZATION"
        ),
        F.concat(F.lit("Dr "), F.col("id")).alias("NAME"),
        F.element_at(
            F.array(F.lit("M"), F.lit("F")),
            (F.pmod(F.xxhash64("id", F.lit(71)), 2) + 1).cast("int"),
        ).alias("GENDER"),
        F.lit("GENERAL PRACTICE").alias("SPECIALITY"),
        F.pmod(F.xxhash64("id", F.lit(72)), 5000).cast("string").alias("ENCOUNTERS"),
        F.pmod(F.xxhash64("id", F.lit(73)), 900).cast("string").alias("PROCEDURES"),
    )
    dev = fact(1, 90).select(
        F.col("TS").alias("START"),
        F.when(F.pmod(F.col("H"), 3) == 0, F.col("TS"))
        .otherwise(F.lit(""))
        .alias("STOP"),
        "PATIENT",
        _uuid_from(F.xxhash64(F.pmod(F.col("id"), n_patients * 2), F.lit(10))).alias("ENCOUNTER"),
        (F.col("H") + 500000).cast("string").alias("CODE"),
        F.lit("device").alias("DESCRIPTION"),
        F.concat(F.lit("UDI-"), F.col("id")).alias("UDI"),
    )
    exp = spark.range(n_patients * 3).select(
        _uuid_from(F.pmod(F.col("id"), n_patients)).alias("PATIENT"),
        (F.lit(2018) + F.floor(F.col("id") / n_patients)).cast("string").alias("YEAR"),
        (F.pmod(F.xxhash64("id", F.lit(91)), 100000) / 10).cast("string").alias("HEALTHCARE_EXPENSES"),
        (F.pmod(F.xxhash64("id", F.lit(92)), 50000) / 10).cast("string").alias("INSURANCE_COSTS"),
        (F.pmod(F.xxhash64("id", F.lit(93)), 80000) / 10).cast("string").alias("COVERED_COSTS"),
    )
    imm = fact(1, 80).select(
        F.substring("TS", 1, 10).alias("DATE"),
        "PATIENT",
        _uuid_from(F.xxhash64(F.pmod(F.col("id"), n_patients * 2), F.lit(10))).alias("ENCOUNTER"),
        F.element_at(
            F.array(F.lit("140"), F.lit("08"), F.lit("62"), F.lit("113")),
            (F.pmod(F.col("H"), 4) + 1).cast("int"),
        ).alias("CODE"),
        F.lit("vaccine").alias("DESCRIPTION"),
        (F.col("H") / 7 + 5).cast("string").alias("BASE_COST"),
    )
    return {
        "patients": pat,
        "encounters": enc,
        "conditions": cond,
        "medications": meds,
        "procedures": proc,
        "observations": obs,
        "organizations": orgs,
        "providers": prov,
        "immunizations": imm,
        "devices": dev,
        "patient_expenses": exp,
    }


def total_source_rows(n_patients: int) -> int:
    # core six (1+2+3+2+2+8 per patient) + immunizations (1) + devices (1)
    # + patient_expenses (3) + the small provider/organization dims
    return (
        n_patients * (1 + 2 + 3 + 2 + 2 + 8 + 1 + 1 + 3)
        + max(1, n_patients // 100)
        + max(1, n_patients // 200)
    )
