"""Incremental (streaming) Synthea→OMOP ETL.

The reference pipeline is batch-only: a full directory of CSVs in, a full
CDM out (SURVEY.md §3.1). This module is the beyond-parity incremental
twin for the landing-zone pattern — Synthea export files DROP into a
directory over time, and each arrival flows through typing → id mapping →
domain transform → idempotent upsert without reprocessing history:

- the file source checkpoints which CSVs were consumed (exactly-once
  source side);
- the person map is EXTENDED per micro-batch with ``build_id_map``'s
  ``existing_map`` path — already-seen patients keep their dense ids, new
  patients get ids above the current max (the reference's
  ``INSERT .. WHERE NOT EXISTS`` + ``nextval(seq)``,
  etl_pipeline/etl_patients.py:202-209, incrementally);
- outputs land via ``insert_if_absent`` keyed on the source UUID, so a
  REPLAYED micro-batch (crash between map write and person write) inserts
  nothing twice — idempotent-sink exactly-once.

Id determinism: like the reference's sequence, ids depend on ARRIVAL
order (batch N's new patients number after batch N-1's). Within one
micro-batch ids are deterministic (ordered by source UUID).

At scale: each micro-batch is bounded (new files only); the anti-join
probe side is the batch, and the existing-table side prunes by
partition/bucket on the key. The one full-table touch is the max-id
lookup, an aggregate over the (patients-sized, not events-sized) map.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from synthea2omop_etl_spark.domains import person as person_transform
from synthea2omop_etl_spark.operators.idmap import build_id_map
from synthea2omop_etl_spark.operators.typing import apply_typing
from synthea2omop_etl_spark.schemas import TYPING_SPECS
from synthea2omop_etl_spark.sources.writers import insert_if_absent

#: raw Synthea patients header (all-string contract, FIXTURES.md)
PATIENT_RAW_COLUMNS = [
    "Id", "BIRTHDATE", "DEATHDATE", "MARITAL", "RACE", "ETHNICITY",
    "GENDER", "HEALTHCARE_EXPENSES",
]

#: raw Synthea encounters header (FIXTURES.md)
ENCOUNTER_RAW_COLUMNS = [
    "Id", "START", "STOP", "PATIENT", "ENCOUNTERCLASS", "CODE",
    "TOTAL_CLAIM_COST", "PAYER_COVERAGE", "PROVIDER", "ORGANIZATION",
]


def read_csv_stream(
    spark: SparkSession,
    csv_dir: str,
    columns: list[str],
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over a landing directory of Synthea CSVs
    (all-string schema — the same raw contract as the batch reader)."""
    schema = T.StructType([T.StructField(c, T.StringType()) for c in columns])
    reader = spark.readStream.schema(schema).option("header", "true")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.csv(csv_dir)


def read_patients_stream(
    spark: SparkSession,
    csv_dir: str,
    columns: list[str] | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    return read_csv_stream(
        spark, csv_dir, columns or PATIENT_RAW_COLUMNS, max_files_per_trigger
    )


def incremental_person_etl(
    stream: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Stream raw patients rows into ``omop_person`` + the person map.

    Each micro-batch: cast-or-null typing → extend the persistent person
    map (stable ids for seen patients, fresh dense ids for new ones) →
    person transform → insert-if-absent upsert. Both writes are keyed on
    the patient UUID, so replays are no-ops.
    """
    import os

    map_path = os.path.join(output_dir, "person_map")
    person_path = os.path.join(output_dir, "omop_person")

    def process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        typed = apply_typing(batch, TYPING_SPECS["patients"])
        try:
            existing = spark.read.parquet(map_path)
        except Exception:  # first batch: no map yet
            existing = None
        pm = build_id_map(
            typed.selectExpr("Id as patient_uuid"),
            "patient_uuid",
            "person_id",
            existing_map=existing,
        )
        insert_if_absent(spark, pm, map_path, ["patient_uuid"])
        # transform against the WRITTEN map (ids are now durable)
        full_map = spark.read.parquet(map_path)
        rows = person_transform(typed, full_map)
        insert_if_absent(spark, rows, person_path, ["person_source_value"])

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def incremental_visit_etl(
    stream: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Stream raw encounters rows into ``omop_visit_occurrence`` + the
    visit map, linking against the (already-streamed) person map.

    The cross-map dependency of the batch DAG, incrementally: encounters
    whose patient has not arrived yet are DROPPED by the person inner
    join (the reference's INSERT..SELECT semantics) — in a production
    landing zone patients stream ahead of their encounters, and a late
    patient's encounters arrive in a later file anyway.
    """
    import os

    from synthea2omop_etl_spark.domains import visit_occurrence

    vm_path = os.path.join(output_dir, "visit_map")
    pm_path = os.path.join(output_dir, "person_map")
    visit_path = os.path.join(output_dir, "omop_visit_occurrence")

    def process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        typed = apply_typing(batch, TYPING_SPECS["encounters"])
        try:
            existing = spark.read.parquet(vm_path)
        except Exception:
            existing = None
        vm = build_id_map(
            typed.selectExpr("Id as encounter_uuid"),
            "encounter_uuid",
            "visit_occurrence_id",
            existing_map=existing,
        )
        insert_if_absent(spark, vm, vm_path, ["encounter_uuid"])
        full_vm = spark.read.parquet(vm_path)
        person_map = spark.read.parquet(pm_path)
        rows = visit_occurrence(typed, full_vm, person_map, None, None)
        insert_if_absent(spark, rows, visit_path, ["visit_source_value"])

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
