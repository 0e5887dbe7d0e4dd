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
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from synthea2omop_etl_spark.domains import person as person_transform
from synthea2omop_etl_spark.operators.idmap import build_id_map
from synthea2omop_etl_spark.operators.typing import apply_typing
from synthea2omop_etl_spark.schemas import TYPING_SPECS
from synthea2omop_etl_spark.sources.writers import (
    insert_if_absent,
    read_bucket_pruned,
)

#: raw Synthea patients header (all-string contract, FIXTURES.md)
PATIENT_RAW_COLUMNS = [
    "Id", "BIRTHDATE", "DEATHDATE", "MARITAL", "RACE", "ETHNICITY",
    "GENDER", "HEALTHCARE_EXPENSES", "CITY", "STATE", "ZIP",
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
    n_buckets: int = 32,
) -> StreamingQuery:
    """Stream raw patients rows into ``omop_person`` + the person map.

    Each micro-batch: cast-or-null typing → extend the persistent person
    map (stable ids for seen patients, fresh dense ids for new ones) →
    person transform → insert-if-absent upsert. Both writes are keyed on
    the patient UUID, so replays are no-ops.

    Both layers are hash-bucketed on their key (``__bucket=K/`` partition
    dirs): every per-batch map re-read prunes to the buckets the batch's
    keys actually hash into — the header's "existing-table side prunes by
    partition/bucket" promise made real. The one full-layer touch left is
    build_id_map's max-id aggregate (column-pruned to the id column).
    """
    import os

    map_path = os.path.join(output_dir, "person_map")
    person_path = os.path.join(output_dir, "omop_person")
    loc_path = os.path.join(output_dir, "omop_location")

    def process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        # In-batch dedupe: availableNow can consume several landed files in
        # one trigger, and insert_if_absent only anti-joins against rows
        # ALREADY written — a duplicate Id inside one micro-batch would
        # otherwise yield two omop_person rows.
        typed = apply_typing(batch, TYPING_SPECS["patients"]).dropDuplicates(
            ["Id"]
        )
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
        insert_if_absent(
            spark, pm, map_path, ["patient_uuid"],
            bucket_key="patient_uuid", n_buckets=n_buckets,
        )
        # transform against the WRITTEN map (ids are now durable); the
        # batch only needs ITS patients' ids → bucket-pruned read
        batch_map = read_bucket_pruned(
            spark, map_path, "patient_uuid",
            typed.selectExpr("Id as patient_uuid"), n_buckets,
        )
        rows = person_transform(typed, batch_map)
        # location dim, incrementally: distinct address keys extend a
        # persistent location map exactly like the person map (stable ids
        # for seen addresses, dense new ids above the max — arrival-order
        # semantics; the batch pipeline's ids are global-sort-order, so
        # ids differ across the two paths but the ADDRESS each person
        # resolves to is identical).
        from synthea2omop_etl_spark.derived.location import (
            attach_location_id,
            location as build_location,
        )

        loc = build_location(typed)
        if loc is not None:
            from synthea2omop_etl_spark.derived.location import _address_key

            addr_cols = [c for c in loc.columns if c != "location_id"]
            # _read_layer_or_none distinguishes "layer absent" from a real
            # read failure — a blanket except here restarted location_id
            # assignment at offset 0 on any transient error, colliding
            # fresh ids with committed ones.
            from synthea2omop_etl_spark.sources.writers import (
                _read_layer_or_none,
            )

            existing_loc = _read_layer_or_none(spark, loc_path)
            offset = (
                existing_loc.agg(F.max("location_id")).collect()[0][0] or 0
            ) if existing_loc is not None else 0
            if existing_loc is not None:
                from synthea2omop_etl_spark.operators.idmap import (
                    assign_dense_ids,
                )

                # anti-join on the NULL-safe derived key, NOT the raw
                # address columns — an equi-join on a NULLable column
                # (address_1, county) never matches NULL=NULL, which
                # re-inserted every half-empty address each wave and
                # fanned out the attach join downstream
                new_addrs = loc.select(*addr_cols).withColumn(
                    "__key", _address_key()
                ).join(
                    existing_loc.withColumn(
                        "__key", _address_key()
                    ).select("__key"),
                    "__key", "left_anti",
                )
                loc = assign_dense_ids(
                    new_addrs, "__key", "location_id", offset=offset,
                ).drop("__key").select("location_id", *addr_cols)
            # id assignment is deterministic (key-ordered above the durable
            # max), so a crash-replay recomputes identical rows and the
            # id-keyed anti-join makes the write a no-op
            insert_if_absent(spark, loc, loc_path, ["location_id"])
            full_loc = spark.read.parquet(loc_path)
            rows = attach_location_id(rows, typed, full_loc)
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
    n_buckets: int = 32,
) -> StreamingQuery:
    """Stream raw encounters rows into ``omop_visit_occurrence`` + the
    visit map, linking against the (already-streamed) person map.

    The cross-map dependency of the batch DAG, incrementally: encounters
    whose patient has not arrived yet are HELD in a ``pending_encounters``
    layer and re-driven on every subsequent micro-batch — once the patient
    lands, the held encounter materializes on the next trigger. This closes
    the semantic gap with the reference's re-run INSERT..SELECT
    (etl_pipeline/etl_setup.py:230-279 resume semantics): the batch DAG
    would pick such encounters up on a re-run, and now the stream does too,
    without losing them to the file-source checkpoint.
    """
    import os

    from synthea2omop_etl_spark.domains import visit_occurrence
    from synthea2omop_etl_spark.sources.writers import write_then_swap

    vm_path = os.path.join(output_dir, "visit_map")
    pm_path = os.path.join(output_dir, "person_map")
    visit_path = os.path.join(output_dir, "omop_visit_occurrence")
    pending_path = os.path.join(output_dir, "pending_encounters")

    def process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        typed = apply_typing(batch, TYPING_SPECS["encounters"]).dropDuplicates(
            ["Id"]
        )
        # Re-drive encounters held from earlier micro-batches (arrival-order
        # ties broken toward the fresh batch, but rows are identical by Id).
        try:
            pending = spark.read.parquet(pending_path)
            candidates = typed.unionByName(pending).dropDuplicates(["Id"])
        except Exception:  # no pending layer yet
            candidates = typed
        # A missing person map means NO patient has arrived — every
        # encounter is an orphan, not a crash (the map read used to throw
        # and fail the whole streaming query while the file source had
        # already checkpointed the batch as consumed). The read prunes to
        # the hash buckets of the batch's PATIENT keys (bucketed layer).
        try:
            person_map = read_bucket_pruned(
                spark, pm_path, "patient_uuid",
                candidates.selectExpr("PATIENT as patient_uuid"), n_buckets,
            )
        except Exception:
            person_map = spark.createDataFrame(
                [],
                T.StructType(
                    [
                        T.StructField("patient_uuid", T.StringType()),
                        T.StructField("person_id", T.LongType()),
                    ]
                ),
            )
        pm_keys = person_map.select(F.col("patient_uuid").alias("PATIENT"))
        matched = candidates.join(pm_keys, on="PATIENT", how="left_semi")
        orphans = candidates.join(pm_keys, on="PATIENT", how="left_anti")
        try:
            existing = spark.read.parquet(vm_path)
        except Exception:
            existing = None
        # Ids are assigned on MATERIALIZATION (patient present), so a held
        # encounter numbers after everything that landed while it waited —
        # the same arrival-order semantics as the reference's sequence.
        vm = build_id_map(
            matched.selectExpr("Id as encounter_uuid"),
            "encounter_uuid",
            "visit_occurrence_id",
            existing_map=existing,
        )
        insert_if_absent(
            spark, vm, vm_path, ["encounter_uuid"],
            bucket_key="encounter_uuid", n_buckets=n_buckets,
        )
        try:
            # the transform only needs THIS batch's encounter ids →
            # bucket-pruned read of the just-extended map
            batch_vm = read_bucket_pruned(
                spark, vm_path, "encounter_uuid",
                matched.selectExpr("Id as encounter_uuid"), n_buckets,
            )
        except Exception:  # nothing materialized yet (all-orphan batch)
            batch_vm = vm
        rows = visit_occurrence(matched, batch_vm, person_map, None, None)
        insert_if_absent(spark, rows, visit_path, ["visit_source_value"])
        # Persist the new holding set last: on a crash-replay the matched
        # rows above no-op via insert_if_absent and this set is recomputed.
        write_then_swap(orphans, pending_path)

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
