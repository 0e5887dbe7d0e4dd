"""Streaming sinks: exactly-once upsert into a parquet table.

The reference's loaders are batch INSERT .. WHERE NOT EXISTS
(etl_pipeline/etl_patients.py:202-209 shape); this is the streaming twin:
``foreachBatch`` + the batch insert-if-absent operator, which makes the
sink idempotent under micro-batch REPLAY — the standard Structured
Streaming exactly-once recipe (checkpointed source offsets + idempotent
sink). A re-delivered micro-batch finds its keys already present and
writes nothing.

At scale the anti-join probe side is the (bounded) new-keys batch and the
existing table is pruned by partition/bucket on the key — the same
NOT-EXISTS shape the batch operator already plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from synthea2omop_etl_spark.sources.writers import insert_if_absent


def stream_upsert(
    stream: DataFrame,
    target_path: str,
    key_cols: list[str],
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Write a stream into a parquet table, inserting only rows whose key
    is not already present (exactly-once under replay).

    Returns the started query; callers await ``.awaitTermination()``.
    """

    def upsert(batch: DataFrame, batch_id: int) -> None:
        insert_if_absent(batch.sparkSession, batch, target_path, key_cols)

    writer = stream.writeStream.foreachBatch(upsert).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_versioned_sink(
    stream: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Commit each micro-batch as a new version of a versioned table
    (sources/versioned.py) — a streaming sink with TIME TRAVEL: every
    trigger's output is a readable snapshot, a bad batch is one
    metadata-only ``rollback`` away, and downstream consumers pin a
    version instead of racing the stream.

    Exactly-once: Structured Streaming replays a failed micro-batch with
    the SAME batch_id. Each manifest records its batch_id; batch ids are
    monotonic per checkpoint, so "batch_id <= the latest manifest's" means
    this batch already committed — skip it (O(1) high-water-mark probe, no
    manifest scan). Empty batches are skipped to keep history meaningful.
    """
    from synthea2omop_etl_spark.sources import versioned as V

    def commit(batch: DataFrame, batch_id: int) -> None:
        versions = V.list_versions(table_path)
        if versions:
            last = V.read_manifest(table_path, versions[-1]).get("batch_id")
            if last is not None and batch_id <= last:
                return  # replayed micro-batch: already committed
        if not batch.isEmpty():
            V.commit_version(
                batch, table_path, mode="append", extra={"batch_id": batch_id}
            )

    writer = stream.writeStream.foreachBatch(commit).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
