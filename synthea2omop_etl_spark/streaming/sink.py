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


def stream_merge_sink(
    stream: DataFrame,
    table_path: str,
    keys: list[str],
    checkpoint_dir: str,
    available_now: bool = True,
    delete_missing: bool = False,
) -> StreamingQuery:
    """Apply a change stream to a versioned table by MERGE — the CDC-apply
    path: each micro-batch's rows UPDATE matching keys and INSERT new
    ones (sources/versioned.merge_into), so the table converges on the
    latest value per key instead of accreting duplicates the way an
    append sink would.

    Replay guard: same batch-id high-water-mark as stream_versioned_sink
    — a replayed batch (same or fresh checkpoint) is a no-op, which makes
    the merge exactly-once. Within a batch, duplicate keys are collapsed
    to the LAST row per key in source order before merging (a change
    stream's later row supersedes its earlier one; merge_into would
    reject the ambiguity otherwise).

    Cost note: merge commits an overwrite version, so each micro-batch
    rewrites the table — right for dimension-sized CDC targets; for
    fact-sized append-mostly streams use stream_versioned_sink or
    stream_upsert instead.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from synthea2omop_etl_spark.sources import versioned as V

    def apply(batch: DataFrame, batch_id: int) -> None:
        versions = V.list_versions(table_path)
        if versions:
            last = V.read_manifest(table_path, versions[-1]).get("batch_id")
            if last is not None and batch_id <= last:
                return
        if batch.isEmpty():
            return
        w = F.row_number().over(
            Window.partitionBy(*keys).orderBy(
                F.monotonically_increasing_id().desc()
            )
        )
        deduped = (
            batch.withColumn("__rn", w).where(F.col("__rn") == 1).drop("__rn")
        )
        if not versions:
            V.commit_version(
                deduped, table_path, mode="overwrite",
                extra={"batch_id": batch_id},
            )
            return
        V.merge_into(
            batch.sparkSession, table_path, deduped, keys,
            delete_missing=delete_missing,
            extra={"batch_id": batch_id},
        )

    writer = stream.writeStream.foreachBatch(apply).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
