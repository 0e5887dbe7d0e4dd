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
