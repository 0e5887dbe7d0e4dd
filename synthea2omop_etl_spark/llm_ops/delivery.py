"""Training-data delivery: the last mile from curated corpus to the
files a pretraining loader reads.

Composes the existing stages into one flow and adds the shard writer:

1. shuffle  — seeded deterministic global order (curation.shuffle_positions:
              hash-rank, no single-task sort; a new seed is a new epoch)
2. pack     — concat-and-chunk token spans at ``seq_len``
              (packing.concat_and_chunk), sharded by a hash bucket of the
              shuffle position so packing parallelism is explicit
3. export   — sharded parquet, bounded rows per file
              (``maxRecordsPerFile``), files laid out so that reading
              shard directories in name order replays the shuffle order

Why files-per-shard matters at 100 TB: data loaders stream shards
sequentially and assign them round-robin to workers; thousands of
similar-size files = even worker progress, one giant file = one straggler
worker. ``records_per_file`` bounds loader memory; ``n_buckets`` bounds
the packer's window state per task.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from synthea2omop_etl_spark.llm_ops.curation import shuffle_positions
from synthea2omop_etl_spark.llm_ops.packing import concat_and_chunk
from synthea2omop_etl_spark.llm_ops.text import token_count


def export_shards(
    df: DataFrame,
    path: str,
    order_col: str,
    n_shards: int,
    records_per_file: int = 10_000,
) -> None:
    """Write ``df`` as ``n_shards`` contiguous ranges of ``order_col``
    (shard 0 holds the lowest positions), each range sorted within and
    split into ≤ ``records_per_file``-row files.

    repartitionByRange gives contiguous, roughly equal shards with ONE
    exchange; ``maxRecordsPerFile`` caps file size without another
    shuffle. Reading ``shard=*`` dirs in name order replays the global
    order.
    """
    (
        df.repartitionByRange(n_shards, F.col(order_col))
        .sortWithinPartitions(order_col)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", records_per_file)
        .parquet(path)
    )


def deliver_corpus(
    spark: SparkSession,
    docs: DataFrame,
    output_dir: str,
    seq_len: int = 2048,
    seed: str = "epoch0",
    n_buckets: int = 32,
    n_shards: int = 8,
    records_per_file: int = 10_000,
) -> dict:
    """Shuffle → pack → export. Returns an accounting report.

    Input needs (doc_id, text). Output layout:
      ``spans/``  — (bucket, doc_id, shuffle_pos, n_tokens, start_tok,
                    end_tok, first_chunk, last_chunk): where each doc
                    lands in the fixed-``seq_len`` token stream of its
                    bucket, in shuffled order.
    The span table IS the delivery manifest: a loader materializes
    chunk k of bucket b by reading the docs with
    first_chunk <= k <= last_chunk — no text is duplicated into padded
    context files (that expansion belongs on the loader side).
    """
    pos = shuffle_positions(docs, "doc_id", seed=seed)
    keyed = (
        docs.select("doc_id", token_count("text").alias("n_tokens"))
        .join(pos, "doc_id")
        .withColumn("bucket", F.pmod(F.col("shuffle_pos"), F.lit(n_buckets)))
    )
    spans = concat_and_chunk(
        keyed,
        "doc_id",
        "n_tokens",
        seq_len,
        shard_cols=["bucket"],
        order_col="shuffle_pos",
    ).join(keyed.select("doc_id", "shuffle_pos", "n_tokens"), "doc_id")
    spans_path = os.path.join(output_dir, "spans")
    export_shards(
        spans, spans_path, "shuffle_pos", n_shards, records_per_file
    )
    written = spark.read.parquet(spans_path)
    agg = written.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.countDistinct("bucket").alias("n_buckets"),
        (F.max("last_chunk") + 1).alias("max_chunks_per_bucket"),
    ).collect()[0]
    return {
        "n_docs": int(agg["n_docs"]),
        "total_tokens": int(agg["total_tokens"] or 0),
        "n_buckets": int(agg["n_buckets"]),
        "seq_len": seq_len,
        "n_files": len(written.inputFiles()),
    }
