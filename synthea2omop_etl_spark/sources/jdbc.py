"""JDBC source/sink (SURVEY.md §2.1 S9).

The reference reads/writes PostgreSQL via psycopg2/JDBC (Achilles R client
run_achilles.sh:128-136; Express backend backend/src/index.js:17-23). The
engine's equivalent is Spark's built-in JDBC relation, wrapped to encode
the two scale decisions that matter:

- **partitioned reads**: a single-connection JDBC read is a driver
  bottleneck; partitionColumn/lowerBound/upperBound/numPartitions splits
  the table across executors.
- **batched writes**: rewriteBatchedInserts + a sane batchsize.

Tested end-to-end against embedded Apache Derby (ships in Spark's jars):
batched write → plain read → 4-way partitioned read
(tests/test_streaming_sources.py::test_jdbc_roundtrip_embedded_derby).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 16,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("fetchsize", "10000")
    )
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def write_jdbc_table(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batch_size: int = 10000,
    properties: dict[str, str] | None = None,
) -> None:
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .mode(mode)
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()
