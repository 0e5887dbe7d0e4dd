"""SparkSession factory.

One place to encode the engine's execution-model choices:

- AQE on (runtime re-plan replaces the reference's manual ANALYZE +
  batch-size tuning, see SURVEY.md §4).
- ``spark.sql.shuffle.partitions`` sized to the local core count for tests;
  on a real cluster this is overridden by AQE coalescing anyway.
- Session timezone pinned to UTC (the reference's ``::date`` semantics are
  session-TZ dependent; we document-and-pin, SURVEY.md §7.3).
- ANSI off: the engine's core semantic is cast-or-null, never cast-or-error
  (reference guards every cast with a regex; typing sql:34-60).
- Arrow on for the few Pandas-UDF paths (malformed-CSV repair, embeddings).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "synthea2omop_etl_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Defaults are local-mode friendly but every setting is what we'd ship on a
    1000-executor cluster except ``master`` and driver memory.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(max(cpus, 8)))
        )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # The testdata events table stores TIMESTAMP(NANOS) which Spark's
        # vectorized reader rejects; read as long and convert in the loader.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # files.maxPartitionBytes default 128m is right for the 100 TB target;
        # keep explicit so it is a documented, reviewed choice.
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/spark-warehouse"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)

    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
