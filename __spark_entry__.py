"""Driver contract for the spark-graft builder (PySpark target).

Delegates to synthea2omop_etl_spark.queries — the engine's graded query
registry (one entry per operator family from SURVEY.md §2 plus the
beyond-reference llm_ops). See that module for the determinism rules shared
by the Spark and oracle sides.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from synthea2omop_etl_spark.queries import (  # noqa: E402
    flagship,
    oracle_queries,
    spark_queries,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return spark_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents (omitted → rows-only check)."""
    return oracle_queries()
