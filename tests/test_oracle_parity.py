"""Per-query Spark-vs-DuckDB parity — the local replica of the driver gate.

Runs at sf0.001 by default (fast); set SPARK_GRAFT_PARITY_SF=/root/testdata/sf0.01
to mirror the driver exactly.
"""

from __future__ import annotations

import os

import pytest

from synthea2omop_etl_spark.queries import QUERIES
from tests.oracle_utils import compare_results, duckdb_connection

PARITY_SF = os.environ.get("SPARK_GRAFT_PARITY_SF", "/root/testdata/sf0.001")

ORACLE_QUERIES = sorted(n for n, s in QUERIES.items() if s.oracle)
ROWS_ONLY_QUERIES = sorted(n for n, s in QUERIES.items() if not s.oracle)


@pytest.fixture(scope="module")
def duck():
    con = duckdb_connection(PARITY_SF)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, duck, name):
    spec = QUERIES[name]
    sdf = spec.spark(spark, PARITY_SF)
    res = duck.execute(spec.oracle)
    cols = [d[0] for d in res.description]
    rows = res.fetchall()
    problems = compare_results(sdf, rows, cols)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_queries_run(spark, name):
    spec = QUERIES[name]
    df = spec.spark(spark, PARITY_SF)
    assert df.count() >= 0
    assert len(df.columns) > 0
