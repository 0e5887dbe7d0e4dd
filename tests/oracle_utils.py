"""Local replica of the driver's correctness gate: run each registry query
on Spark AND its oracle SQL on DuckDB over the same parquet tables, compare
row count, column names, and (order-insensitively) values."""

from __future__ import annotations

import datetime
import math
from decimal import Decimal

import duckdb

from synthea2omop_etl_spark.sources.testdata import TABLES, table_path


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM parquet_scan('{table_path(sf_dir, name)}')"
        )
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, int):
        return int(v)
    return v


def _sortable(row):
    return tuple((x is None, str(x)) for x in row)


def compare_results(spark_df, oracle_rows, oracle_cols) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    problems: list[str] = []
    s_cols = sorted(spark_df.columns)
    o_cols = sorted(oracle_cols)
    if s_cols != o_cols:
        return [f"column mismatch: spark={s_cols} oracle={o_cols}"]

    s_idx = [spark_df.columns.index(c) for c in s_cols]
    s_rows = [
        tuple(_norm(r[i]) for i in s_idx) for r in spark_df.collect()
    ]
    o_idx = [list(oracle_cols).index(c) for c in o_cols]
    o_rows = [tuple(_norm(r[i]) for i in o_idx) for r in oracle_rows]

    if len(s_rows) != len(o_rows):
        problems.append(f"row count: spark={len(s_rows)} oracle={len(o_rows)}")

    s_sorted = sorted(s_rows, key=_sortable)
    o_sorted = sorted(o_rows, key=_sortable)
    n_diff = 0
    for a, b in zip(s_sorted, o_sorted):
        if a != b:
            ok = len(a) == len(b)
            if ok:
                for x, y in zip(a, b):
                    if isinstance(x, float) and isinstance(y, float):
                        if not math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9):
                            ok = False
                            break
                    elif x != y:
                        ok = False
                        break
            if not ok:
                n_diff += 1
                if n_diff <= 3:
                    problems.append(f"value diff: spark={a} oracle={b}")
    if n_diff > 3:
        problems.append(f"... {n_diff} differing rows total")
    return problems
