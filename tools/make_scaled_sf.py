#!/usr/bin/env python
"""Deterministic scale-up of the driver's sf0.1 testdata for scale-stress
benchmarks (VERDICT r4 next-round #3).

Replicates every fact table ``factor`` times with disjoint key offsets so
referential integrity (customer->orders->lineitem, part/supplier->lineitem)
is preserved exactly; dimension tables (region, nation) stay fixed, which is
the realistic shape: 10x the facts, same dims. Document text gets a per-copy
suffix token so the copies are *near*-duplicates (stresses MinHash/LSH the
way a real crawl does); embeddings/event timestamps are kept identical so
ANN top-k and windowed-agg density scale with the data.

The output lives under the repo (gitignored) — nothing outside /root/repo is
touched, and /root/testdata is never written. bench.py picks the directory
up automatically and emits an "sf1" section when it exists.

Usage: python tools/make_scaled_sf.py [--factor 10] [--src .../sf0.1]
                                      [--dst .scale/sf1]
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent

# Key-space offsets per replica. Chosen far above any sf0.1 max key so the
# replica id is recoverable (key // offset) and joins never collide.
OFF = {
    "c_custkey": 10_000_000,
    "o_orderkey": 100_000_000,
    "o_custkey": 10_000_000,
    "l_orderkey": 100_000_000,
    "l_partkey": 10_000_000,
    "l_suppkey": 10_000_000,
    "p_partkey": 10_000_000,
    "s_suppkey": 10_000_000,
    "doc_id": 10_000_000,
    "vec_id": 10_000_000,
    "event_id": 1_000_000_000,
    "user_id": 10_000_000,
}

# Columns whose parquet type must stay int32 to match the source schema.
INT32 = {"c_nationkey", "n_nationkey", "n_regionkey", "r_regionkey",
         "s_nationkey", "p_size", "l_linenumber", "label"}

COPY_AS_IS = ["region", "nation"]
SCALED = ["customer", "supplier", "part", "orders", "lineitem",
          "events", "documents", "embeddings"]


def scaled_select(con, src_file: str, table: str, factor: int) -> str:
    cols = [r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM read_parquet('{src_file}')").fetchall()]
    exprs = []
    for c in cols:
        if c in OFF:
            exprs.append(f"({c} + i * {OFF[c]})::BIGINT AS {c}")
        elif table == "documents" and c == "text":
            # Near-duplicate copies: one extra trailing token per replica.
            exprs.append(
                "CASE WHEN i = 0 THEN text ELSE text || ' rep' || i END AS text")
        elif c in INT32:
            exprs.append(f"{c}::INTEGER AS {c}")
        else:
            exprs.append(c)
    return (f"SELECT {', '.join(exprs)} FROM read_parquet('{src_file}'), "
            f"range({factor}) r(i)")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default=str(REPO / ".scale" / "sf1"))
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()

    os.makedirs(args.dst, exist_ok=True)
    con = duckdb.connect()
    for t in COPY_AS_IS:
        src = f"{args.src}/{t}.parquet"
        con.execute(f"COPY (SELECT * FROM read_parquet('{src}')) TO "
                    f"'{args.dst}/{t}.parquet' (FORMAT PARQUET)")
    for t in SCALED:
        src = f"{args.src}/{t}.parquet"
        sel = scaled_select(con, src, t, args.factor)
        con.execute(f"COPY ({sel}) TO '{args.dst}/{t}.parquet' "
                    f"(FORMAT PARQUET, ROW_GROUP_SIZE 200000)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{args.dst}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows")
    print(f"done -> {args.dst}")


if __name__ == "__main__":
    main()
