#!/usr/bin/env python
"""OMOP-core scale rehearsal (VERDICT r10 item 4): measure the product's
center — the full ETL pipeline (etl_synthea_pipeline) and the fused
Achilles default-analysis pass (run_default_analyses) — at 10x and 100x
the graded bench scale (50k synthetic patients) and record the scaling
exponents in BENCH_SF10.json alongside the r10 llm/graph rehearsal.

Methodology (the r10 rehearsal precedent): one small warm-up run pays
codegen/JIT off the clock; each scale point is then a single timed run —
runtimes are minutes, far outside the jitter band median-of-3 exists
for. exponent = log10(t_100x / t_10x) over a 10x data ratio; 1.0 =
linear in data size. Driver memory is raised to 48g because a single
local JVM concentrates what a cluster spreads across executors.

Usage: python tools/omop_scale_rehearsal.py [--n1 500000] [--n10 5000000]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")


def measure(spark, n_patients: int) -> tuple[float, float]:
    """One ETL + one Achilles pass at ``n_patients``; returns
    (etl_seconds, achilles_seconds)."""
    from synthea2omop_etl_spark.analytics import run_default_analyses
    from synthea2omop_etl_spark.benchgen import synth_raw_tables
    from synthea2omop_etl_spark.plans.pipeline import run_pipeline

    staging = tempfile.mkdtemp(prefix=f"omop_scale_src_{n_patients}_")
    out = tempfile.mkdtemp(prefix=f"omop_scale_out_{n_patients}_")
    try:
        raw = {}
        for name, df in synth_raw_tables(spark, n_patients).items():
            p = os.path.join(staging, name)
            df.write.mode("overwrite").parquet(p)
            raw[name] = spark.read.parquet(p)
        t0 = time.perf_counter()
        run_pipeline(spark, raw, output_dir=out)
        t_etl = time.perf_counter() - t0

        # Achilles over the WRITTEN parquet (fresh lineage, the CLI's
        # own read path) — results fully executed via the noop sink.
        omop = {
            e: spark.read.parquet(os.path.join(out, e))
            for e in os.listdir(out)
            if e.startswith("omop_")
        }
        t0 = time.perf_counter()
        results, dists = run_default_analyses(omop)
        results.write.format("noop").mode("overwrite").save()
        dists.write.format("noop").mode("overwrite").save()
        t_ach = time.perf_counter() - t0
        spark.catalog.clearCache()
        return round(t_etl, 2), round(t_ach, 2)
    finally:
        shutil.rmtree(staging, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n1", type=int, default=500_000,
                    help="10x the graded 50k-patient bench scale")
    ap.add_argument("--n10", type=int, default=5_000_000,
                    help="100x the graded bench scale")
    ap.add_argument("--warmup", type=int, default=50_000)
    args = ap.parse_args()

    from synthea2omop_etl_spark.session import get_spark

    spark = get_spark(app_name="omop-scale-rehearsal")
    measure(spark, args.warmup)  # untimed: codegen/JIT off the clock
    etl1, ach1 = measure(spark, args.n1)
    print(f"n={args.n1}: etl {etl1}s achilles {ach1}s", flush=True)
    etl10, ach10 = measure(spark, args.n10)
    print(f"n={args.n10}: etl {etl10}s achilles {ach10}s", flush=True)

    ratio = args.n10 / args.n1
    path = REPO / "BENCH_SF10.json"
    doc = json.loads(path.read_text()) if path.exists() else {"queries": {}}
    scale_note = (
        f"{args.n1//1000}k/{args.n10//1000}k synthetic patients = "
        f"10x/100x the graded 50k-patient bench scale; single timed "
        f"run after a {args.warmup//1000}k warm-up"
    )
    doc["queries"]["etl_synthea_pipeline"] = {
        "sf1": etl1,
        "sf10": etl10,
        "exponent": round(math.log(etl10 / etl1) / math.log(ratio), 3),
        "note": scale_note,
    }
    doc["queries"]["run_default_analyses"] = {
        "sf1": ach1,
        "sf10": ach10,
        "exponent": round(math.log(ach10 / ach1) / math.log(ratio), 3),
        "note": "fused default-catalog pass over the pipeline's written "
        "parquet (the CLI read path), results+dists fully executed; "
        + scale_note,
    }
    path.write_text(json.dumps(doc, indent=1) + "\n")
    print(json.dumps({k: doc["queries"][k] for k in
                      ("etl_synthea_pipeline", "run_default_analyses")}))


if __name__ == "__main__":
    main()
