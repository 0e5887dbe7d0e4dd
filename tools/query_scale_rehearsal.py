#!/usr/bin/env python
"""Per-query sf1→sf10 scale rehearsal: run graded queries against the
.scale/sf1 and .scale/sf10 replicated dirs (tools/make_scaled_sf.py)
and record scaling exponents in BENCH_SF10.json — the artifact bench.py
republishes every round (r12, VERDICT r11 item 4: the expensive-tail
list must track whatever is CURRENTLY expensive; decontam_flags and
multimodal_features rose into the sf1 top-5 after the r10 list was
fixed).

Methodology (the r10/r11 rehearsal precedent): one sf0.1 warm-up run
pays codegen/JIT off the clock; each scale point is then a single timed
run — runtimes are tens of seconds to minutes, far outside the jitter
band median-of-3 exists for. exponent = log10(t_sf10 / t_sf1); 1.0 =
linear in data size.

Usage: python tools/query_scale_rehearsal.py decontam_flags multimodal_features
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")


def run_once(spark, name: str, sf_dir: str) -> float:
    from synthea2omop_etl_spark.queries import QUERIES

    t0 = time.perf_counter()
    QUERIES[name].spark(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    sec = time.perf_counter() - t0
    spark.catalog.clearCache()
    return round(sec, 2)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--warmup-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    sf1 = str(REPO / ".scale" / "sf1")
    sf10 = str(REPO / ".scale" / "sf10")
    for d in (sf1, sf10):
        if not os.path.isdir(d):
            sys.exit(f"{d} missing — run tools/make_scaled_sf.py first")

    from synthea2omop_etl_spark.session import get_spark

    spark = get_spark(app_name="query-scale-rehearsal")
    path = REPO / "BENCH_SF10.json"
    doc = json.loads(path.read_text()) if path.exists() else {"queries": {}}
    for name in args.queries:
        run_once(spark, name, args.warmup_dir)  # codegen off the clock
        t1 = run_once(spark, name, sf1)
        t10 = run_once(spark, name, sf10)
        exp = round(math.log10(t10 / t1), 3)
        doc["queries"][name] = {"sf1": t1, "sf10": t10, "exponent": exp}
        print(json.dumps({name: doc["queries"][name]}), flush=True)
    path.write_text(json.dumps(doc, indent=1) + "\n")


if __name__ == "__main__":
    main()
