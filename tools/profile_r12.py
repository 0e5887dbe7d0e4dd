#!/usr/bin/env python
"""Round-12 optimization profiler: time individual declared queries with
the bench's exact steady-state methodology (untimed warm run, then
median-of-N noop-sink runs) and dump `.explain("formatted")` plans to
plans/r12/.

Usage:
    python tools/profile_r12.py [--sf DIR] [--runs N] [--tag before] q1 q2 ...
    python tools/profile_r12.py --plans-only --tag before q1 q2 ...

Timing follows bench.py: noop sink, perf_counter around the write, warm
run first. Plans are captured from the same DataFrame the bench executes.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from synthea2omop_etl_spark.queries import QUERIES  # noqa: E402
from synthea2omop_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--tag", default=None,
                    help="write plans/r12/<q>_<tag>.txt")
    ap.add_argument("--plans-only", action="store_true")
    ap.add_argument("--eventlog", action="store_true",
                    help="write a Spark event log to /tmp/spark-events "
                         "(parse with tools/parse_eventlog.py)")
    args = ap.parse_args()

    extra = {}
    if args.eventlog:
        os.makedirs("/tmp/spark-events", exist_ok=True)
        extra = {"spark.eventLog.enabled": "true",
                 "spark.eventLog.dir": "file:///tmp/spark-events",
                 # plain JSON lines so parse_eventlog.py can read it
                 # without a zstd binding
                 "spark.eventLog.compress": "false",
                 "spark.eventLog.rolling.enabled": "false"}
    spark = get_spark(app_name="profile_r12", extra_conf=extra)
    spark.read.parquet(os.path.join(args.sf, "lineitem.parquet")).count()

    plans_dir = Path(__file__).resolve().parent.parent / "plans" / "r12"
    plans_dir.mkdir(parents=True, exist_ok=True)

    out: dict[str, dict] = {}
    for name in args.names:
        spec = QUERIES[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        df = spec.spark(spark, args.sf)
        if args.tag:
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            (plans_dir / f"{name}_{args.tag}.txt").write_text(plan)
        if args.plans_only:
            out[name] = {"plan": "captured"}
            continue
        # untimed warm run (codegen/JIT), then timed runs
        spark.sparkContext.setJobDescription(f"profile:{name}:warm")
        df.write.format("noop").mode("overwrite").save()
        runs = []
        for i in range(args.runs):
            # rebuild the DataFrame each run: driver-paced iterative
            # queries do part of their work at plan-build time, and the
            # bench's run_once(spec, d) rebuilds too
            spark.sparkContext.setJobDescription(f"profile:{name}:r{i}")
            t0 = time.perf_counter()
            d2 = spec.spark(spark, args.sf)
            d2.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        out[name] = {"runs": runs, "median": sorted(runs)[len(runs) // 2]}
        print(f"{name}: median={out[name]['median']} runs={runs}",
              flush=True)
        spark.sparkContext.setJobDescription(None)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
