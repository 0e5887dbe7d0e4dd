"""ETL throughput profiling harness (VERDICT r6/r7 task: confirm >=65k
rows/s or root-cause the ceiling).

Replicates bench.py's ETL section (synth 50k patients -> parquet staging ->
untimed pilot -> N timed runs) but sweeps writer-pool sizes and reports
every sample, so ramp effects and pool contention are visible instead of
hidden behind one median. Run on an IDLE machine; timings are only
comparable within one process (verify-skill note: VM wall clock drifts
+/-40% between sessions).

Usage: python tools/etl_profile.py [pool sizes...]   (default: 8)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from synthea2omop_etl_spark.benchgen import synth_raw_tables, total_source_rows
from synthea2omop_etl_spark.plans.pipeline import run_pipeline
from synthea2omop_etl_spark.session import get_spark


def main() -> None:
    pools = [int(a) for a in sys.argv[1:]] or [8]
    runs = int(os.environ.get("SPARK_GRAFT_ETL_RUNS", "5"))
    n_patients = int(os.environ.get("SPARK_GRAFT_ETL_PATIENTS", "50000"))
    spark = get_spark(app_name="etl-profile")
    rows = total_source_rows(n_patients)

    staging = tempfile.mkdtemp(prefix="etl_prof_src_")
    out_dir = tempfile.mkdtemp(prefix="etl_prof_out_")
    try:
        raw = {}
        for name, df in synth_raw_tables(spark, n_patients).items():
            p = os.path.join(staging, name)
            df.write.mode("overwrite").parquet(p)
            raw[name] = spark.read.parquet(p)
        # one untimed pilot (JIT/codegen/page cache)
        pilot = tempfile.mkdtemp(prefix="etl_prof_pilot_")
        try:
            run_pipeline(spark, raw, output_dir=pilot)
        finally:
            shutil.rmtree(pilot, ignore_errors=True)
        for pool in pools:
            os.environ["SPARK_GRAFT_ETL_POOL"] = str(pool)
            samples = []
            for _ in range(runs):
                t0 = time.perf_counter()
                run_pipeline(spark, raw, output_dir=out_dir)
                samples.append(round(time.perf_counter() - t0, 2))
            med = sorted(samples)[len(samples) // 2]
            print(
                f"pool={pool:2d} samples={samples} median={med}s "
                f"rows/s={rows / med:,.0f}",
                flush=True,
            )
    finally:
        shutil.rmtree(staging, ignore_errors=True)
        shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
