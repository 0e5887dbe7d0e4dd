#!/usr/bin/env python
"""r13 ETL driver-side planning profiler (VERDICT r12 item 1).

Times, per domain transform inside the `domains` step:
  - plan CONSTRUCTION (the Python-side DataFrame building, analyzer work)
  - every localCheckpoint() call (which pays optimize + physical planning
    + toRdd eagerly even with eager=False)
so the ~13 s of serialized driver work the r12 trace attributed to the
domains step is split into its actual components.

Usage: python tools/profile_r13_etl.py [n_patients]
"""

from __future__ import annotations

import os
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

os.environ.setdefault("SPARK_GRAFT_ETL_TRACE", "1")

from pyspark.sql import DataFrame  # noqa: E402

from synthea2omop_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_patients = int(sys.argv[1]) if len(sys.argv) > 1 else 50000
    extra = {}
    for kv in os.environ.get("PROF_CONF", "").split(";"):
        if "=" in kv:
            k, v = kv.split("=", 1)
            extra[k] = v
    spark = get_spark(app_name="profile_r13_etl", extra_conf=extra)

    import shutil
    import tempfile

    from synthea2omop_etl_spark import benchgen
    from synthea2omop_etl_spark.plans import pipeline as pl

    staging = tempfile.mkdtemp(prefix="etl_prof_src_")
    out_dir = tempfile.mkdtemp(prefix="etl_prof_out_")

    ckpt_times: list[tuple[str, float]] = []
    # Spark 4: instances are pyspark.sql.classic.dataframe.DataFrame,
    # which overrides the base method — patch the concrete class.
    cls = type(spark.range(1))
    orig_ckpt = cls.localCheckpoint

    def timed_ckpt(self, eager=True):
        t0 = time.perf_counter()
        out = orig_ckpt(self, eager=eager)
        ckpt_times.append((f"eager={eager}", time.perf_counter() - t0))
        return out

    cls.localCheckpoint = timed_ckpt

    # wrap each domain transform to time its construction
    build_times: dict[str, float] = defaultdict(float)

    def wrap(name, fn):
        def inner(*a, **k):
            t0 = time.perf_counter()
            out = fn(*a, **k)
            build_times[name] += time.perf_counter() - t0
            return out
        return inner

    for name in (
        "person", "visit_occurrence", "condition_occurrence",
        "drug_exposure", "procedure_occurrence", "provider", "care_site",
        "measurement_and_observation", "device_exposure",
        "payer_plan_period", "death", "observation_period", "cost",
        "drug_era", "condition_era",
    ):
        if hasattr(pl, name):
            setattr(pl, name, wrap(name, getattr(pl, name)))
    # derived live as module attrs on pl too
    pl.death = wrap("death", pl.death)
    pl.observation_period = wrap("observation_period", pl.observation_period)
    pl.cost = wrap("cost", pl.cost)
    pl.drug_era = wrap("drug_era", pl.drug_era)
    pl.condition_era = wrap("condition_era", pl.condition_era)

    try:
        raw = {}
        for name, df in benchgen.synth_raw_tables(spark, n_patients).items():
            p = os.path.join(staging, name)
            df.write.mode("overwrite").parquet(p)
            raw[name] = spark.read.parquet(p)
        # untimed pilot (the bench methodology): session-global JIT,
        # codegen-compiler and classloading warmup land off the clock
        if os.environ.get("PROF_PILOT", "1") == "1":
            pilot_out = tempfile.mkdtemp(prefix="etl_prof_pilot_")
            pl.run_pipeline(spark, raw, output_dir=pilot_out)
            shutil.rmtree(pilot_out, ignore_errors=True)
            build_times.clear()
        n_ckpt_before = len(ckpt_times)
        ckpt_times.clear()
        t0 = time.perf_counter()
        pl.run_pipeline(spark, raw, output_dir=out_dir)
        wall = time.perf_counter() - t0
        print(f"\n=== run_pipeline wall: {wall:.2f}s "
              f"(ckpt calls before run: {n_ckpt_before}) ===")
        print("--- per-transform plan construction (driver, serialized) ---")
        for name, sec in sorted(build_times.items(), key=lambda x: -x[1]):
            print(f"  {name:30} {sec:6.2f}s")
        print(f"  TOTAL{'':26} {sum(build_times.values()):6.2f}s")
        print("--- localCheckpoint calls during run ---")
        tot = defaultdict(float)
        cnt = defaultdict(int)
        for kind, sec in ckpt_times:
            tot[kind] += sec
            cnt[kind] += 1
        for kind in tot:
            print(f"  {kind:12} n={cnt[kind]:3}  total={tot[kind]:6.2f}s")
    finally:
        cls.localCheckpoint = orig_ckpt
        shutil.rmtree(staging, ignore_errors=True)
        shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
