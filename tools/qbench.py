#!/usr/bin/env python
"""Per-query micro-bench for same-sitting A/Bs: bench.py's exact
methodology (untimed warm run, then timed runs, noop sink, median) over
an explicit query list.

    python tools/qbench.py SF_DIR query1 query2 ... [--runs N]

Prints one JSON line {query: median_sec, ...} plus per-run samples.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from synthea2omop_etl_spark.queries import QUERIES  # noqa: E402
from synthea2omop_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 3
    for a in sys.argv[1:]:
        if a.startswith("--runs="):
            runs = int(a.split("=")[1])
    sf_dir, names = args[0], args[1:]
    spark = get_spark(app_name="qbench")
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    out: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    for name in names:
        spec = QUERIES[name]
        spark.catalog.clearCache()
        spec.spark(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        rs = []
        for _ in range(runs):
            t0 = time.perf_counter()
            spec.spark(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            rs.append(round(time.perf_counter() - t0, 3))
        samples[name] = rs
        out[name] = sorted(rs)[len(rs) // 2]
    print(json.dumps({"medians": out, "samples": samples,
                      "load1": round(os.getloadavg()[0], 1)}))


if __name__ == "__main__":
    main()
