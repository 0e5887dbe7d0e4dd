#!/usr/bin/env python
"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully executed (writes to a no-op sink via count of a
collect-free action) — we time plan+execute, not collect-to-driver.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from synthea2omop_etl_spark.queries import QUERIES  # noqa: E402
from synthea2omop_etl_spark.session import get_spark  # noqa: E402

# Headline set: the heavy shapes that matter at scale (full-scan agg, big
# joins, windows, dedup/LSH, ANN) — not the tiny dimension lookups.
HEADLINE = [
    "pricing_summary",
    "revenue_by_nation",
    "segment_revenue",
    "topk_parts",
    "customer_order_span",
    "activity_period",
    "first_order_per_customer",
    "running_revenue",
    "sessionize",
    "pivot_user_events",
    "price_percentiles",
    "dedup_exact",
    "dedup_minhash",
    "doc_fingerprints",
    "text_quality",
    "ann_topk",
    "multimodal_features",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bench")

    # Untimed warmup: pay JVM/codegen/catalog costs once, off the clock.
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        spec = QUERIES[name]
        t0 = time.perf_counter()
        df = spec.spark(spark, sf_dir)
        # Force full execution without moving rows to the driver.
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
