#!/usr/bin/env python
"""Benchmark runner (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}.

Tuning per BASELINE.md: AQE on, low shuffle partitions, broadcast
dims, base tables cached across the sweep.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# Queries representative of the operator surface; each must be cheap
# enough at sf0.1 yet exercise scan/join/agg/window/temporal/LLM paths.
HEADLINE = [
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_region_revenue",
    "tpch_q10_returned_items",
    "agg_distinct",
    "window_topk_per_group",
    "temporal_asof_bitemporal",
    "stream_tumbling_window",
    "dedup_exact_survivors",
    "knn_brute_force_cosine",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from core2_spark.queries.registry import all_queries
    from core2_spark.session import get_spark

    # sf0.1 is small for Spark: a handful of shuffle partitions beats
    # one-per-core task overhead (BASELINE.md tuning note); AQE still
    # re-splits if a partition turns out large.
    spark = get_spark(app_name="core2-spark-bench", shuffle_partitions=8)
    queries = all_queries()

    # Warm the JVM + parquet footers once so per-query numbers measure
    # execution, not session startup.
    queries["tpch_q1_pricing_summary"](spark, sf_dir).count()

    per_query: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = queries[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        dt = time.perf_counter() - t0
        per_query[name] = round(dt, 3)
        total += dt

    sf = sf_dir.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "headline_query_sweep_wall",
                "value": round(total, 3),
                "unit": "sec",
                "queries": per_query,
                "sf": float(sf) if sf else None,
            }
        )
    )


if __name__ == "__main__":
    main()
