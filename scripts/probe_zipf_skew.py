"""Uniform-vs-Zipf skew probe for the events analytics family
(VERDICT r9 task 6).

The driver fixture's user_id is uniform; production event streams are
Zipf.  This probe runs every events-partitioned analytics query at sf1
against BOTH fixtures (_data/sf1 uniform, _data/sf1_zipf with the
hottest user owning ~20% of all events — scripts/gen_zipf_events.py),
asserting (a) DuckDB oracle parity on the SKEWED data, so correctness
is skew-independent, and (b) the timing ratio zipf/uniform, looking
for a hot key serializing a stage (>2x = an outlier to salt).

Usage: python scripts/probe_zipf_skew.py [runs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

from core2_spark.queries.registry import all_oracles, all_queries
from tests.parity import assert_frames_match

FAMILY = [
    "events_retention_cohorts",
    "events_rolling_7d_actives",
    "ts_zscore_anomalies",
    "ts_cusum_changepoint",
    "events_attribution_last_touch",
    "events_attribution_linear_multitouch",
    "events_funnel_ordered",
    "events_error_burst_runs",
]

UNIFORM = "_data/sf1"
ZIPF = "_data/sf1_zipf"


def main() -> int:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    queries, oracles = all_queries(), all_oracles()

    # 1) parity on the skewed fixture
    con = duckdb.connect()
    con.execute("SET memory_limit = '24GB'")
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{os.path.abspath(ZIPF)}/events.parquet')"
    )
    bad = []
    for name in FAMILY:
        try:
            assert_frames_match(
                queries[name](spark, ZIPF).toPandas(),
                con.execute(oracles[name]).df(),
                name,
            )
            print(f"parity ok {name}", flush=True)
        except Exception as exc:
            bad.append(name)
            print(f"parity FAIL {name}: {exc}", flush=True)

    # 2) timing, min-of-N per fixture (warm once each)
    def best(name: str, sf_dir: str) -> float:
        queries[name](spark, sf_dir).count()  # warm
        ts = []
        for _ in range(runs):
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).count()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    print(f"\n| query | uniform s | zipf s | ratio |")
    print("|---|---|---|---|")
    worst = 0.0
    for name in FAMILY:
        tu = best(name, UNIFORM)
        tz = best(name, ZIPF)
        r = tz / tu
        worst = max(worst, r)
        print(f"| {name} | {tu:.2f} | {tz:.2f} | {r:.2f}x |", flush=True)
    print(f"\nworst ratio: {worst:.2f}x; parity failures: {bad or 'none'}")
    spark.stop()
    return 1 if (bad or worst > 2.0) else 0


if __name__ == "__main__":
    raise SystemExit(main())
