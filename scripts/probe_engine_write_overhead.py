#!/usr/bin/env python
"""Decompose the engine write-path queries' build time (VERDICT r11
task 4): phase timers around each engine call in
engine_dml_records_mixed_types / engine_mview_incremental, plus a
Spark-job-count reading per phase (sc.statusTracker job ids), so the
fix targets the phase that actually costs — driver-side planning vs
job execution vs filesystem bookkeeping.

Run: python scripts/probe_engine_write_overhead.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
)


class Phases:
    def __init__(self, spark):
        self.spark = spark
        self.rows: list[tuple[str, float, int]] = []

    def __call__(self, name):
        import contextlib

        @contextlib.contextmanager
        def scope():
            tracker = self.spark.sparkContext.statusTracker()
            jobs0 = len(tracker.getJobIdsForGroup() or [])
            all0 = tracker.getJobIdsForGroup(None)
            n0 = max(all0) if all0 else -1
            t0 = time.perf_counter()
            yield
            dt = time.perf_counter() - t0
            all1 = tracker.getJobIdsForGroup(None)
            n1 = max(all1) if all1 else -1
            self.rows.append((name, dt, n1 - n0))

        return scope()

    def report(self, title):
        print(f"\n=== {title} ===")
        total = sum(r[1] for r in self.rows)
        for name, dt, jobs in self.rows:
            print(f"  {dt:7.3f}s  {jobs:3d} jobs  {name}")
        print(f"  {total:7.3f}s  total")
        self.rows.clear()


def canary() -> float:
    import hashlib

    t0 = time.perf_counter()
    h = hashlib.sha256()
    for _ in range(1500):
        h.update(b"x" * 65536)
    return time.perf_counter() - t0


def probe_records_mixed(spark, ph):
    from pyspark.sql import functions as F

    from core2_spark.engine import Engine
    from core2_spark.queries.engine_q import _nation_rows

    with ph("collect nation rows"):
        rows = sorted(
            (r["id"], r["name"]) for r in _nation_rows(spark, SF_DIR).collect()
        )
    with ph("Engine() init"):
        eng = Engine(spark, tempfile.mkdtemp(prefix="probe_recmix_"))
    recs = ", ".join(
        f"{{id: {i}, name: '{n}', x: {i if i % 2 == 0 else i + 0.5}}}"
        for i, n in rows
    )
    with ph("INSERT RECORDS (25 rows)"):
        eng.sql_dml(f"INSERT INTO t RECORDS {recs}", tx_time="2024-01-01 00:00:01")
    patch = ", ".join(
        f"{{id: {i}, y: {i * 2 if i % 2 == 1 else i * 2 + 0.25}}}"
        for i, _ in rows
        if i < 10
    )
    with ph("PATCH RECORDS (10 rows)"):
        eng.sql_dml(f"PATCH INTO t RECORDS {patch}", tx_time="2024-01-01 00:00:02")
    with ph("db().sql build"):
        df = eng.db().sql("SELECT id, name, x, y FROM t ORDER BY id")
    with ph("noop action"):
        df.write.format("noop").mode("overwrite").save()
    ph.report("engine_dml_records_mixed_types")


def probe_mview(spark, ph):
    from pyspark.sql import functions as F

    from core2_spark.catalog import load_table
    from core2_spark.engine import Delete, Engine, Put

    o = load_table(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").alias("id"),
        F.col("o_custkey").alias("cust"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    with ph("Engine() init"):
        eng = Engine(spark, tempfile.mkdtemp(prefix="probe_mv_"))
    with ph("tx1 Put(orders)"):
        eng.submit_tx([Put("orders", o)], tx_time="2024-01-01 00:00:01")
    with ph("create_materialized_view"):
        eng.create_materialized_view(
            "rev", "orders", ["status"],
            {"n": ("count", "*"), "total": ("sum", "price")},
        )
    updates = (
        o.filter(F.col("cust") % 10 == 0)
        .withColumn("price", F.col("price") + F.lit(100).cast("decimal(18,2)"))
        .withColumn(
            "status",
            F.when(F.col("cust") % 20 == 0, "X").otherwise(F.col("status")),
        )
    )
    with ph("tx2 Put+Delete"):
        eng.submit_tx(
            [
                Put("orders", updates),
                Delete("orders", o.filter(F.col("cust") % 13 == 0).select("id")),
            ],
            tx_time="2024-01-01 00:00:02",
        )
    with ph("refresh_materialized_view"):
        stats = eng.refresh_materialized_view("rev")
    print("refresh stats:", stats)
    with ph("read view + noop"):
        eng.materialized_view("rev").write.format("noop").mode(
            "overwrite"
        ).save()
    ph.report("engine_mview_incremental")


def main():
    from core2_spark.session import get_spark

    spark = get_spark(
        app_name="probe-engine-write",
        shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    ph = Phases(spark)
    print(f"canary {canary():.3f}s")
    reps = int(os.environ.get("PROBE_REPS", "2"))
    for i in range(reps):
        print(f"\n--- rep {i + 1} ---")
        probe_records_mixed(spark, ph)
        probe_mview(spark, ph)
        print(f"canary {canary():.3f}s")


if __name__ == "__main__":
    main()
