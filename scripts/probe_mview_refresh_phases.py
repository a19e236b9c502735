#!/usr/bin/env python
"""Fine-grained phase decomposition of mviews.refresh (r12, VERDICT
item 4): monkeypatch timing wrappers around every internal step of
_refresh_locked so the 16-job refresh is attributed function by
function (driver planning vs job execution vs filesystem bookkeeping).

Run: python scripts/probe_mview_refresh_phases.py [sf_dir]
"""

from __future__ import annotations

import functools
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
)

CALLS: list[tuple[str, float, int]] = []
_tracker = None


def _jobs() -> int:
    ids = _tracker.getJobIdsForGroup(None)
    return max(ids) if ids else -1


def wrap(obj, attr, label=None):
    fn = getattr(obj, attr)
    name = label or f"{getattr(obj, '__name__', type(obj).__name__)}.{attr}"

    @functools.wraps(fn)
    def timed(*a, **kw):
        j0 = _jobs()
        t0 = time.perf_counter()
        try:
            return fn(*a, **kw)
        finally:
            CALLS.append((name, time.perf_counter() - t0, _jobs() - j0))

    setattr(obj, attr, timed)


def main():
    global _tracker
    from pyspark.sql import functions as F
    from pyspark.sql import DataFrame

    from core2_spark.catalog import load_table
    from core2_spark.engine import Delete, Engine, Put, Snapshot
    from core2_spark import mviews
    from core2_spark.session import get_spark

    spark = get_spark(
        app_name="probe-mview-phases",
        shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    _tracker = spark.sparkContext.statusTracker()

    wrap(Engine, "refresh", "engine.refresh (log re-sync)")
    wrap(Engine, "db", "engine.db (acquire basis)")
    wrap(Snapshot, "changes", "snap.changes (CDC feed build)")
    wrap(Snapshot, "table", "snap.table (merge-on-read build)")
    wrap(mviews, "_idkeys_asof_keys")
    wrap(mviews, "_idkeys_append_delta")
    wrap(mviews, "_idkeys_maybe_fold")
    wrap(mviews, "_idkeys_write_base")
    wrap(mviews, "_store")
    wrap(mviews, "_affected_keys")
    wrap(mviews, "_compute")
    wrap(mviews, "read", "mviews.read (old view)")
    wrap(DataFrame, "collect", "DataFrame.collect")

    o = load_table(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").alias("id"),
        F.col("o_custkey").alias("cust"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    for rep in range(2):
        eng = Engine(spark, tempfile.mkdtemp(prefix="probe_mvp_"))
        eng.submit_tx([Put("orders", o)], tx_time="2024-01-01 00:00:01")
        eng.create_materialized_view(
            "rev", "orders", ["status"],
            {"n": ("count", "*"), "total": ("sum", "price")},
        )
        updates = (
            o.filter(F.col("cust") % 10 == 0)
            .withColumn(
                "price", F.col("price") + F.lit(100).cast("decimal(18,2)")
            )
            .withColumn(
                "status",
                F.when(F.col("cust") % 20 == 0, "X").otherwise(
                    F.col("status")
                ),
            )
        )
        eng.submit_tx(
            [
                Put("orders", updates),
                Delete(
                    "orders",
                    o.filter(F.col("cust") % 13 == 0).select("id"),
                ),
            ],
            tx_time="2024-01-01 00:00:02",
        )
        CALLS.clear()
        j0 = _jobs()
        t0 = time.perf_counter()
        stats = eng.refresh_materialized_view("rev")
        wall = time.perf_counter() - t0
        jobs = _jobs() - j0
        print(f"\n=== rep {rep + 1}: refresh {wall:.3f}s, {jobs} jobs, {stats} ===")
        for name, dt, nj in CALLS:
            print(f"  {dt:7.3f}s  {nj:3d} jobs  {name}")


if __name__ == "__main__":
    main()
