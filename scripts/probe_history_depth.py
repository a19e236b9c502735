#!/usr/bin/env python
"""History-depth scale probe for the day-partitioned engine path.

Question (VERDICT r4 #7): at 10× the transaction-history depth, do
the engine's read classes stay near-flat where `_sys_day` partition
pruning applies?

Builds two engine roots — 12 days and 120 days of daily transactions
(2,000 row versions/day, ids cycling so every day updates prior ids)
— and times, warm, best-of-3:

- ``asof_early``:   as-of read pinned to day 3 (pruning drops every
                    later day — should be FLAT in history depth);
- ``changes_tail``: CDC feed of the last day (pruning drops every
                    earlier day — should be FLAT);
- ``current``:      default current-state read (must scan all history
                    for the per-id latest version — grows with depth);
- ``current_compacted``: the same read after ``Engine.compact`` (a
                    plain pushed-down scan — flat again).

Run: python scripts/probe_history_depth.py
Results are recorded in PERF.md (round-5 section).
"""

from __future__ import annotations

import os
import shutil
import sys
import time
from datetime import datetime, timedelta

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_PER_DAY = 2000
N_IDS = 6000  # ids cycle: each day re-puts 1/3 of the id space


def build(spark, root: str, days: int) -> None:
    from core2_spark.engine import Engine, Put

    shutil.rmtree(root, ignore_errors=True)
    eng = Engine(spark, root)
    base = datetime(2024, 1, 1)
    for d in range(days):
        lo = (d * N_PER_DAY) % N_IDS
        rows = spark.range(lo, lo + N_PER_DAY).selectExpr(
            "id", f"id * 1.5 + {d} AS px", f"'day{d}' AS src"
        )
        eng.submit_tx([Put("ticks", rows)], tx_time=base + timedelta(days=d))


def best_of(fn, n: int = 3) -> float:
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def probe(spark, root: str, days: int) -> dict[str, float]:
    from core2_spark.engine import Engine

    eng = Engine(spark, root)
    db = eng.db()
    asof = datetime(2024, 1, 3, 12)
    since = datetime(2024, 1, 1) + timedelta(days=days - 1)

    def count_files() -> int:
        return sum(
            1
            for _r, _d, ns in os.walk(os.path.join(root, "ticks"))
            for f in ns
            if f.endswith(".parquet")
        )

    out = {}
    out["files_raw"] = count_files()
    out["asof_early"] = best_of(
        lambda: db.table("ticks", system_time=asof, app_time=asof).count()
    )
    out["changes_tail"] = best_of(lambda: db.changes("ticks", since=since).count())
    out["current"] = best_of(lambda: db.table("ticks").count())
    eng.compact("ticks")
    db2 = eng.db()
    out["current_compacted"] = best_of(lambda: db2.table("ticks").count())
    # the small-file fix: compact the version log, then re-time the
    # pruned read classes (manifest and mergeSchema costs are O(files))
    eng.optimize("ticks")
    out["files_optimized"] = count_files()
    db3 = eng.db()
    out["asof_early_optimized"] = best_of(
        lambda: db3.table("ticks", system_time=asof, app_time=asof).count()
    )
    out["changes_tail_optimized"] = best_of(
        lambda: db3.changes("ticks", since=since).count()
    )
    return out


def main() -> None:
    from core2_spark.session import get_spark

    spark = get_spark(app_name="history-depth-probe", shuffle_partitions=8)
    base = "/root/repo/_data/depth_probe"
    results = {}
    for days in (12, 120):
        root = f"{base}_{days}"
        build(spark, root, days)
        # warm the reader path once before timing
        probe(spark, root, days)
        results[days] = probe(spark, root, days)
    print(f"{'read':>24} {'12 days':>9} {'120 days':>9} {'ratio':>7}")
    for key in (
        "asof_early",
        "changes_tail",
        "current",
        "current_compacted",
        "asof_early_optimized",
        "changes_tail_optimized",
    ):
        a, b = results[12][key], results[120][key]
        print(f"{key:>24} {a:>8.2f}s {b:>8.2f}s {b / a:>6.1f}x")
    for key in ("files_raw", "files_optimized"):
        print(f"{key:>24} {results[12][key]:>9} {results[120][key]:>9}")


if __name__ == "__main__":
    main()
