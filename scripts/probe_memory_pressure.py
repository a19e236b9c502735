"""Memory-pressure falsification tier (VERDICT r10 task 5).

Every fuzz axis so far varied concurrency, crashes, or key skew under
a comfortable 32g heap; none varied MEMORY.  This probe runs the
headline + analytics + dedup/ANN families at sf5 (50x the driver
tier) in a subprocess whose driver heap is deliberately tight (4g by
default) and asserts COMPLETION — operators must spill, not OOM.  The
class it hunts is any operator that buffers an unbounded working set
on the driver or in one task (the exact-percentile OOM the r9 sketch
upgrade caught is the canonical member).  It then reruns the same
list at 32g and prints the walls side by side for PERF.md — a large
4g/32g ratio is GC pressure worth knowing about even when nothing
dies.

Usage:  python scripts/probe_memory_pressure.py [sf_dir] [tight_heap]
Child:  SPARK_GRAFT_MEMPROBE_CHILD=1 (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FAMILY = [
    # headline (bench.py HEADLINE)
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
    # analytics family (bench.py ANALYTICS)
    "text_bm25_search_topk",
    "entity_fuzzy_match_blocked",
    "events_retention_cohorts",
    "events_rolling_7d_actives",
    "ts_zscore_anomalies",
    "ts_cusum_changepoint",
    "events_attribution_last_touch",
    "agg_histogram_equi_width",
    # dedup / ANN / buffering-prone aggregates
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard_lsh",
    "dedup_cluster_canonical",
    "agg_approx_sketches",
    "agg_percentile_exact",
    "pack_sequences_boundaries",
]


def _child(sf_dir: str) -> int:
    """Run the family sequentially in THIS process (heap fixed by the
    parent via SPARK_DRIVER_MEM before any JVM exists); one JSON line
    per query so the parent gets partial results even on an OOM."""
    from core2_spark.queries.registry import all_queries
    from core2_spark.session import get_spark

    spark = get_spark(
        app_name="core2-spark-memprobe",
        shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    queries = all_queries()
    rc = 0
    for name in FAMILY:
        t0 = time.perf_counter()
        try:
            queries[name](spark, sf_dir).count()
        except Exception as exc:  # record and keep going: one DNF must
            rc = 1                # not hide the rest of the family
            print(
                json.dumps(
                    {"q": name, "err": f"{type(exc).__name__}: {exc}"[:300]}
                ),
                flush=True,
            )
            continue
        print(
            json.dumps({"q": name, "s": round(time.perf_counter() - t0, 2)}),
            flush=True,
        )
    spark.stop()
    return rc


def _run_tier(sf_dir: str, heap: str) -> tuple[dict[str, float], int, str]:
    # Pair task concurrency with the heap at ~512 MB per task — the
    # ratio real clusters provision (Spark can spill operator state,
    # but 32 concurrent tasks' shuffle/sort PAGES alone exceed a 4 GB
    # heap: measured GC-locker thrash + shuffle-file-loss retry loops,
    # not a clean OOM, at 4g×local[32]).  The tier's claim is
    # therefore "at a sane memory:core ratio, everything completes by
    # spilling"; below that floor the failure mode is thrash, which
    # no operator can fix.
    gb = int("".join(c for c in heap if c.isdigit()) or 4)
    cpus = max(2, min(os.cpu_count() or 8, gb * 2))
    env = dict(
        os.environ,
        SPARK_DRIVER_MEM=heap,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_MEMPROBE_CHILD="1",
    )
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), sf_dir],
        capture_output=True,
        text=True,
        env=env,
        timeout=3600,
    )
    walls: dict[str, float] = {}
    errs: dict[str, str] = {}
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                rec = json.loads(line)
                if "err" in rec:
                    errs[rec["q"]] = rec["err"]
                else:
                    walls[rec["q"]] = rec["s"]
            except (ValueError, KeyError):
                pass
    return walls, errs, out.returncode, out.stderr[-3000:]


# Known floor: below ~1 GB per task, Spark's fixed-size 256 MB page
# requests ("Failed to allocate a page (268435456 bytes)") livelock on
# the wide-shingle dedup working set whatever the join strategy — a
# JVM/page-sizing floor, not an operator property (the same query
# completes by spilling at 1 GB/task).  These names may DNF at the
# tight tier without failing the probe; anything else dying is a bug.
ALLOWED_TIGHT_DNF = {"dedup_ngram_jaccard_lsh"}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "_data", "sf5")
    if os.environ.get("SPARK_GRAFT_MEMPROBE_CHILD") == "1":
        return _child(sf_dir)
    tight = sys.argv[2] if len(sys.argv) > 2 else "4g"
    results = {}
    bad: list[str] = []
    for heap in (tight, "32g"):
        walls, errs, rc, err = _run_tier(sf_dir, heap)
        results[heap] = walls
        done = len(walls)
        print(f"heap={heap}: rc={rc}, {done}/{len(FAMILY)} completed", flush=True)
        for q, e in errs.items():
            print(f"  DNF {q}: {e}", flush=True)
            if heap == "32g" or q not in ALLOWED_TIGHT_DNF:
                bad.append(f"{heap}:{q}")
        hard_missing = [q for q in FAMILY if q not in walls and q not in errs]
        if hard_missing:  # child died outright (OOM-killed JVM etc.)
            bad.append(f"{heap}:{hard_missing[0]}")
            print(f"  DIED at: {hard_missing[0]}")
            print("  stderr tail:", err[-1500:])
    print(f"\n| query | {tight} s | 32g s | ratio |")
    print("|---|---|---|---|")
    worst = 0.0
    for q in FAMILY:
        a, b = results[tight].get(q), results["32g"].get(q)
        if a is None or b is None:
            print(f"| {q} | {'OOM/DNF' if a is None else a} | {b} | — |")
            continue
        r = a / b if b else float("inf")
        worst = max(worst, r)
        print(f"| {q} | {a:.2f} | {b:.2f} | {r:.2f}x |")
    print(
        f"\ncompletion: {'PASS' if not bad else 'FAIL ' + str(bad)}; "
        f"worst {tight}/32g ratio: {worst:.2f}x "
        f"(allowed tight-heap DNF: {sorted(ALLOWED_TIGHT_DNF)})"
    )
    return 0 if not bad else 1


if __name__ == "__main__":
    raise SystemExit(main())
