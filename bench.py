#!/usr/bin/env python
"""Benchmark runner (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}.

Tuning per BASELINE.md + PERF.md: low shuffle partitions (task
overhead beats parallelism at sf0.1), FAIR scheduler with a 10-way
concurrent sweep — per-query wall at this scale is dominated by fixed
job-scheduling overhead, which concurrency hides exactly as it would
for a multi-tenant cluster (sequential sweep ≈ 11 s, 4-way ≈ 4.2 s,
10-way ≈ 3.4 s; per-query numbers below are measured under that
concurrency, so each is inflated by co-running queries while the wall
— the headline metric — is minimized).

Robustness (round-4): every headline query is warmed once before
timing, and the concurrent sweep runs SWEEP_REPEATS (default 3) times
with the MINIMUM wall reported — the concurrent wall is extremely
sensitive to co-running load on the box (r3: same code measured 5.7 s
clean vs 28 s busy), and min-of-3 recovers the attributable number.
All sweep walls are emitted as "sweep_walls" for transparency; the
sequential per-query companion sweep is unchanged.
"""

from __future__ import annotations

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# 8g (the library default) is enough for every individual query, but the
# 10-way concurrent sweep on local[32] churns ~10 simultaneous hash
# aggregates/joins through one heap: at 8g the sweep spends more time in
# GC than in query execution (measured: 7-18 s walls at 8g vs 3.9 s at
# 32g on an idle box).  The box has 128 GiB; take a third of it.
os.environ.setdefault("SPARK_DRIVER_MEM", "32g")

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

CONCURRENCY = int(os.environ.get("SPARK_GRAFT_BENCH_THREADS", "10"))
SWEEP_REPEATS = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))

# The round-9 analytics family (BM25 / fuzzy linkage / cohorts /
# z-score / CUSUM / attribution / histogram) is measured as its OWN
# sequential block rather than folded into HEADLINE: the 10-query
# concurrent wall is the round-over-round + vs-BASELINE comparable,
# so its composition stays fixed, while the analytics block gives the
# artifact per-round scale numbers for the new operators.
ANALYTICS = [
    "text_bm25_search_topk",
    "entity_fuzzy_match_blocked",
    "events_retention_cohorts",
    "events_rolling_7d_actives",
    "ts_zscore_anomalies",
    "ts_cusum_changepoint",
    "events_attribution_last_touch",
    "agg_histogram_equi_width",
]


def _heap_used_mb(spark) -> int | None:
    """Used JVM heap in MiB (py4j only; None on a Connect session)."""
    try:
        rt = spark._jvm.java.lang.Runtime.getRuntime()
        return int((rt.totalMemory() - rt.freeMemory()) / (1024 * 1024))
    except Exception:
        return None


def _bench_tier(spark, queries, sf_dir: str) -> dict:
    """Warm + sequential best-of-2 + min-of-N concurrent sweep for one
    scale tier; returns the result block for the JSON line."""
    sf = sf_dir.rstrip("/").split("sf")[-1]
    try:
        sf_num = float(sf)
    except ValueError:
        sf_num = None
    heap_before = _heap_used_mb(spark)
    # shuffle partitions scale with the tier: 8 is right where task
    # overhead dominates (sf<=0.1); the 10x tier's heavy joins want
    # real parallelism (measured ~8% on q3/q5/q10 at sf1).  Branch on
    # the PARSED scale factor — a substring test ('sf1' in path) also
    # matches sf0.1/sf10/custom dirs and silently flips the tier.
    big = sf_num is not None and sf_num >= 1
    spark.conf.set("spark.sql.shuffle.partitions", "32" if big else "8")

    def run(name: str) -> tuple[str, float]:
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).count()
        return name, time.perf_counter() - t0

    # Warm EVERY headline query once (JVM JIT, parquet footers, codegen
    # cache, broadcast relations) so the graded sweeps measure steady-state
    # execution, not first-run compilation.
    for name in HEADLINE:
        run(name)

    # The 10-way concurrent wall collapses under co-running machine load
    # (observed 5.7 s -> 28 s with a busy neighbor while per-query times
    # were flat), so run the sweep SWEEP_REPEATS times and report the
    # MINIMUM wall — the contention-free number attributable to the code.
    def jvm_gc() -> None:
        # Drain garbage between timed sections so a sweep never eats a
        # stop-the-world collection of the previous section's garbage.
        # _jvm is a py4j-only surface; a Connect-style session just
        # skips the hint.
        try:
            spark._jvm.System.gc()
        except Exception:
            pass

    # Sequential companion sweep FIRST (straight after the warm pass,
    # before the concurrent sweeps dirty the heap): per-query numbers
    # measured WITHOUT co-running queries are the round-over-round
    # regression signal, so they get the clean JVM.  Best-of-2 per
    # query with a GC between passes — the r4 driver's sequential
    # numbers came out 2-3x a clean run purely from post-sweep
    # JVM/heap state; two passes + min makes them reproducible.
    queries_sequential: dict[str, float] = {}
    for _ in range(2):
        jvm_gc()
        for name in HEADLINE:
            _, dt = run(name)
            prev = queries_sequential.get(name)
            if prev is None or dt < prev:
                queries_sequential[name] = round(dt, 3)

    # Analytics family: warm once + sequential best-of-2 (same
    # discipline as queries_sequential; never in the concurrent wall).
    # Runs at the primary tier AND the 10× sf1 tier — the family has a
    # history of AQE starvation, so its scale behavior needs to be
    # artifact-tracked, not PERF.md prose (VERDICT r9 task 2).  sf5
    # stays headline-only: the fuzzy-match block join there would
    # triple the tier's runtime for no extra regression signal.
    # Unparsable tiers (custom SPARK_GRAFT_SF_DIR whose basename is not
    # 'sf<float>') count as small: they'd otherwise silently skip the
    # family and emit an empty analytics_sequential with no hint why.
    analytics_sequential: dict[str, float] = {}
    if sf_num is None or sf_num <= 1:
        for name in ANALYTICS:
            run(name)
        for _ in range(2):
            jvm_gc()
            for name in ANALYTICS:
                _, dt = run(name)
                prev = analytics_sequential.get(name)
                if prev is None or dt < prev:
                    analytics_sequential[name] = round(dt, 3)

    walls = []
    per_query: dict[str, float] = {}
    for _ in range(SWEEP_REPEATS):
        jvm_gc()
        t_sweep = time.perf_counter()
        with ThreadPoolExecutor(CONCURRENCY) as ex:
            sweep = {name: round(dt, 3) for name, dt in ex.map(run, HEADLINE)}
        w = time.perf_counter() - t_sweep
        if not walls or w < min(walls):
            per_query = sweep
        walls.append(round(w, 3))
    wall = min(walls)

    return {
        "value": round(wall, 3),
        "queries": per_query,
        "queries_sequential": queries_sequential,
        "analytics_sequential": analytics_sequential,
        "sweep_walls": walls,
        "sf": sf_num,
        # Per-tier JVM-state markers: heap occupancy at tier entry/exit
        # makes tier-order contamination visible in the artifact
        # (VERDICT r9 task 3 — the +40% sf1 drift in BENCH_r09 was the
        # sf1 tier inheriting the sf0.1 tier's heap/GC state).
        "heap_mb": {"before": heap_before, "after": _heap_used_mb(spark)},
    }


def _run_tier_subprocess(sf_dir: str) -> dict | None:
    """Run one scale tier in a FRESH JVM (own subprocess) and return
    its result block.

    BENCH_r09's sf1 wall read +40% over r8 purely because the sf1/sf5
    tiers ran in the same heap straight after the sf0.1 sweeps —
    min-of-3 can't recover a number measured inside another tier's
    garbage.  A fresh session per tier is the isolation a real
    multi-cluster benchmark has.  Falls back to None on any failure
    (caller then measures in-process, flagged)."""
    import subprocess

    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_TIER_ONLY="1",
        SPARK_GRAFT_SKIP_SF1="1",
    )
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            capture_output=True,
            text=True,
            env=env,
            timeout=1800,
        )
        if out.returncode != 0:
            return None
        line = [l for l in out.stdout.splitlines() if l.strip()][-1]
        block = json.loads(line)
        block["isolated_jvm"] = True
        return block
    except Exception:
        return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    tier_only = os.environ.get("SPARK_GRAFT_TIER_ONLY") == "1"
    from core2_spark.queries.registry import all_queries
    from core2_spark.session import get_spark

    spark = get_spark(
        app_name="core2-spark-bench",
        shuffle_partitions=8,
        extra_conf={
            "spark.scheduler.mode": "FAIR",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    queries = all_queries()

    result = _bench_tier(spark, queries, sf_dir)
    if tier_only:
        # Child mode (_run_tier_subprocess): emit the bare tier block.
        print(json.dumps(result))
        return
    out = {
        "metric": "headline_query_sweep_wall",
        "unit": "sec",
        "concurrency": CONCURRENCY,
        **result,
    }

    # Scale tiers: the sf1 (10×) and sf5 (50×) sweeps ride along in the
    # SAME JSON line so the round artifact tracks scale regressions, not
    # just sf0.1 — each tier in its OWN JVM (see _run_tier_subprocess).
    # Only when the seeded fixture tier exists (scripts/gen_fixtures.py
    # writes it; _data/ is not tracked) and the primary tier is the
    # driver default — a custom SPARK_GRAFT_SF_DIR run stays single-tier.
    sf1_dir = os.environ.get("SPARK_GRAFT_SF1_DIR", os.path.join(REPO, "_data", "sf1"))
    if (
        sf_dir == "/root/testdata/sf0.1"
        and os.path.isdir(sf1_dir)
        and os.environ.get("SPARK_GRAFT_SKIP_SF1") != "1"
    ):
        # Release the primary tier's JVM (32g heap + 32 executor
        # threads) before the tier children start — a resident idle
        # JVM still competes for cores/GC with the fresh ones.
        spark.stop()
        def in_process_fallback(tier_dir: str) -> dict:
            # Subprocess failed: re-measure in-process (flagged) — the
            # primary session was stopped above, so make a fresh one,
            # and STOP it afterwards: getOrCreate would otherwise hand
            # the sf5 fallback the sf1 fallback's still-running session
            # and its dirty heap — the exact cross-tier contamination
            # tier isolation exists to eliminate.
            sp = get_spark(
                app_name="core2-spark-bench-tier",
                shuffle_partitions=8,
                extra_conf={
                    "spark.scheduler.mode": "FAIR",
                    "spark.ui.showConsoleProgress": "false",
                },
            )
            try:
                return {
                    **_bench_tier(sp, queries, tier_dir),
                    "isolated_jvm": False,
                }
            finally:
                sp.stop()

        sf1 = _run_tier_subprocess(sf1_dir)
        if sf1 is None:
            sf1 = in_process_fallback(sf1_dir)
        sf1["sf"] = 1.0
        out["sf1"] = sf1
        sf5_dir = os.environ.get(
            "SPARK_GRAFT_SF5_DIR", os.path.join(REPO, "_data", "sf5")
        )
        if (
            os.path.isdir(sf5_dir)
            and os.environ.get("SPARK_GRAFT_SKIP_SF5") != "1"
        ):
            sf5 = _run_tier_subprocess(sf5_dir)
            if sf5 is None:
                sf5 = in_process_fallback(sf5_dir)
            sf5["sf"] = 5.0
            out["sf5"] = sf5

    print(json.dumps(out))

    # Driver artifact contract (VERDICT r10 task 2): BENCH_rN.json keeps
    # only the LAST 2000 chars of stdout and json-parses them.  The full
    # three-tier detail line outgrew that in r10, truncating the sf0.1
    # headline wall — the number BASELINE.md's 2x budget binds against —
    # out of the artifact.  Emit a compact summary as the final stdout
    # bytes, newline-padded so the 2000-char tail is exactly
    # (whitespace + summary line): parseable whether the driver loads
    # the raw tail or just its last line.
    summary = {
        "metric": "headline_query_sweep_wall",
        "unit": "sec",
        "concurrency": CONCURRENCY,
        "value": out["value"],
        "sf": out["sf"],
        "queries": out["queries"],
        "sweep_walls": out["sweep_walls"],
        "tiers": {
            f"sf{out['sf']}" if out["sf"] is not None else "primary": out[
                "value"
            ],
            **{
                k: out[k]["value"]
                for k in ("sf1", "sf5")
                if isinstance(out.get(k), dict)
            },
        },
        "isolated_jvm": {
            k: out[k].get("isolated_jvm")
            for k in ("sf1", "sf5")
            if isinstance(out.get(k), dict)
        },
        "detail": "full per-tier JSON on the first stdout line",
    }
    line = json.dumps(summary)
    sys.stdout.write("\n" * max(0, 2000 - len(line) - 1))
    print(line)


if __name__ == "__main__":
    main()
