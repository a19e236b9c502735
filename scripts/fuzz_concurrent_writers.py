#!/usr/bin/env python
"""Randomized N-writer x maintenance serializability fuzz.

Round-6 landed optimistic concurrent writers (CAS'd log persist,
staging-rename publish, WAL pending manifests, maintenance claims);
the example tests cover 2 writers.  This harness drives the three-way
races those can't reach: ``N>=3`` writer threads, each running a
seeded random program of Put/Delete transactions against overlapping
ids, interleaved with optimize / vacuum / materialized-view refresh
from the same threads, all with retries, over many random schedules.

Checked properties, per schedule:
  1. **Total order** — every returned commit carries a distinct
     basis time, and each thread's own commits are strictly
     increasing (no time travel, no shared slot).
  2. **Serial-replay equivalence** — the final table state equals a
     single-threaded Python replay of all committed ops sorted by
     their log-assigned basis time.  Catches lost updates,
     double-applied replays, and maintenance swaps dropping a
     concurrent writer's rows.
  3. **Mview convergence** — after a final refresh, the incremental
     materialized view equals a fresh aggregate of the final state
     (catches double-counted deltas from racing refreshes).

Maintenance refusals (ConcurrentWriterError from a stale handle) are
legal outcomes — the property is that nothing is lost or duplicated,
not that maintenance always wins.

Usage: python scripts/fuzz_concurrent_writers.py [n_schedules] [n_writers]
Prints one line per schedule and a final tally; exit 1 on any
violation.  tests/test_tx_ordering.py runs a bounded twin of this in
the suite; this script is the deep soak (>=200 schedules).
"""

from __future__ import annotations

import os
import random
import shutil
import sys
import threading
import time
from datetime import datetime, timedelta, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from core2_spark.engine import (
    Assert,
    ConcurrentWriterError,
    Delete,
    Engine,
    Patch,
    Put,
    TxAssertionError,
)

IDS = range(5)  # small id space so writers collide


# Dense mode (SPARK_GRAFT_FUZZ_DENSE=1): tilt the op mix toward
# publishes (put) and swap-based maintenance (optimize/vacuum) with
# longer programs — the interleave that maximizes publish-vs-decision
# overlap, which is the exact window the guarded swap's listing
# validation (engine._rewrite_atomic expect_files / vacuum's day-drop
# re-check) exists to close.  The soak prints engine.FENCE_STATS so
# "clean" provably means "the fence fired and held", not "the fence
# was never reached".
DENSE = os.environ.get("SPARK_GRAFT_FUZZ_DENSE") == "1"


def build_programs(rng: random.Random, n_writers: int):
    """Seeded per-writer op program.  Writers 0..n-1 draw
    Put/Delete/Patch/guarded-insert ops; every writer may also draw a
    maintenance op (optimize / vacuum / mview refresh) so maintenance
    races writers AND maintenance.  Patch ops hit both the existing
    column and a widening one ('p') so schema evolution runs under
    contention; guarded inserts (ASSERT + Put) may legally abort."""
    # cumulative draw thresholds: put/delete/patch/guarded/opt/vac/mview
    cuts = (
        (0.40, 0.48, 0.54, 0.58, 0.78, 0.94)  # dense: 36% swap-maint.
        if DENSE
        else (0.45, 0.60, 0.72, 0.80, 0.88, 0.94)
    )
    lo, hi = (3, 6) if DENSE else (2, 5)
    programs = []
    for w in range(n_writers):
        ops = []
        for i in range(rng.randint(lo, hi)):
            r = rng.random()
            if r < cuts[0]:
                ops.append(("put", rng.choice(IDS), f"w{w}op{i}"))
            elif r < cuts[1]:
                ops.append(("delete", rng.choice(IDS)))
            elif r < cuts[2]:
                key = "v" if rng.random() < 0.5 else "p"
                ops.append(("patch", rng.choice(IDS), key, f"w{w}patch{i}"))
            elif r < cuts[3]:
                ops.append(("guarded", rng.choice(IDS), f"w{w}grd{i}"))
            elif r < cuts[4]:
                ops.append(("optimize",))
            elif r < cuts[5]:
                ops.append(("vacuum",))
            else:
                ops.append(("mview",))
        programs.append(ops)
    return programs


def run_schedule(spark, seed: int, root: str, n_writers: int) -> list[str]:
    rng = random.Random(seed)
    programs = build_programs(rng, n_writers)
    engines = [
        Engine(spark, root, writer_retries=50, auto_refresh_views=True)
        for _ in range(n_writers)
    ]
    mk = lambda i, v: spark.createDataFrame([(i, v)], "id long, v string")
    mkids = lambda i: spark.createDataFrame([(i,)], "id long")

    engines[0].submit_tx([Put("t", mk(0, "init"))])
    engines[0].create_materialized_view(
        "mv", "t", ["id"], {"n": ("count", "*"), "mx": ("max", "v")}
    )
    for e in engines[1:]:
        e.refresh()

    lock = threading.Lock()
    committed: list[tuple[datetime, int, str, int | None, str | None]] = []
    per_thread: dict[int, list[datetime]] = {w: [] for w in range(n_writers)}
    errors: list[str] = []

    def maintenance(eng: Engine, op: tuple) -> None:
        # stale-handle refusal is legal; refresh and retry a few times
        for _ in range(8):
            try:
                if op[0] == "optimize":
                    eng.optimize("t", target_files=1)
                elif op[0] == "vacuum":
                    eng.vacuum(
                        "t",
                        older_than=datetime.now(timezone.utc).replace(
                            tzinfo=None
                        )
                        + timedelta(seconds=120),
                    )
                else:
                    eng.refresh_materialized_view("mv")
                return
            except ConcurrentWriterError:
                eng.refresh()
        # persistent refusal under churn is still a legal outcome

    def writer(w: int) -> None:
        eng = engines[w]
        for op in programs[w]:
            try:
                if op[0] == "put":
                    basis = eng.submit_tx([Put("t", mk(op[1], op[2]))])
                    with lock:
                        committed.append(
                            (basis.current_time, w, "put", op[1], op[2])
                        )
                        per_thread[w].append(basis.current_time)
                elif op[0] == "delete":
                    basis = eng.submit_tx([Delete("t", mkids(op[1]))])
                    with lock:
                        committed.append(
                            (basis.current_time, w, "delete", op[1], None)
                        )
                        per_thread[w].append(basis.current_time)
                elif op[0] == "patch":
                    basis = eng.submit_tx(
                        [Patch("t", ({"id": op[1], op[2]: op[3]},))]
                    )
                    with lock:
                        committed.append(
                            (basis.current_time, w, f"patch_{op[2]}",
                             op[1], op[3])
                        )
                        per_thread[w].append(basis.current_time)
                elif op[0] == "guarded":
                    try:
                        basis = eng.submit_tx(
                            [
                                Assert(
                                    "NOT EXISTS (SELECT 1 FROM t "
                                    f"WHERE id = {op[1]})"
                                ),
                                Put("t", mk(op[1], op[2])),
                            ]
                        )
                    except TxAssertionError:
                        continue  # the guard fired: a legal outcome
                    with lock:
                        committed.append(
                            (basis.current_time, w, "gput", op[1], op[2])
                        )
                        per_thread[w].append(basis.current_time)
                else:
                    maintenance(eng, op)
            except Exception as exc:  # noqa: BLE001 — fuzz collects all
                with lock:
                    errors.append(f"w{w} {op}: {type(exc).__name__}: {exc}")

    threads = [
        threading.Thread(target=writer, args=(w,)) for w in range(n_writers)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    problems = list(errors)

    # 1. total order
    times = [c[0] for c in committed]
    if len(set(times)) != len(times):
        problems.append(f"duplicate basis times: {sorted(times)}")
    for w, ts in per_thread.items():
        if ts != sorted(ts) or len(set(ts)) != len(ts):
            problems.append(f"w{w} commit times not strictly increasing: {ts}")

    # 2. serial replay in log order vs final state (documents: Put
    # replaces the whole row, Patch merges one key, a committed
    # guarded insert PROVES the id was absent at its log position)
    model: dict[int, dict] = {0: {"v": "init", "p": None}}
    for _, w, kind, i, v in sorted(committed, key=lambda c: c[0]):
        if kind == "put":
            model[i] = {"v": v, "p": None}
        elif kind == "gput":
            if i in model:
                problems.append(
                    f"guarded insert of id {i} by w{w} committed while "
                    f"the id existed in the serial replay — the ASSERT "
                    "was raced past"
                )
            model[i] = {"v": v, "p": None}
        elif kind == "patch_v":
            model.setdefault(i, {"v": None, "p": None})["v"] = v
        elif kind == "patch_p":
            model.setdefault(i, {"v": None, "p": None})["p"] = v
        else:
            model.pop(i, None)
    final_eng = Engine(spark, root)
    tdf = final_eng.db().table("t")
    has_p = "p" in tdf.columns
    actual = {
        r["id"]: {"v": r["v"], "p": r["p"] if has_p else None}
        for r in tdf.collect()
    }
    if actual != model:
        problems.append(f"final state {actual} != serial replay {model}")

    # 3. mview converges to a fresh aggregate of the final state
    final_eng.refresh_materialized_view("mv")
    mv = {
        r["id"]: (r["n"], r["mx"])
        for r in final_eng.materialized_view("mv").collect()
    }
    expect = {i: (1, d["v"]) for i, d in model.items()}
    if mv != expect:
        problems.append(f"mview {mv} != aggregate of final state {expect}")

    return problems


def main() -> int:
    n_schedules = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    n_writers = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    base = "_data/fuzz_writers"
    shutil.rmtree(base, ignore_errors=True)
    failures = 0
    t0 = time.time()
    for s in range(n_schedules):
        root = os.path.join(base, f"s{s}")
        problems = run_schedule(spark, seed=1000 + s, root=root, n_writers=n_writers)
        status = "ok" if not problems else "FAIL"
        print(
            f"[{s + 1}/{n_schedules}] seed={1000 + s} {status} "
            f"({time.time() - t0:.0f}s)"
        )
        for p in problems:
            print(f"    {p}")
        if problems:
            failures += 1
        else:
            shutil.rmtree(root, ignore_errors=True)  # keep only failures
    from core2_spark.engine import FENCE_STATS

    print(
        f"{n_schedules - failures}/{n_schedules} schedules clean, "
        f"{n_writers} writers, dense={DENSE}, {time.time() - t0:.0f}s total"
    )
    print(
        f"fence: {FENCE_STATS['listing_checks']} listing checks, "
        f"{FENCE_STATS['listing_aborts']} aborts (swap/drop stopped by a "
        "concurrent publish)"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
