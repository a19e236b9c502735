#!/usr/bin/env python
"""Reader snapshot-consistency fuzz: torn reads under writer chaos.

The concurrency soaks validate the FINAL state after racing writers
and maintenance; nothing validates what concurrent READERS observe
mid-race.  The engine's claim (SURVEY.md §3.3, the reference's basis
semantics) is that every read resolves a consistent snapshot: the
state at SOME position of the total transaction order — never a mix
of two transactions, never a half-applied maintenance swap.

Per schedule: N writer threads run seeded Put/Delete/Patch programs
with interleaved optimize/vacuum swaps (same op vocabulary as
`fuzz_concurrent_writers.py`), while M reader threads loop
refresh→read.  Every observed state must equal the Python replay of
some PREFIX of the final committed order (prefix membership is exact:
duplicate-free basis times give one total order).  Reads that fail
because a swap yanked files mid-plan are counted as retries — a
legal, loud outcome — but a read that RETURNS data must return a
serial-prefix state.  Each reader also re-collects one pinned
Snapshot to check repeatable reads (same basis → same rows, or a
clean error if vacuum dropped its files).

Usage: python scripts/fuzz_reader_snapshots.py [n_schedules] [n_writers] [n_readers]
Exit 1 on any violation; prints read/retry counts so "clean" can't
mean "every read errored".
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

from core2_spark.engine import ConcurrentWriterError, Delete, Engine, Patch, Put

IDS = range(5)


def build_programs(rng: random.Random, n_writers: int):
    """Seeded writer programs: puts/deletes/patches + swap maintenance
    (no guarded inserts/mviews — reader visibility is the target)."""
    programs = []
    for w in range(n_writers):
        ops = []
        for i in range(rng.randint(3, 6)):
            r = rng.random()
            if r < 0.45:
                ops.append(("put", rng.choice(IDS), f"w{w}op{i}"))
            elif r < 0.60:
                ops.append(("delete", rng.choice(IDS)))
            elif r < 0.72:
                key = "v" if rng.random() < 0.5 else "p"
                ops.append(("patch", rng.choice(IDS), key, f"w{w}patch{i}"))
            elif r < 0.88:
                ops.append(("optimize",))
            else:
                ops.append(("vacuum",))
        programs.append(ops)
    return programs


def _replay_prefixes(committed: list[tuple]) -> list[dict]:
    """All prefix states of the committed order (index k = state after
    the first k transactions), rows normalized to {id: (v, p)}."""
    states = []
    model: dict[int, dict] = {0: {"v": "init", "p": None}}
    states.append({i: (d["v"], d["p"]) for i, d in model.items()})
    for _, kind, i, v in sorted(committed, key=lambda c: c[0]):
        if kind == "put":
            model[i] = {"v": v, "p": None}
        elif kind == "patch_v":
            model.setdefault(i, {"v": None, "p": None})["v"] = v
        elif kind == "patch_p":
            model.setdefault(i, {"v": None, "p": None})["p"] = v
        else:
            model.pop(i, None)
        states.append({i: (d["v"], d["p"]) for i, d in model.items()})
    return states


def run_schedule(
    spark, seed: int, root: str, n_writers: int, n_readers: int
) -> tuple[list[str], int, int]:
    rng = random.Random(seed)
    programs = build_programs(rng, n_writers)
    engines = [
        Engine(spark, root, writer_retries=50) for _ in range(n_writers)
    ]
    mk = lambda i, v: spark.createDataFrame([(i, v)], "id long, v string")
    mkids = lambda i: spark.createDataFrame([(i,)], "id long")
    engines[0].submit_tx([Put("t", mk(0, "init"))])
    for e in engines[1:]:
        e.refresh()

    lock = threading.Lock()
    committed: list[tuple] = []
    errors: list[str] = []
    observed: list[dict] = []
    reads_ok = reads_retried = 0
    writers_done = threading.Event()

    def maintenance(eng: Engine, op: tuple) -> None:
        for _ in range(8):
            try:
                if op[0] == "optimize":
                    eng.optimize("t", target_files=1)
                else:
                    eng.vacuum(
                        "t",
                        older_than=datetime.now(timezone.utc).replace(
                            tzinfo=None
                        )
                        + timedelta(seconds=120),
                    )
                return
            except ConcurrentWriterError:
                eng.refresh()

    def writer(w: int) -> None:
        eng = engines[w]
        for op in programs[w]:
            try:
                if op[0] == "put":
                    b = eng.submit_tx([Put("t", mk(op[1], op[2]))])
                    with lock:
                        committed.append((b.current_time, "put", op[1], op[2]))
                elif op[0] == "delete":
                    b = eng.submit_tx([Delete("t", mkids(op[1]))])
                    with lock:
                        committed.append((b.current_time, "delete", op[1], None))
                elif op[0] == "patch":
                    b = eng.submit_tx(
                        [Patch("t", ({"id": op[1], op[2]: op[3]},))]
                    )
                    with lock:
                        committed.append(
                            (b.current_time, f"patch_{op[2]}", op[1], op[3])
                        )
                else:
                    maintenance(eng, op)
            except Exception as exc:  # noqa: BLE001
                with lock:
                    errors.append(f"w{w} {op}: {type(exc).__name__}: {exc}")

    def reader(r: int) -> None:
        nonlocal reads_ok, reads_retried
        eng = Engine(spark, root)
        while not writers_done.is_set():
            try:
                eng.refresh()
                snap = eng.db()
                tdf = snap.table("t")
                has_p = "p" in tdf.columns
                rows = tdf.collect()
                state = {
                    x["id"]: (x["v"], x["p"] if has_p else None)
                    for x in rows
                }
                if len(state) != len(rows):
                    with lock:
                        errors.append(f"r{r}: duplicate ids in read: {rows}")
                # repeatable read: the SAME pinned snapshot again
                try:
                    again = {
                        x["id"]: (x["v"], x["p"] if has_p else None)
                        for x in snap.table("t").collect()
                    }
                    if again != state:
                        with lock:
                            errors.append(
                                f"r{r}: pinned snapshot not repeatable: "
                                f"{state} then {again}"
                            )
                except Exception:  # noqa: BLE001 — vacuum took its files
                    pass
                with lock:
                    observed.append(state)
                    reads_ok += 1
            except Exception:  # noqa: BLE001 — swap yanked files mid-plan
                with lock:
                    reads_retried += 1
            time.sleep(0.01)

    wthreads = [
        threading.Thread(target=writer, args=(w,)) for w in range(n_writers)
    ]
    rthreads = [
        threading.Thread(target=reader, args=(r,)) for r in range(n_readers)
    ]
    for t in rthreads + wthreads:
        t.start()
    for t in wthreads:
        t.join()
    writers_done.set()
    for t in rthreads:
        t.join()

    problems = list(errors)
    times = [c[0] for c in committed]
    if len(set(times)) != len(times):
        problems.append(f"duplicate basis times: {sorted(times)}")
    prefixes = _replay_prefixes(committed)
    for state in observed:
        if state not in prefixes:
            problems.append(
                f"TORN READ: {state} matches no serial prefix "
                f"(final={prefixes[-1]})"
            )
    return problems, reads_ok, reads_retried


def main() -> int:
    n_schedules = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    n_writers = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    n_readers = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    base = os.environ.get(
        "SPARK_GRAFT_READER_BASE",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "_data", "fuzz_readers",
        ),
    )
    shutil.rmtree(base, ignore_errors=True)
    t0 = time.time()
    failures = 0
    tot_ok = tot_retry = 0
    for s in range(n_schedules):
        seed = 5000 + s
        root = os.path.join(base, f"s{s}")
        problems, ok, retried = run_schedule(
            spark, seed=seed, root=root, n_writers=n_writers,
            n_readers=n_readers,
        )
        tot_ok += ok
        tot_retry += retried
        status = "ok" if not problems else "FAIL " + "; ".join(problems)
        print(
            f"[{s + 1}/{n_schedules}] seed={seed} {status} "
            f"(reads={ok} retries={retried})",
            flush=True,
        )
        if problems:
            failures += 1
        else:
            shutil.rmtree(root, ignore_errors=True)
    print(
        f"{n_schedules - failures}/{n_schedules} schedules clean, "
        f"{n_writers}w/{n_readers}r, reads={tot_ok} retries={tot_retry}, "
        f"{time.time() - t0:.0f}s total"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
