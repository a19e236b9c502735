#!/usr/bin/env python
"""Randomized KILL -9 crash-recovery fuzz.

The concurrency soaks (`fuzz_concurrent_writers.py`) race live writers
but never kill one; the crash-window unit tests hand-arrange the
leftover files of specific windows.  This harness closes the gap with
REAL process death at a random instant: a writer subprocess (its own
Python driver + JVM, killed as a whole process group) runs a seeded
stream of Put/Delete transactions against a shared engine root,
journaling an INTENT line before each submit_tx and an fsync'd ACK
line after it returns.  The parent SIGKILLs the group at a random
delay, then opens a fresh Engine on the root (``reclaim_after_s=0`` —
the writer is provably dead) and checks:

  1. **Durability** — every ACKed transaction is fully visible.
  2. **Atomicity** — the final current state equals the Python replay
     of exactly the ACKed transactions, or of ACKed + the single
     begun-but-unACKed tail transaction (which may have committed
     after durability but before its ACK write).  Anything else —
     a partially-applied transaction, phantom rows from the in-flight
     tx, lost committed rows — fails.
  3. **Liveness** — a post-recovery transaction commits and is
     visible (stale _log.lock left by the corpse must be stolen,
     pending manifests rolled back, swap scratch reclaimed).

Usage: python scripts/fuzz_crash_recovery.py [n_schedules]
(child mode, internal: --child <root> <seed> <journal>)
Exit 1 on any violation.
"""

from __future__ import annotations

import json
import os
import random
import shutil
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

IDS = range(8)
TABLE = "t"


def _build_ops_spec(rng: random.Random, n: int) -> list[list]:
    """Seeded op list for transaction #n: 1-2 ops, puts dominate."""
    spec = []
    for k in range(rng.randint(1, 2)):
        if n == 0 or rng.random() < 0.7:
            ids = sorted(rng.sample(IDS, rng.randint(1, 3)))
            spec.append(["put", ids, f"t{n}op{k}"])
        else:
            ids = sorted(rng.sample(IDS, rng.randint(1, 2)))
            spec.append(["delete", ids])
    return spec


def _replay(op_lists: list[list[list]]) -> dict[int, str]:
    state: dict[int, str] = {}
    for ops in op_lists:
        for op in ops:
            if op[0] == "put":
                for i in op[1]:
                    state[i] = op[2]
            else:
                for i in op[1]:
                    state.pop(i, None)
    return state


def child_main(root: str, seed: int, journal: str) -> None:
    from pyspark.sql import SparkSession

    from core2_spark.engine import Delete, Engine, Put

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.driver.memory", "2g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    eng = Engine(spark, root)
    rng = random.Random(seed)

    def jlog(obj: dict) -> None:
        with open(journal, "a") as f:
            f.write(json.dumps(obj) + "\n")
            f.flush()
            os.fsync(f.fileno())

    print("READY", flush=True)
    n = 0
    while True:
        spec = _build_ops_spec(rng, n)
        jlog({"n": n, "phase": "begin", "ops": spec})
        ops = []
        for op in spec:
            if op[0] == "put":
                rows = spark.createDataFrame(
                    [(i, op[2]) for i in op[1]], "id long, v string"
                )
                ops.append(Put(TABLE, rows))
            else:
                ids = spark.createDataFrame([(i,) for i in op[1]], "id long")
                ops.append(Delete(TABLE, ids))
        eng.submit_tx(ops)
        jlog({"n": n, "phase": "ack"})
        n += 1
        # State-PRESERVING maintenance between transactions: a kill
        # landing mid-optimize/compact/vacuum swap exercises the
        # _old_/_tmp_ scratch recovery paths with real process death
        # (current-state replay is unaffected, so the parent's
        # invariants need no knowledge of these).
        if n >= 1 and rng.random() < 0.35:
            kind = rng.choice(("optimize", "compact", "vacuum"))
            if kind == "optimize":
                eng.optimize(TABLE)
            elif kind == "compact":
                eng.compact(TABLE)
            else:
                from datetime import datetime, timedelta, timezone

                # naive-UTC horizon past every derived tx time (same
                # convention as the concurrency soak): vacuums all
                # superseded versions, current state untouched
                eng.vacuum(
                    TABLE,
                    older_than=datetime.now(timezone.utc).replace(
                        tzinfo=None
                    )
                    + timedelta(seconds=120),
                )


def _read_journal(journal: str) -> tuple[list[list[list]], list[list] | None]:
    """Return (acked op-lists in order, the begun-but-unacked tail op
    list or None).  A torn final line (killed mid-write) is dropped."""
    begun: dict[int, list[list]] = {}
    acked: set[int] = set()
    if os.path.exists(journal):
        with open(journal) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue  # torn tail write
                if rec["phase"] == "begin":
                    begun[rec["n"]] = rec["ops"]
                else:
                    acked.add(rec["n"])
    acked_ops = [begun[n] for n in sorted(acked)]
    # sequential writer: at most one begun-unacked, and it is the max n
    tail = None
    unacked = sorted(set(begun) - acked)
    assert len(unacked) <= 1, f"journal shows >1 in-flight tx: {unacked}"
    if unacked:
        tail = begun[unacked[0]]
    return acked_ops, tail


def run_schedule(spark, seed: int, base: str) -> list[str]:
    from pyspark.sql import functions as F  # noqa: F401

    from core2_spark.engine import Engine, Put

    root = os.path.join(base, f"seed{seed}")
    journal = os.path.join(base, f"journal{seed}.jsonl")
    shutil.rmtree(root, ignore_errors=True)
    for p in (journal,):
        if os.path.exists(p):
            os.remove(p)
    rng = random.Random(seed * 7919)
    problems: list[str] = []

    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--child", root,
         str(seed), journal],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        start_new_session=True,  # whole group (python + JVM) killable
        cwd=REPO,
    )
    try:
        line = proc.stdout.readline()  # blocks until READY
        if "READY" not in line:
            problems.append(f"child died before READY: {line!r}")
            return problems
        time.sleep(rng.uniform(0.5, 14.0))
    finally:
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except ProcessLookupError:
            pass
        proc.wait()

    acked_ops, tail = _read_journal(journal)

    eng = Engine(spark, root, reclaim_after_s=0.0)
    tables = eng._all_tables()
    if TABLE in tables:
        cur = eng.db().table(TABLE).select("id", "v").collect()
        got = {r["id"]: r["v"] for r in cur}
        if len(got) != len(cur):
            problems.append("duplicate ids in current state")
    else:
        got = {}

    candidates = [_replay(acked_ops)]
    if tail is not None:
        candidates.append(_replay(acked_ops + [tail]))
    if got not in candidates:
        problems.append(
            f"state mismatch: got={got} not in "
            f"acked-replay={candidates[0]}"
            + (f" or acked+tail-replay={candidates[1]}" if tail else "")
        )

    # liveness: the corpse's leftovers (stale lock, pending manifest,
    # stage scratch) must not wedge the next writer
    post = spark.createDataFrame([(99, "post")], "id long, v string")
    try:
        eng.submit_tx([Put(TABLE, post)])
        after = {
            r["id"]: r["v"]
            for r in eng.db().table(TABLE).select("id", "v").collect()
        }
        if after.get(99) != "post":
            problems.append("post-recovery tx not visible")
    except Exception as exc:  # noqa: BLE001
        problems.append(f"post-recovery tx failed: {exc!r}")
    return problems


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child_main(sys.argv[2], int(sys.argv[3]), sys.argv[4])
        return 0
    n_schedules = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    # overridable so concurrent fuzz invocations never share (and
    # rmtree) each other's scratch
    base = os.environ.get(
        "SPARK_GRAFT_CRASH_BASE", os.path.join(REPO, "_data", "fuzz_crash")
    )
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base, exist_ok=True)
    t0 = time.time()
    failures = 0
    for s in range(n_schedules):
        seed = 3000 + s
        try:
            problems = run_schedule(spark, seed=seed, base=base)
        except Exception as exc:  # noqa: BLE001 — a verification crash IS a finding
            import traceback

            traceback.print_exc()
            problems = [f"verification crashed: {type(exc).__name__}: {exc}"]
        status = "OK" if not problems else "FAIL " + "; ".join(problems)
        print(f"[{s + 1}/{n_schedules}] seed={seed} {status}", flush=True)
        if problems:
            failures += 1
        else:
            shutil.rmtree(os.path.join(base, f"seed{seed}"), ignore_errors=True)
    print(
        f"{n_schedules - failures}/{n_schedules} schedules clean, "
        f"{time.time() - t0:.0f}s total"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
