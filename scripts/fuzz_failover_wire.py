#!/usr/bin/env python
"""Cross-engine failover fuzz: kill a writer engine, bring up a NEW
engine on the same root mid-schedule, while wire readers poll through
(VERDICT r9 task 4).

`fuzz_crash_recovery.py` proves one engine's durability after kill -9;
`fuzz_wire_under_writers.py` proves wire snapshot consistency under
live (never-killed) writers.  Neither exercises the path a real
deployment fails through: the writer PROCESS dies, a replacement
engine boots on the same storage root (running recovery — stale-lock
steal, pending-manifest rollback, husk cleanup), resumes writing, and
the read tier's long-lived wire sessions must ride across the whole
failover without a torn read or a wedged connection.

Per schedule:
  1. Writer-1 (own subprocess: Python driver + JVM, its own engine)
     runs a seeded Put/Delete + maintenance stream against the shared
     root, journaling INTENT before and fsync'd ACK after each
     submit_tx (the crash-fuzz journal protocol).
  2. pgwire / HTTP / Arrow Flight clients in the parent poll
     ``SELECT id, v FROM t`` continuously against a serving engine
     that refreshes per request.
  3. The parent SIGKILLs writer-1's process group at a random instant.
  4. The parent immediately boots writer-2 — a NEW subprocess whose
     Engine(root, reclaim_after_s=0) runs recovery against the
     corpse's leftovers WHILE the readers keep polling — and writer-2
     runs a second seeded stream to completion.
  5. Quiesce.  Properties:
     a. NO TORN READS: every wire response decodes to the replay of a
        prefix of [acked-1 ops] (+ optionally the begun-unACKed tail,
        which may have committed before the kill) followed by a
        prefix of [acked-2 ops].
     b. NO LOST COMMITTED WRITES: the final state (fresh verification
        engine AND every transport's quiesce read) equals the replay
        of all acked-1 (+tail-1 iff it committed) + all acked-2 ops.
     c. LIVENESS: writer-2 ACKs every transaction, and each wire
        client's SAME connection/endpoint serves the quiesce read.
     Failed requests while files vanish mid-plan are counted retries
     (sessions must survive), and retry tallies are printed so
     "clean" can't mean "every request errored".

Usage: python scripts/fuzz_failover_wire.py [n_schedules]
(child mode, internal: --child <root> <seed> <journal> <n_tx>)
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
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

IDS = range(8)
TABLE = "t"
SQL = "SELECT id, v FROM t ORDER BY id"


def _build_ops_spec(rng: random.Random, n: int) -> list[list]:
    """Seeded op list for transaction #n (crash-fuzz shape)."""
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


def child_main(root: str, seed: int, journal: str, n_tx: int) -> None:
    """Writer subprocess.  n_tx < 0: run forever (writer-1, killed by
    the parent); n_tx >= 0: run exactly n_tx transactions and exit 0
    (writer-2, the failover replacement — its Engine() init IS the
    recovery under test)."""
    from pyspark.sql import SparkSession

    from core2_spark.engine import Delete, Engine, Put

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.driver.memory", "2g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    eng = Engine(spark, root, reclaim_after_s=0.0)
    rng = random.Random(seed)

    def jlog(obj: dict) -> None:
        with open(journal, "a") as f:
            f.write(json.dumps(obj) + "\n")
            f.flush()
            os.fsync(f.fileno())

    print("READY", flush=True)
    n = 0
    while n_tx < 0 or n < n_tx:
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
        if n >= 1 and rng.random() < 0.3:
            kind = rng.choice(("optimize", "compact"))
            if kind == "optimize":
                eng.optimize(TABLE)
            else:
                eng.compact(TABLE)


def _read_journal(journal: str) -> tuple[list[list[list]], list[list] | None]:
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
    tail = None
    unacked = sorted(set(begun) - acked)
    assert len(unacked) <= 1, f"journal shows >1 in-flight tx: {unacked}"
    if unacked:
        tail = begun[unacked[0]]
    return acked_ops, tail


def _spawn_writer(root: str, seed: int, journal: str, n_tx: int):
    return subprocess.Popen(
        [
            sys.executable,
            os.path.abspath(__file__),
            "--child",
            root,
            str(seed),
            journal,
            str(n_tx),
        ],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        start_new_session=True,
        cwd=REPO,
    )


def run_schedule(spark, seed: int, base: str) -> tuple[list[str], dict]:
    from core2_spark.engine import Engine
    from core2_spark.flight_server import SqlFlightServer, fetch_sql
    from core2_spark.http_server import SqlHttpServer, http_query
    from core2_spark.pgwire_server import PgWireServer
    from tests.test_pgwire_server import MiniPgClient

    root = os.path.join(base, f"seed{seed}")
    j1 = os.path.join(base, f"journal{seed}_1.jsonl")
    j2 = os.path.join(base, f"journal{seed}_2.jsonl")
    shutil.rmtree(root, ignore_errors=True)
    for p in (j1, j2):
        if os.path.exists(p):
            os.remove(p)
    rng = random.Random(seed * 104729)
    problems: list[str] = []
    tallies = {
        "pg_ok": 0, "pg_retry": 0,
        "http_ok": 0, "http_retry": 0,
        "flight_ok": 0, "flight_retry": 0,
    }
    observed: list[tuple[str, dict]] = []
    done = threading.Event()
    lock = threading.Lock()

    # Serving engine: refresh-to-head per request, one executor shared
    # by all three transports (the wire-fuzz convention).
    exec_lock = threading.Lock()
    srv_eng_box: dict = {}

    def executor(sql: str):
        with exec_lock:
            if "e" not in srv_eng_box:
                srv_eng_box["e"] = Engine(spark, root)
            srv_eng_box["e"].refresh()
            return srv_eng_box["e"].db().sql(sql)

    pg = PgWireServer(executor)
    http = SqlHttpServer(executor)
    flight = SqlFlightServer(executor)
    flight_loc = f"grpc://127.0.0.1:{flight.port}"

    def _decode(cols, rows) -> dict:
        ci = {c: k for k, c in enumerate(cols)}
        return {int(r[ci["id"]]): r[ci["v"]] for r in rows}

    def pg_client() -> None:
        client = MiniPgClient(pg.port)
        while not done.is_set():
            cols, rows, err = client.query(SQL)
            with lock:
                if err is not None:
                    tallies["pg_retry"] += 1
                else:
                    observed.append(("pg", _decode(cols, rows)))
                    tallies["pg_ok"] += 1
            time.sleep(0.01)
        cols, rows, err = client.query(SQL)  # same session at quiesce
        with lock:
            if err is not None:
                problems.append(f"pg final read failed: {err}")
            else:
                observed.append(("pg_final", _decode(cols, rows)))
        client.close()

    def http_client() -> None:
        while not done.is_set():
            try:
                payload = http_query(http.port, SQL)
            except Exception:  # noqa: BLE001 — swap/rollback mid-plan
                with lock:
                    tallies["http_retry"] += 1
                time.sleep(0.01)
                continue
            with lock:
                observed.append(
                    ("http", _decode(payload["columns"], payload["rows"]))
                )
                tallies["http_ok"] += 1
            time.sleep(0.01)
        try:
            payload = http_query(http.port, SQL)
            with lock:
                observed.append(
                    ("http_final", _decode(payload["columns"], payload["rows"]))
                )
        except Exception as exc:  # noqa: BLE001
            with lock:
                problems.append(f"http final read failed: {exc}")

    def flight_client() -> None:
        def fetch():
            tab = fetch_sql(flight_loc, SQL)
            cols = tab.column_names
            rows = (
                list(zip(*[tab.column(c).to_pylist() for c in cols]))
                if tab.num_rows
                else []
            )
            return _decode(cols, rows)

        while not done.is_set():
            try:
                st = fetch()
            except Exception:  # noqa: BLE001
                with lock:
                    tallies["flight_retry"] += 1
                time.sleep(0.01)
                continue
            with lock:
                observed.append(("flight", st))
                tallies["flight_ok"] += 1
            time.sleep(0.01)
        try:
            st = fetch()
            with lock:
                observed.append(("flight_final", st))
        except Exception as exc:  # noqa: BLE001
            with lock:
                problems.append(f"flight final read failed: {exc}")

    clients = [
        threading.Thread(target=pg_client),
        threading.Thread(target=http_client),
        threading.Thread(target=flight_client),
    ]

    p1 = p2 = None
    try:
        # ---- writer-1: killed at a random instant ----
        p1 = _spawn_writer(root, seed, j1, -1)
        line = p1.stdout.readline()
        if "READY" not in line:
            return [f"writer-1 died before READY: {line!r}"], tallies
        for t in clients:
            t.start()
        time.sleep(rng.uniform(0.5, 8.0))
        try:
            os.killpg(p1.pid, signal.SIGKILL)
        except ProcessLookupError:
            pass
        p1.wait()

        # ---- failover: NEW engine on the same root, readers live ----
        n_tx2 = rng.randint(4, 8)
        p2 = _spawn_writer(root, seed + 500_000, j2, n_tx2)
        line = p2.stdout.readline()
        if "READY" not in line:
            problems.append(f"writer-2 died before READY: {line!r}")
        else:
            rc = p2.wait(timeout=300)
            if rc != 0:
                problems.append(f"writer-2 exited rc={rc}")
    finally:
        for p in (p1, p2):
            if p is not None:
                try:
                    os.killpg(p.pid, signal.SIGKILL)
                except ProcessLookupError:
                    pass
                p.wait()
        done.set()
        for t in clients:
            t.join()
        pg.shutdown()
        http.shutdown()
        flight.shutdown()

    a1, t1 = _read_journal(j1)
    a2, t2 = _read_journal(j2)
    if t2 is not None:
        problems.append(f"writer-2 has an unACKed tx: {t2}")  # liveness c
    # Valid observable states: prefixes of a1, optionally a1+t1, then
    # either branch extended by prefixes of a2.
    valid: list[dict] = []
    for i in range(len(a1) + 1):
        valid.append(_replay(a1[:i]))
    bases = [a1]
    if t1 is not None:
        valid.append(_replay(a1 + [t1]))
        bases.append(a1 + [t1])
    for b in bases:
        for j in range(1, len(a2) + 1):
            valid.append(_replay(b + a2[:j]))
    finals = [_replay(b + a2) for b in bases]

    for transport, st in observed:
        if transport.endswith("_final"):
            if st not in finals:
                problems.append(
                    f"{transport}: quiesce read {st} != any final {finals}"
                )
        elif st not in valid:
            problems.append(f"{transport}: torn read {st}")

    # Independent verification engine: committed state on disk.
    from core2_spark.engine import Engine as VEngine

    veng = VEngine(spark, root, reclaim_after_s=0.0)
    if TABLE in veng._all_tables():
        cur = veng.db().table(TABLE).select("id", "v").collect()
        got = {r["id"]: r["v"] for r in cur}
        if len(got) != len(cur):
            problems.append("duplicate ids in final state")
    else:
        got = {}
    if got not in finals:
        problems.append(f"disk state {got} != any final {finals}")
    return problems, tallies


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child_main(
            sys.argv[2], int(sys.argv[3]), sys.argv[4], int(sys.argv[5])
        )
        return 0
    n_schedules = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    base = os.environ.get(
        "SPARK_GRAFT_FAILOVER_BASE", os.path.join(REPO, "_data", "fuzz_failover")
    )
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base, exist_ok=True)
    t0 = time.time()
    failures = 0
    totals = {
        "pg_ok": 0, "pg_retry": 0,
        "http_ok": 0, "http_retry": 0,
        "flight_ok": 0, "flight_retry": 0,
    }
    for s in range(n_schedules):
        seed = 9000 + s
        try:
            problems, tallies = run_schedule(spark, seed=seed, base=base)
        except Exception as exc:  # noqa: BLE001 — a verification crash IS a finding
            import traceback

            traceback.print_exc()
            problems, tallies = (
                [f"verification crashed: {type(exc).__name__}: {exc}"],
                dict.fromkeys(totals, 0),
            )
        for k in totals:
            totals[k] += tallies.get(k, 0)
        status = "ok" if not problems else "FAIL " + "; ".join(problems[:4])
        print(
            f"[{s + 1}/{n_schedules}] seed={seed} {status} "
            f"({time.time() - t0:.0f}s) {tallies}",
            flush=True,
        )
        if problems:
            failures += 1
        else:
            shutil.rmtree(os.path.join(base, f"seed{seed}"), ignore_errors=True)
    print(
        f"{n_schedules - failures}/{n_schedules} schedules clean, "
        f"totals={totals}, {time.time() - t0:.0f}s"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
