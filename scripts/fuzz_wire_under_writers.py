#!/usr/bin/env python
"""Wire-protocol snapshot consistency under writer chaos.

`fuzz_reader_snapshots.py` proved in-process readers never see torn
state while writers and maintenance race; this harness proves the same
property THROUGH THE CLIENT BOUNDARY — a live pgwire socket, a live HTTP
/query endpoint and an Arrow Flight server — where an extra layer (executor threads, result
serialization, per-request engine refresh, error framing) could leak a
half-applied swap or wedge a session.

Per schedule: N writer threads run the reader-fuzz's seeded
Put/Delete/Patch + optimize/vacuum programs and a fourth actor ingests
rows via Arrow Flight DoPut (atomic wire transactions on a disjoint
id space), while three wire clients
(pgwire simple-query, HTTP JSON, Arrow Flight DoGet) poll
``SELECT id, v, p FROM t``.  Properties:

  1. Every response that returns data decodes to the Python replay of
     some PREFIX of the final committed order (torn reads reach the
     wire exactly never).
  2. A failed request (swap yanked files mid-plan → ErrorResponse /
     HTTP 4xx-5xx) is a counted retry, and the SAME connection must
     serve the next request — chaos must not wedge a session.
  3. At quiesce, every transport returns the exact final serial state.

Usage: python scripts/fuzz_wire_under_writers.py [n_schedules] [n_writers]
Exit 1 on any violation; prints per-transport read/retry tallies so
"clean" can't mean "every request errored".
"""

from __future__ import annotations

import os
import random
import shutil
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

import fuzz_reader_snapshots as frs  # noqa: E402 — same-dir sibling
from core2_spark.engine import ConcurrentWriterError, Delete, Engine, Patch, Put
from core2_spark.flight_server import SqlFlightServer, fetch_sql, put_table
from core2_spark.http_server import SqlHttpServer, http_query
from core2_spark.pgwire_server import PgWireServer
from tests.test_pgwire_server import MiniPgClient

SQL = "SELECT id, v, p FROM t ORDER BY id"
SQL_NO_P = "SELECT id, v FROM t ORDER BY id"


def run_schedule(spark, seed: int, root: str, n_writers: int):
    rng = random.Random(seed)
    programs = frs.build_programs(rng, n_writers)
    engines = [Engine(spark, root, writer_retries=50) for _ in range(n_writers)]
    mk = lambda i, v: spark.createDataFrame([(i, v)], "id long, v string")
    mkids = lambda i: spark.createDataFrame([(i,)], "id long")
    engines[0].submit_tx([Put("t", mk(0, "init"))])
    for e in engines[1:]:
        e.refresh()

    lock = threading.Lock()
    committed: list[tuple] = []
    ingested: list[tuple[int, str]] = []  # wire-DoPut rows (ids >= 100)
    errors: list[str] = []
    observed: list[tuple[str, dict]] = []
    tallies = {
        "pg_ok": 0, "pg_retry": 0,
        "http_ok": 0, "http_retry": 0,
        "flight_ok": 0, "flight_retry": 0,
    }
    writers_done = threading.Event()

    # One serving engine per transport; the executor refreshes to the
    # current head per request (stale-but-consistent is legal — the
    # prefix check is the property).  The lock serializes refresh+plan
    # against the server's handler threads, not against the writers.
    exec_lock = threading.Lock()
    srv_eng = Engine(spark, root)

    def executor(sql: str):
        with exec_lock:
            srv_eng.refresh()
            return srv_eng.db().sql(sql)

    pg = PgWireServer(executor)
    http = SqlHttpServer(executor)
    # DoPut commits land on a DEDICATED engine (one-engine-per-writer,
    # the same convention as the chaos writer threads): submit_tx
    # mutates engine state, and sharing srv_eng would race the
    # exec_lock-protected refresh+plan path on the read transports.
    ingest_eng = Engine(spark, root, writer_retries=50)
    flight = SqlFlightServer(executor, engine=ingest_eng)
    flight_loc = f"grpc://127.0.0.1:{flight.port}"

    def maintenance(eng: Engine, op: tuple) -> None:
        for _ in range(8):
            try:
                if op[0] == "optimize":
                    eng.optimize("t", target_files=1)
                else:
                    from datetime import datetime, timedelta, timezone

                    eng.vacuum(
                        "t",
                        older_than=datetime.now(timezone.utc).replace(tzinfo=None)
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
                    b = eng.submit_tx([Patch("t", ({"id": op[1], op[2]: op[3]},))])
                    with lock:
                        committed.append(
                            (b.current_time, f"patch_{op[2]}", op[1], op[3])
                        )
                else:
                    maintenance(eng, op)
            except Exception as exc:  # noqa: BLE001
                with lock:
                    errors.append(f"w{w} {op}: {type(exc).__name__}: {exc}")

    def _decode(cols, rows) -> tuple[dict, bool]:
        """Returns (state, has_p).  A v-only read (the 'p' column does
        not exist yet, or the fallback query ran) is checked against
        v-PROJECTED prefixes — never against full states, so a
        fallback after a transient failure can't fake a torn read."""
        ci = {c: k for k, c in enumerate(cols)}
        has_p = "p" in ci
        state = {}
        for rec in rows:
            i = int(rec[ci["id"]])
            v = rec[ci["v"]]
            p = rec[ci["p"]] if has_p else None
            state[i] = (v, p) if has_p else v
        return state, has_p

    def pg_client() -> None:
        client = MiniPgClient(pg.port)
        while not writers_done.is_set():
            # 'p' appears only after the first patch lands; fall back
            cols, rows, err = client.query(SQL)
            if err is not None:
                cols, rows, err = client.query(SQL_NO_P)
            if err is not None:
                with lock:
                    tallies["pg_retry"] += 1
            else:
                st, has_p = _decode(cols, rows)
                with lock:
                    observed.append(("pg", st, has_p))
                    tallies["pg_ok"] += 1
            time.sleep(0.01)
        # property 3: the SAME session reads the final state at quiesce
        cols, rows, err = client.query(SQL)
        if err is not None:
            cols, rows, err = client.query(SQL_NO_P)
        if err is not None:
            with lock:
                errors.append(f"pg final read failed: {err}")
        else:
            st, has_p = _decode(cols, rows)
            with lock:
                observed.append(("pg_final", st, has_p))
        client.close()

    def http_client() -> None:
        while not writers_done.is_set():
            try:
                payload = http_query(http.port, SQL)
            except Exception:  # noqa: BLE001 — swap mid-plan → HTTP error
                try:
                    payload = http_query(http.port, SQL_NO_P)
                except Exception:  # noqa: BLE001
                    with lock:
                        tallies["http_retry"] += 1
                    time.sleep(0.01)
                    continue
            st, has_p = _decode(payload["columns"], payload["rows"])
            with lock:
                observed.append(("http", st, has_p))
                tallies["http_ok"] += 1
            time.sleep(0.01)
        try:
            payload = http_query(http.port, SQL)
        except Exception:
            try:
                payload = http_query(http.port, SQL_NO_P)
            except Exception as exc:  # noqa: BLE001
                with lock:
                    errors.append(f"http final read failed: {exc}")
                return
        st, has_p = _decode(payload["columns"], payload["rows"])
        with lock:
            observed.append(("http_final", st, has_p))

    def _flight_fetch():
        """Arrow Flight DoGet with the v-only fallback (new connection
        per request — Flight's model; the server must survive chaos)."""
        try:
            tab = fetch_sql(flight_loc, SQL)
        except Exception:  # noqa: BLE001
            tab = fetch_sql(flight_loc, SQL_NO_P)
        cols = tab.column_names
        rows = list(zip(*[tab.column(c).to_pylist() for c in cols])) if tab.num_rows else []
        return cols, rows

    def flight_client() -> None:
        while not writers_done.is_set():
            try:
                cols, rows = _flight_fetch()
            except Exception:  # noqa: BLE001 — swap mid-plan → FlightServerError
                with lock:
                    tallies["flight_retry"] += 1
                time.sleep(0.01)
                continue
            st, has_p = _decode(cols, rows)
            with lock:
                observed.append(("flight", st, has_p))
                tallies["flight_ok"] += 1
            time.sleep(0.01)
        try:
            cols, rows = _flight_fetch()
        except Exception as exc:  # noqa: BLE001
            with lock:
                errors.append(f"flight final read failed: {exc}")
            return
        st, has_p = _decode(cols, rows)
        with lock:
            observed.append(("flight_final", st, has_p))

    def wire_ingest() -> None:
        """Fourth actor: Arrow Flight DoPut ingest (one atomic engine
        transaction per upload) racing the writers and swaps.  Ids
        >= 100 are disjoint from the chaos id space, so consistency
        decomposes: the chaos projection of every read must still be
        a serial prefix, and the wire projection must be a subset of
        the successfully ingested rows with exact values."""
        import pyarrow as pa

        for k in range(5):
            tab = pa.table({"id": pa.array([100 + k], pa.int64()),
                            "v": pa.array([f"wire{k}"])})
            for _ in range(10):
                try:
                    put_table(flight_loc, "t", tab)
                    with lock:
                        ingested.append((100 + k, f"wire{k}"))
                    break
                except Exception:  # noqa: BLE001 — concurrent-writer retry
                    time.sleep(0.05)
            time.sleep(0.02)

    wthreads = [threading.Thread(target=writer, args=(w,)) for w in range(n_writers)]
    cthreads = [
        threading.Thread(target=pg_client),
        threading.Thread(target=http_client),
        threading.Thread(target=flight_client),
    ]
    wthreads.append(threading.Thread(target=wire_ingest))
    try:
        for t in cthreads + wthreads:
            t.start()
        for t in wthreads:
            t.join()
        writers_done.set()
        for t in cthreads:
            t.join()
    finally:
        pg.shutdown()
        http.shutdown()
        flight.shutdown()

    # prefix check against the total committed order.  Wire-ingested
    # ids (>= 100) are disjoint from the chaos id space: the chaos
    # projection of every read must be a serial prefix, and the wire
    # projection a value-exact subset of the ingested ledger.
    states = frs._replay_prefixes(committed)
    vstates = [{i: vp[0] for i, vp in s.items()} for s in states]
    final, vfinal = states[-1], vstates[-1]
    wire_final = dict(ingested)
    for transport, st, has_p in observed:
        chaos = {i: x for i, x in st.items() if i < 100}
        wire = {i: x for i, x in st.items() if i >= 100}
        ok = (chaos in states) if has_p else (chaos in vstates)
        if not ok:
            errors.append(f"{transport}: torn read {chaos}; prefixes={states}")
        for i, x in wire.items():
            v = x[0] if has_p else x
            p = x[1] if has_p else None
            if wire_final.get(i) != v or p is not None:
                errors.append(
                    f"{transport}: wire row {i} reads {x}, ingested {wire_final.get(i)}"
                )
    for transport in ("pg_final", "http_final", "flight_final"):
        finals = [(st, hp) for tr, st, hp in observed if tr == transport]
        if finals:
            st, hp = finals[-1]
            chaos = {i: x for i, x in st.items() if i < 100}
            wire = {i: (x[0] if hp else x) for i, x in st.items() if i >= 100}
            want = final if hp else vfinal
            if chaos != want:
                errors.append(
                    f"{transport}: quiesce read {chaos} != final {want}"
                )
            if wire != wire_final:
                errors.append(
                    f"{transport}: quiesce wire rows {wire} != ingested {wire_final}"
                )
    return errors, tallies


def main() -> None:
    n_schedules = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    n_writers = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .getOrCreate()
    )
    base = "_data/fuzz_wire"
    t0 = time.time()
    failures = 0
    totals = {
        "pg_ok": 0, "pg_retry": 0,
        "http_ok": 0, "http_retry": 0,
        "flight_ok": 0, "flight_retry": 0,
    }
    for s in range(n_schedules):
        root = f"{base}/s{s}"
        shutil.rmtree(root, ignore_errors=True)
        errors, tallies = run_schedule(
            spark, seed=7000 + s, root=root, n_writers=n_writers
        )
        for k in totals:
            totals[k] += tallies[k]
        status = "ok" if not errors else "FAIL"
        if errors:
            failures += 1
            for e in errors[:6]:
                print(f"  {e}")
        print(
            f"[{s + 1}/{n_schedules}] seed={7000 + s} {status} "
            f"({time.time() - t0:.0f}s) {tallies}",
            flush=True,
        )
        shutil.rmtree(root, ignore_errors=True)
    print(
        f"{n_schedules - failures}/{n_schedules} schedules clean, "
        f"{n_writers} writers, totals={totals}, {time.time() - t0:.0f}s"
    )
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
