"""Bounded in-suite twin of scripts/fuzz_crash_recovery.py: a writer
subprocess (own JVM, whole process group) is SIGKILLed at a random
instant mid-transaction-stream; a fresh Engine on the root must then
satisfy durability (every ACKed tx fully visible), atomicity (state
equals the replay of ACKed txs, or ACKed + the one begun-unACKed tail
that may have committed before its ACK write), and liveness (a
post-recovery transaction commits past the corpse's stale lock,
pending manifest, and stage scratch).  The deep fuzz is the script
(>= 40 schedules); two schedules here keep the property in the suite.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)

from fuzz_crash_recovery import run_schedule  # noqa: E402


@pytest.mark.parametrize("seed", [4100, 4101])
def test_kill9_crash_recovery_invariants(spark, tmp_path, seed):
    problems = run_schedule(spark, seed=seed, base=str(tmp_path))
    assert not problems, problems


from fuzz_reader_snapshots import run_schedule as reader_schedule  # noqa: E402


def test_reader_snapshot_consistency_under_chaos(spark, tmp_path):
    """Bounded twin of scripts/fuzz_reader_snapshots.py: concurrent
    readers racing writers + swap maintenance must each observe a
    serial-prefix state (never a torn read) and pinned snapshots must
    be repeatable; reads yanked mid-plan by a swap surface as clean
    retries, not data."""
    problems, ok, retried = reader_schedule(
        spark, seed=5100, root=str(tmp_path / "r"), n_writers=3, n_readers=2
    )
    assert not problems, problems
    assert ok > 0  # "clean" must not mean "every read errored"


from fuzz_wire_under_writers import run_schedule as wire_schedule  # noqa: E402

# Randomized/fuzz/soak tier (VERDICT r11 task 2): excluded from the
# default run so the driver's verify finishes; run with -m slow /
# --runslow / SPARK_GRAFT_RUN_SLOW=1.  Deterministic gate coverage of
# the same machinery stays in the default tier (oracle parity, unit
# and plan-shape tests).
pytestmark = pytest.mark.slow



def test_wire_snapshot_consistency_under_chaos(spark, tmp_path):
    """Bounded twin of scripts/fuzz_wire_under_writers.py: a live
    pgwire socket and HTTP /query endpoint polling while writers and
    swap maintenance race must only ever serialize serial-prefix
    states onto the wire, failed requests must leave the session
    usable, and both transports must read the exact final state at
    quiesce."""
    errors, tallies = wire_schedule(
        spark, seed=7100, root=str(tmp_path / "w"), n_writers=3
    )
    assert not errors, errors
    assert tallies["pg_ok"] > 0 and tallies["http_ok"] > 0, tallies


def test_clock_fallback_ignores_inflight_pending_files(spark, tmp_path):
    """Regression pin for the failover-fuzz torn read (seed 9001): on
    a root with no _log.json, _recover_clock falls back to parquet
    footer max-statistics — which used to adopt the SYS_START of a
    concurrent writer's IN-FLIGHT (pending-manifested, unlogged)
    files, making its half-published transaction visible to readers.
    Files listed in a live _pending/ manifest must not drive the
    fallback clock."""
    import json as _json

    from core2_spark.engine import Engine, Put

    root = str(tmp_path / "clockroot")
    eng = Engine(spark, root)
    eng.submit_tx(
        [Put("t", spark.createDataFrame([(1, "a"), (2, "a")], "id long, v string"))]
    )
    t1 = eng._last_tx_time

    def files():
        out = set()
        for r, _d, ns in os.walk(os.path.join(root, "t")):
            out |= {os.path.join(r, n) for n in ns if n.endswith(".parquet")}
        return out

    before = files()
    eng.submit_tx(
        [Put("t", spark.createDataFrame([(3, "b")], "id long, v string"))]
    )
    tx2_files = sorted(files() - before)
    assert tx2_files
    # Rewind the root to "second tx still in flight": no log yet, the
    # second tx's files published but pending-manifested.
    os.remove(os.path.join(root, "_log.json"))
    pdir = os.path.join(root, "_pending")
    os.makedirs(pdir, exist_ok=True)
    with open(os.path.join(pdir, "tx_inflight.json"), "w") as f:
        _json.dump(
            {
                "tx_time": eng._last_tx_time.isoformat(),
                "files": tx2_files,
                "restores": [],
            },
            f,
        )
    # Default reclaim window: recovery must presume the manifest's
    # writer is live (the reader situation) — not roll it back.
    reader = Engine(spark, root)
    assert reader._last_tx_time == t1, (
        f"fallback clock adopted in-flight files: {reader._last_tx_time}"
    )
    got = {
        r["id"]: r["v"]
        for r in reader.db().table("t").select("id", "v").collect()
    }
    assert got == {1: "a", 2: "a"}, got


@pytest.mark.parametrize("seed", [9001, 9007])
def test_failover_wire_invariants(spark, tmp_path, seed):
    """Bounded twin of scripts/fuzz_failover_wire.py: kill a writer
    engine, boot a NEW engine on the same root mid-schedule while
    pgwire/HTTP/Flight readers poll through the failover — no torn
    reads, no lost committed writes, writer-2 fully ACKs, and every
    transport's same session serves the quiesce read.  Seed 9001 is
    the schedule that caught the clock-fallback torn read above."""
    from fuzz_failover_wire import run_schedule as failover_schedule

    problems, tallies = failover_schedule(spark, seed=seed, base=str(tmp_path))
    assert not problems, problems
    assert tallies["pg_ok"] > 0 and tallies["http_ok"] > 0, tallies
