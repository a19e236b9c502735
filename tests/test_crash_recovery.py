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
