#!/usr/bin/env python
"""Interleaved paired sf5 (and optionally sf1) tier runs: r11-HEAD
worktree vs current HEAD, same minutes, canary-stamped (VERDICT r11
task 1 — the only committed sf5 number, 16.9 s, contradicted every
in-session paired measurement; this script produces the committed
paired evidence).

Each rep runs BOTH trees back-to-back in alternating order (ABBA) so a
box wave hits both sides symmetrically.  Every run is a fresh
subprocess JVM via bench.py's TIER_ONLY mode — identical to how the
driver's bench measures the sf5 tier.

Usage: python scripts/sf5_paired_ab.py <r11_worktree_dir> [reps] [sf_dir]
Appends one JSON line per run to plans/r12/sf5_paired.jsonl.
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def canary() -> float:
    t0 = time.perf_counter()
    h = hashlib.sha256()
    for _ in range(1500):
        h.update(b"x" * 65536)
    return round(time.perf_counter() - t0, 3)


def run_tier(tree: str, sf_dir: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_TIER_ONLY="1",
        SPARK_GRAFT_SKIP_SF1="1",
    )
    c0 = canary()
    t0 = time.perf_counter()
    out = subprocess.run(
        [sys.executable, os.path.join(tree, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        cwd=tree,
        timeout=3600,
    )
    wall = round(time.perf_counter() - t0, 1)
    c1 = canary()
    rec = {
        "tree": tree,
        "sf_dir": sf_dir,
        "proc_wall_s": wall,
        "canary_before": c0,
        "canary_after": c1,
        "rc": out.returncode,
    }
    if out.returncode == 0:
        line = [l for l in out.stdout.splitlines() if l.strip()][-1]
        block = json.loads(line)
        rec["value"] = block.get("value")
        rec["sweep_walls"] = block.get("sweep_walls")
        rec["queries_sequential"] = block.get("queries_sequential")
    else:
        rec["stderr_tail"] = out.stderr[-800:]
    return rec


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    r11_tree = os.path.abspath(sys.argv[1])
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        REPO, "_data", "sf5"
    )
    out_path = os.path.join(REPO, "plans", "r12", "sf5_paired.jsonl")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    log = open(out_path, "a")
    for i in range(reps):
        # ABBA ordering: alternate which tree goes first each rep
        order = [r11_tree, REPO] if i % 2 == 0 else [REPO, r11_tree]
        for tree in order:
            rec = run_tier(tree, sf_dir)
            rec["rep"] = i
            log.write(json.dumps(rec) + "\n")
            log.flush()
            label = "r11" if tree == r11_tree else "head"
            print(
                f"rep {i} {label}: value={rec.get('value')} "
                f"walls={rec.get('sweep_walls')} canary="
                f"{rec['canary_before']}/{rec['canary_after']} "
                f"proc {rec['proc_wall_s']}s",
                flush=True,
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
