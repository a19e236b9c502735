"""Round-11 optimization sweep: time EVERY registered query and dump its plan.

Methodology per the optimization guide §1: the timed action is the noop
sink (computes every column of every row, no sink cost, visible in the
SQL tab), each query is warmed once (codegen/JIT/footers) then timed
best-of-2, and jobs are labelled.  For each query we also capture
``explain("formatted")`` plus a plan-shape digest (Exchange count, join
strategies, Python-boundary nodes, scan pushdown) so before/after plan
diffs are auditable offline.

Usage: python scripts/measure_all_queries.py [out_dir] [name_filter...]
  out_dir defaults to /tmp/r11_measure; plans land in <out_dir>/plans/,
  timings append to <out_dir>/timings.jsonl (one JSON object per query,
  so a crashed sweep keeps its partial results).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_DRIVER_MEM", "32g")

PLAN_NODES = [
    "Exchange",
    "BroadcastExchange",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInPandas",
    "PythonMapInArrow",
    "FlatMapGroupsInPandas",
    "AggregateInPandas",
    "WholeStageCodegen",
    "TakeOrderedAndProject",
    "Window",
    "Generate",
    "Sort ",
]


def plan_digest(plan: str) -> dict[str, int]:
    return {
        node.strip(): plan.count(node)
        for node in PLAN_NODES
        if plan.count(node)
    }


def formatted_plan(spark, df) -> str:
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def main() -> int:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r11_measure"
    name_filter = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(os.path.join(out_dir, "plans"), exist_ok=True)

    from core2_spark.queries.registry import all_queries
    from core2_spark.session import get_spark

    # Same session shape as bench.py's primary tier so numbers and plans
    # are comparable with the artifact.
    spark = get_spark(
        app_name="r11-measure-sweep",
        shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )

    queries = all_queries()
    done: set[str] = set()
    tpath = os.path.join(out_dir, "timings.jsonl")
    if os.path.exists(tpath):  # resume: skip names already measured
        with open(tpath) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except ValueError:
                    continue
                if "noop_s" in rec or "err" in rec:
                    done.add(rec["name"])
    names = [
        n
        for n in queries
        if n not in done
        and (not name_filter or any(f in n for f in name_filter))
    ]
    log = open(tpath, "a")
    results: list[tuple[str, float]] = []
    for i, name in enumerate(names):
        rec: dict = {"name": name, "sf_dir": sf_dir}
        t_build = time.perf_counter()
        try:
            df = queries[name](spark, sf_dir)
            rec["build_s"] = round(time.perf_counter() - t_build, 3)
            plan = formatted_plan(spark, df)
            with open(
                os.path.join(out_dir, "plans", f"{name}.txt"), "w"
            ) as f:
                f.write(plan)
            rec["plan"] = plan_digest(plan)

            spark.sparkContext.setJobDescription(f"measure:{name}")
            runs, canaries = [], []
            for _ in range(3):  # first run is the warm pass
                # Wave canary: this box sits in a shared microVM with
                # multi-minute co-tenant noise waves (measured: the
                # same query at 2.2 s clean and 79 s mid-wave).  A
                # fixed single-thread CPU burst (~0.1 s clean) timed
                # next to each rep makes contaminated reps visible.
                import hashlib

                c0 = time.perf_counter()
                h = hashlib.sha256()
                for _ in range(1500):
                    h.update(b"x" * 65536)
                canaries.append(round(time.perf_counter() - c0, 3))
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                runs.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            rec["warm_s"], rec["noop_s"] = runs[0], min(runs[1:])
            rec["runs"], rec["canary_s"] = runs, canaries
            results.append((name, rec["noop_s"]))
        except Exception:
            rec["err"] = traceback.format_exc()[-1500:]
        log.write(json.dumps(rec) + "\n")
        log.flush()
        print(
            f"[{i + 1}/{len(names)}] {name}: "
            f"{rec.get('noop_s', 'ERR')} (warm {rec.get('warm_s')})",
            flush=True,
        )

    results.sort(key=lambda kv: -kv[1])
    print("\n=== slowest 40 (noop sink, best-of-2 warm) ===")
    for name, s in results[:40]:
        print(f"{s:8.3f}  {name}")
    errs = [n for n in names if not any(n == r[0] for r in results)]
    if errs:
        print("ERRORS:", errs)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
