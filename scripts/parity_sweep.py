"""Full oracle-parity sweep at an arbitrary scale factor.

The pytest suite runs every oracle pair at sf0.001; the driver's
CORRECTNESS gate runs the SAME comparison at sf0.01.  This script is
the pre-driver insurance run: it executes all registered pairs at
sf0.01 (or $SPARK_GRAFT_SF_DIR) from a vanilla session — the exact
environment the driver uses — and prints one line per mismatch plus a
final tally.

Usage: python scripts/parity_sweep.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

from core2_spark.queries.registry import all_oracles, all_queries
from tests.conftest import table_path
from tests.parity import assert_frames_match

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> int:
    sf_dir = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    )
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    con = duckdb.connect()
    # Oracle SQL is written for the sf0.01 gate; at bigger tiers a
    # quadratic oracle must fail fast with an out-of-memory error, not
    # grow unbounded and take the box down (observed: 58 GB RSS at sf1
    # before the cap existed).
    con.execute(
        "SET memory_limit = '"
        + os.environ.get("SPARK_GRAFT_DUCK_MEM", "24GB")
        + "'"
    )
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{table_path(sf_dir, name)}')"
        )
    queries, oracles = all_queries(), all_oracles()
    failures: list[str] = []
    verbose = os.environ.get("SPARK_GRAFT_SWEEP_VERBOSE") == "1"
    only = os.environ.get("SPARK_GRAFT_SWEEP_ONLY")  # comma-sep names
    names = sorted(oracles)
    if only:
        wanted = set(only.split(","))
        names = [n for n in names if n in wanted]
    else:
        # Quadratic-ORACLE names (the engine side is banded-linear;
        # the DuckDB side is all-pairs): auto-skipped at sf >= 1 —
        # they carry their own complete mid-tier proofs (sf0.3 ngram
        # table in PERF.md; simhash all-pairs green at sf0.01).
        # Override with SPARK_GRAFT_SWEEP_SKIP ('' to force-include).
        try:
            sf_num = float(sf_dir.rstrip("/").split("sf")[-1])
        except ValueError:
            sf_num = 0.0
        skip = os.environ.get(
            "SPARK_GRAFT_SWEEP_SKIP",
            "dedup_ngram_jaccard,dedup_simhash" if sf_num >= 1 else "",
        )
        dropped = {n for n in skip.split(",") if n}
        if dropped:
            print(f"skipping quadratic-oracle names: {sorted(dropped)}")
            names = [n for n in names if n not in dropped]
    t0 = time.time()
    for i, name in enumerate(names):
        try:
            ts = time.time()
            spark_pdf = queries[name](spark, sf_dir).toPandas()
            td = time.time()
            duck_pdf = con.execute(oracles[name]).df()
            tv = time.time()
            assert_frames_match(spark_pdf, duck_pdf, name)
            if verbose:
                print(
                    f"ok {name} spark={td - ts:.1f}s duck={tv - td:.1f}s"
                    f" rows={len(spark_pdf)}",
                    flush=True,
                )
        except Exception:
            failures.append(name)
            print(f"FAIL {name}", flush=True)
            traceback.print_exc(limit=3)
        if (i + 1) % 25 == 0:
            print(
                f"... {i + 1}/{len(names)} ({time.time() - t0:.0f}s)",
                flush=True,
            )
    print(
        f"parity sweep @ {sf_dir}: {len(names) - len(failures)}/"
        f"{len(names)} matched in {time.time() - t0:.0f}s"
        + (f"; FAILURES: {failures}" if failures else "")
    )
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
