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
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{table_path(sf_dir, name)}')"
        )
    queries, oracles = all_queries(), all_oracles()
    failures: list[str] = []
    t0 = time.time()
    for i, name in enumerate(sorted(oracles)):
        try:
            spark_pdf = queries[name](spark, sf_dir).toPandas()
            duck_pdf = con.execute(oracles[name]).df()
            assert_frames_match(spark_pdf, duck_pdf, name)
        except Exception:
            failures.append(name)
            print(f"FAIL {name}")
            traceback.print_exc(limit=3)
        if (i + 1) % 25 == 0:
            print(f"... {i + 1}/{len(oracles)} ({time.time() - t0:.0f}s)")
    print(
        f"parity sweep @ {sf_dir}: {len(oracles) - len(failures)}/"
        f"{len(oracles)} matched in {time.time() - t0:.0f}s"
        + (f"; FAILURES: {failures}" if failures else "")
    )
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
