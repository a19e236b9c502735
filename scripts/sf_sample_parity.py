"""Block-sampled oracle parity for quadratic-oracle names at big tiers.

A handful of registered pairs have DuckDB oracles that are inherently
all-pairs within a blocking key (that is WHY the Spark side is
banded/salted): at sf1 the full `dedup_ngram_jaccard` oracle is
~15.7M `list_intersect` pairs, measured 121 s per 1k-doc block, i.e.
3+ hours for 100 blocks — the oracle, not the engine, is the
bottleneck.  The driver's gate runs the full pair at sf0.01 where the
oracle is tractable; THIS script keeps the big-tier insurance run
honest for those names by restricting BOTH sides to the same sampled
blocking keys: it materializes a filtered copy of the input table into
a scratch sf_dir and runs the registered Spark callable and the
registered oracle SQL unmodified against it.  Semantics tested are
identical (the pair never compares rows across blocks); only the
number of blocks shrinks.

Usage: python scripts/sf_sample_parity.py <sf_dir> [n_blocks]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

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

# name -> (table to sample, blocking columns the pair never crosses)
SAMPLED = {
    "dedup_ngram_jaccard": ("documents", ("lang", "source")),
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "_data/sf1"
    n_blocks = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    scratch = os.path.join(sf_dir, f"_sample{n_blocks}")
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    con = duckdb.connect()
    con.execute(
        "SET memory_limit = '"
        + os.environ.get("SPARK_GRAFT_DUCK_MEM", "24GB")
        + "'"
    )
    failures: list[str] = []
    for name, (table, block_cols) in SAMPLED.items():
        shutil.rmtree(scratch, ignore_errors=True)
        os.makedirs(scratch)
        src = table_path(sf_dir, table)
        cols = ", ".join(block_cols)
        # Deterministic sample: first n_blocks blocks by key order.
        con.execute(
            f"""
            COPY (
              SELECT t.* FROM read_parquet('{src}') t
              JOIN (SELECT DISTINCT {cols} FROM read_parquet('{src}')
                    ORDER BY {cols} LIMIT {n_blocks}) b USING ({cols})
            ) TO '{scratch}/{table}.parquet' (FORMAT PARQUET)
            """
        )
        for other in TABLES:
            if other != table:
                # The sampled pairs read one table; link the rest so
                # table_path resolves if a future SAMPLED entry needs it.
                dst = os.path.join(scratch, f"{other}.parquet")
                if not os.path.exists(dst):
                    os.symlink(os.path.abspath(table_path(sf_dir, other)), dst)
        for t in TABLES:
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{table_path(scratch, t)}')")
        try:
            ts = time.time()
            spark_pdf = all_queries()[name](spark, scratch).toPandas()
            td = time.time()
            duck_pdf = con.execute(all_oracles()[name]).df()
            tv = time.time()
            assert_frames_match(spark_pdf, duck_pdf, name)
            print(
                f"ok {name} [{n_blocks} blocks] spark={td - ts:.1f}s "
                f"duck={tv - td:.1f}s rows={len(spark_pdf)}",
                flush=True,
            )
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: {exc}", flush=True)
    shutil.rmtree(scratch, ignore_errors=True)
    spark.stop()
    print(f"sampled parity @ {sf_dir}: {len(SAMPLED) - len(failures)}/{len(SAMPLED)}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
