"""Full (non-sampled) oracle parity for dedup_ngram_jaccard at a mid
tier (default _data/sf0.3, 15k docs / ~1.1M within-block pairs).

Closes the round-7 evidence gap: the sf1 verification of this query was
block-SAMPLED because the all-pairs DuckDB oracle is ~3 h there; at
sf0.3 the oracle is minutes, so the one quadratic-within-block query
gets a complete large-tier correctness signal beyond sf0.1.

Usage: python scripts/ngram_midtier_parity.py [sf_dir]
Exit 0 = full parity (row count + schema + value hash).
"""

from __future__ import annotations

import os
import sys
import time


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "_data/sf0.3"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    sys.path.insert(0, os.path.join(repo, "tests"))

    import duckdb
    from pyspark.sql import SparkSession

    from core2_spark.queries.registry import all_oracles, all_queries
    from parity import assert_frames_match

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    sdf = all_queries()["dedup_ngram_jaccard"](spark, sf_dir).toPandas()
    t_spark = time.time() - t0
    print(f"spark: {len(sdf)} surviving pairs in {t_spark:.0f}s", flush=True)

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{os.path.join(sf_dir, 'documents.parquet')}')"
    )
    t0 = time.time()
    odf = con.execute(all_oracles()["dedup_ngram_jaccard"]).df()
    t_duck = time.time() - t0
    print(f"duckdb oracle: {len(odf)} pairs in {t_duck:.0f}s", flush=True)

    assert_frames_match(sdf, odf, "dedup_ngram_jaccard@" + sf_dir)
    print(
        f"PARITY OK dedup_ngram_jaccard {sf_dir}: {len(sdf)} pairs, "
        f"spark {t_spark:.0f}s vs oracle {t_duck:.0f}s",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
