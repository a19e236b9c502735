"""Uniform-vs-skewed corpus probe for the text/dedup/linkage family
(VERDICT r10 task 1).

The zipf events probe (probe_zipf_skew.py) covered events-partitioned
analytics and found a 99.8x hot-key blowup; this is the same
falsification for the documents/customer corpus: power-law doc
lengths, hot terms in ~30% of docs, one mega-doc, and a dominant
customer surname block (scripts/gen_skewed_docs.py).  For each family
member it asserts (a) DuckDB oracle parity ON the skewed corpus —
correctness must be distribution-independent — and (b) the skewed /
uniform timing ratio, flagging >2x as a hot-join-key outlier to salt.

Quadratic-ORACLE names (dedup_simhash, dedup_ngram_jaccard: the
engine side is banded/guarded-linear, the DuckDB side is all-pairs)
are parity-checked on the sf0.01 skewed twin and excluded from sf1
parity, mirroring the parity_sweep policy; simhash still gets an sf1
TIMING row (its engine side is the banded join under test).

Usage: python scripts/probe_skewed_corpus.py [runs]
Fixtures: _data/sf1 (uniform), _data/sf1_skewdocs + _data/sf0.01_skewdocs
  (gen_skewed_docs.py).
Env: SPARK_GRAFT_SKEW_ONLY=name,name  restricts to a subset;
     SPARK_GRAFT_SKEW_PHASE=parity|timing|all (default all) — the
     DuckDB side of some sf1 oracles runs tens of minutes, so reruns
     after a fix usually want timing only.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

from core2_spark.queries.registry import all_oracles, all_queries
from tests.parity import assert_frames_match

# (name, sf1_parity, sf1_timing): quadratic-oracle names parity-check
# at the sf0.01 twin instead; dedup_ngram_jaccard is additionally
# excluded from sf1 timing (deliberately mid-tier-only exact variant —
# its scale path IS dedup_ngram_jaccard_lsh, which is timed).
FAMILY = [
    ("text_bm25_search_topk", True, True),
    ("dedup_exact_survivors", True, True),
    ("dedup_minhash_lsh", True, True),
    ("dedup_ngram_jaccard_lsh", True, True),
    ("dedup_simhash", False, True),
    ("dedup_ngram_jaccard", False, False),
    # cluster_canonical parity runs at the sf0.01 twin: its DuckDB
    # mirror recomputes the whole minhash pipeline PLUS a WITH
    # RECURSIVE closure — ~30+ min single-engine cost at sf1-skew
    # (the Spark side finishes in seconds; measured via the timing
    # phase below).
    ("dedup_cluster_canonical", False, True),
    ("text_doc_frequency_idf", True, True),
    ("text_tfidf_distinctive_term_per_doc", True, True),
    ("text_quality_stats", True, True),
    ("text_fingerprint", True, True),
    ("entity_fuzzy_match_blocked", True, True),
]

UNIFORM = "_data/sf1"
SKEWED = "_data/sf1_skewdocs"
SKEWED_SMALL = "_data/sf0.01_skewdocs"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute(
        "SET memory_limit = '"
        + os.environ.get("SPARK_GRAFT_DUCK_MEM", "24GB")
        + "'"
    )
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.abspath(sf_dir)}/{t}.parquet')"
        )
    return con


def main() -> int:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    for d in (UNIFORM, SKEWED, SKEWED_SMALL):
        if not os.path.isdir(d):
            print(f"missing fixture {d} — run scripts/gen_skewed_docs.py")
            return 2
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    queries, oracles = all_queries(), all_oracles()
    bad: list[str] = []
    only = os.environ.get("SPARK_GRAFT_SKEW_ONLY")
    family = FAMILY
    if only:
        wanted = set(only.split(","))
        family = [f for f in FAMILY if f[0] in wanted]
    phase = os.environ.get("SPARK_GRAFT_SKEW_PHASE", "all")

    # 1) parity on the skewed corpus
    con_big = _connect(SKEWED)
    con_small = _connect(SKEWED_SMALL)
    for name, sf1_parity, _ in family if phase in ("all", "parity") else []:
        tier, con = (
            (SKEWED, con_big) if sf1_parity else (SKEWED_SMALL, con_small)
        )
        try:
            t0 = time.perf_counter()
            assert_frames_match(
                queries[name](spark, tier).toPandas(),
                con.execute(oracles[name]).df(),
                name,
            )
            print(
                f"parity ok {name} @ {tier} ({time.perf_counter() - t0:.1f}s)",
                flush=True,
            )
        except Exception as exc:
            bad.append(name)
            print(f"parity FAIL {name} @ {tier}: {exc}", flush=True)

    # 2) engine timing, min-of-N per fixture (warm once each)
    def best(name: str, sf_dir: str) -> float:
        queries[name](spark, sf_dir).count()  # warm
        ts = []
        for _ in range(runs):
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).count()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    if phase == "parity":
        print(f"parity failures: {bad or 'none'}")
        spark.stop()
        return 1 if bad else 0
    print("\n| query | uniform s | skewed s | ratio |")
    print("|---|---|---|---|")
    worst = 0.0
    for name, _, timed in family:
        if not timed:
            continue
        tu = best(name, UNIFORM)
        tz = best(name, SKEWED)
        r = tz / tu
        worst = max(worst, r)
        print(f"| {name} | {tu:.2f} | {tz:.2f} | {r:.2f}x |", flush=True)
    print(f"\nworst ratio: {worst:.2f}x; parity failures: {bad or 'none'}")
    spark.stop()
    return 1 if (bad or worst > 2.0) else 0


if __name__ == "__main__":
    raise SystemExit(main())
