#!/usr/bin/env python
"""Seeded synthetic fixture generator for scale tiers the driver does
not ship (/root/testdata stops at sf0.1).

Reproduces the driver tables' schema and value distributions —
verified column-by-column against /root/testdata/sf0.1 (types, value
domains, group cardinalities, date ranges, dup rates, embedding
norm/cluster shape) — at an arbitrary scale factor, so the full
oracle-parity sweep and the headline bench can run at sf1 (6M-row
lineitem, 10x the bench tier).  Oracle parity is Spark-vs-DuckDB over
the SAME parquet, so generator fidelity affects only how much data
each query exercises, not the validity of the comparison; fidelity
still matters so every filter/join/dedup query selects a realistic,
non-empty slice.

Usage: python scripts/gen_fixtures.py <sf> <outdir>
  e.g. python scripts/gen_fixtures.py 1.0 _data/sf1

Deterministic: one fixed-seed numpy Generator per table (seed derived
from table name + sf), so tables can be regenerated independently.
"""

from __future__ import annotations

import json
import os
import sys
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# sf1 row counts (driver tiers are exactly these x sf).
BASE = {
    "customer": 150_000,
    "supplier": 10_000,
    "part": 200_000,
    "orders": 1_500_000,
    "lineitem": 6_000_000,  # ~4.07 lines/order, derived not fixed
    "events": 1_000_000,
    "documents": 50_000,
    "embeddings": 20_000,
}

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "BUILDING", "FURNITURE"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
P_TYPES = ["LARGE", "STANDARD", "MEDIUM", "SMALL", "PROMO", "ECONOMY"]
P_ADJ = ["large", "hot", "blue", "old", "cold", "small", "dark", "fresh"]
P_NOUN = ["ring", "bolt", "plate", "gear", "pipe", "wire", "clip", "rod"]
EVENT_TYPES = ["view", "click", "signup", "purchase", "error"]
DOC_LANGS = (["en"] * 8 + ["zh"] * 3 + ["fr"] * 3 + ["es"] * 3 + ["de"] * 3)
# Head of the document vocabulary: the 6 stopwords the Gopher-rule
# queries look for, then the driver tiers' domain words.  The TAIL is
# generated synthetically (~30k rare words, Zipf-weighted draws) — the
# driver's own tiny tiers use a 30-word vocabulary, which at sf>=1
# makes ~40% of RANDOM doc pairs genuine >=0.5-Jaccard near-dups
# (token sets all converge to the full vocab), so every exact
# near-dup operator's OUTPUT goes quadratic: 40M true pairs at sf1.
# Real corpora are Zipf with a long rare tail and ~0 random-pair
# Jaccard; duplicate signal must be PLANTED, not an artifact of a
# collapsed vocabulary.
DOC_VOCAB_HEAD = (
    "the and of to a in "
    "spark batch line column order small sort fast value scan query agg "
    "table hash key group stream filter customer slow vector part join "
    "index page cache disk merge split shard"
).split()
DOC_VOCAB_TAIL = 30_000  # synthetic rare words w<base36>
DOC_ZIPF_EXP = 1.05

DAY_US = 86_400_000_000


def rng_for(table: str, sf: float) -> np.random.Generator:
    seed = zlib.crc32(f"{table}:{sf}".encode()) & 0xFFFFFFFF
    return np.random.default_rng(seed)


def money(rng, lo, hi, n):
    return np.round(rng.uniform(lo, hi, n), 2)


def ts_us(days_from, base="1995-01-01"):
    """int64 microseconds-since-epoch array -> pyarrow timestamp[us]."""
    base_us = np.datetime64(base, "us").astype(np.int64)
    return pa.array(base_us + days_from, type=pa.timestamp("us"))


def write(out, name, table):
    pq.write_table(
        table, os.path.join(out, f"{name}.parquet"), row_group_size=131_072
    )
    print(f"  {name}: {table.num_rows} rows")


def gen(sf: float, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    n = {k: max(1, int(v * sf)) for k, v in BASE.items()}

    write(out, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))

    write(out, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    rng = rng_for("customer", sf)
    nc = n["customer"]
    write(out, "customer", pa.table({
        "c_custkey": pa.array(np.arange(nc), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(nc)],
        "c_nationkey": pa.array(rng.integers(0, 25, nc), pa.int32()),
        "c_acctbal": money(rng, 0, 10_000, nc),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, nc)]),
    }))

    rng = rng_for("supplier", sf)
    ns = n["supplier"]
    write(out, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(ns), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(ns)],
        "s_nationkey": pa.array(rng.integers(0, 25, ns), pa.int32()),
        "s_acctbal": money(rng, 0, 10_000, ns),
    }))

    rng = rng_for("part", sf)
    np_ = n["part"]
    adj = np.array(P_ADJ)[rng.integers(0, len(P_ADJ), np_)]
    noun = np.array(P_NOUN)[rng.integers(0, len(P_NOUN), np_)]
    write(out, "part", pa.table({
        "p_partkey": pa.array(np.arange(np_), pa.int64()),
        "p_name": np.char.add(np.char.add(adj, " "), noun),
        "p_brand": [f"Brand#{i}" for i in rng.integers(0, 25, np_)],
        "p_type": pa.array(np.array(P_TYPES)[rng.integers(0, 6, np_)]),
        "p_size": pa.array(rng.integers(1, 51, np_), pa.int32()),
        # sf0.1 ground truth: cycles 900.0..999.9 in 0.1 steps by key
        "p_retailprice": np.round(
            900.0 + (np.arange(np_) % 1000) * 0.1, 2
        ),
    }))

    rng = rng_for("orders", sf)
    no = n["orders"]
    # o_orderdate: uniform days over 1995-01-01 .. 2001-08-01 (2404 days)
    odate_days = rng.integers(0, 2405, no) * DAY_US
    write(out, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(no), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, nc, no), pa.int64()),
        "o_orderstatus": pa.array(np.array(["O", "P", "F"])[rng.integers(0, 3, no)]),
        "o_totalprice": money(rng, 1000, 500_000, no),
        "o_orderdate": ts_us(odate_days),
        "o_orderpriority": pa.array(np.array(PRIORITIES)[rng.integers(0, 5, no)]),
    }))

    rng = rng_for("lineitem", sf)
    # per-order line count uniform 1..7 (sf0.1 ground truth: mean 4.07,
    # not every order has lines) over a random ~98% subset of orders
    has_lines = rng.random(no) < 0.98
    counts = rng.integers(1, 8, no) * has_lines
    nl = int(counts.sum())
    okey = np.repeat(np.arange(no), counts)
    lnum = np.concatenate([np.arange(1, c + 1) for c in counts if c]) \
        if nl else np.array([], np.int64)
    write(out, "lineitem", pa.table({
        "l_orderkey": pa.array(okey, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, np_, nl), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, ns, nl), pa.int64()),
        "l_linenumber": pa.array(lnum, pa.int32()),
        "l_quantity": rng.integers(1, 51, nl).astype(np.float64),
        "l_extendedprice": money(rng, 900, 105_000, nl),
        "l_discount": np.round(rng.integers(0, 11, nl) * 0.01, 2),
        "l_tax": np.round(rng.integers(0, 9, nl) * 0.01, 2),
        "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.integers(0, 3, nl)]),
        "l_linestatus": pa.array(np.array(["O", "F"])[rng.integers(0, 2, nl)]),
        # shipdate = orderdate + 1..95 days, clamped to the domain seen
        # at sf0.1 (1995-01-02 .. 2001-11-04)
        "l_shipdate": ts_us(
            np.minimum(
                np.repeat(odate_days, counts) + rng.integers(1, 96, nl) * DAY_US,
                2499 * DAY_US,
            )
        ),
    }))

    rng = rng_for("events", sf)
    ne = n["events"]
    # increasing microsecond timestamps over 30 days from 2024-01-01
    span_us = 30 * DAY_US
    gaps = rng.exponential(span_us / ne, ne).astype(np.int64) + 1
    tsv = np.minimum(np.cumsum(gaps), span_us - 1)
    n_users = max(1, int(15_000 * sf))
    kvals = rng.integers(0, 100, ne)
    write(out, "events", pa.table({
        "event_id": pa.array(np.arange(ne), pa.int64()),
        "ts": ts_us(tsv, base="2024-01-01"),
        "user_id": pa.array(rng.integers(0, n_users, ne), pa.int64()),
        "event_type": pa.array(np.array(EVENT_TYPES)[rng.integers(0, 5, ne)]),
        "value": np.round(np.minimum(rng.exponential(50, ne), 600.0), 2),
        "props": [json.dumps({"k": int(k)}) for k in kvals],
    }))

    rng = rng_for("documents", sf)
    nd = n["documents"]

    def b36(x: int) -> str:
        digits = "0123456789abcdefghijklmnopqrstuvwxyz"
        out = ""
        while True:
            x, r = divmod(x, 36)
            out = digits[r] + out
            if x == 0:
                return out

    vocab = np.array(
        DOC_VOCAB_HEAD + [f"w{b36(i)}" for i in range(DOC_VOCAB_TAIL)]
    )
    ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
    pw = ranks ** -DOC_ZIPF_EXP
    pw /= pw.sum()
    # Min 25 words: ultra-short docs drawn from a Zipf head routinely
    # exceed 0.5 token-set Jaccard BY CHANCE (their distinct sets are
    # a handful of stopwords), chaining into giant incidental near-dup
    # components that no planted-signal analysis wants — production
    # dedup excludes ultra-short docs for the same reason.
    wcs = rng.integers(25, 106, nd)
    flat = rng.choice(len(vocab), size=int(wcs.sum()), p=pw)
    texts, pos = [], 0
    for wc in wcs:
        texts.append(" ".join(vocab[flat[pos : pos + int(wc)]]))
        pos += int(wc)
    # plant exact duplicates at the sf0.1 rate (~0.16%) ...
    n_dups = max(1, int(0.0016 * nd))
    for src, dst in zip(
        rng.integers(0, nd, n_dups), rng.integers(0, nd, n_dups)
    ):
        if src != dst:
            texts[int(dst)] = texts[int(src)]
    # ... and NEAR duplicates at ~0.3%: a copy with ~15% of tokens
    # rewritten (token-set Jaccard ~0.7 — above the 0.5 verify
    # threshold, below exact-dup), so MinHash/SimHash/Jaccard
    # operators have real recall targets at every tier
    n_near = max(1, int(0.003 * nd))
    for src, dst in zip(
        rng.integers(0, nd, n_near), rng.integers(0, nd, n_near)
    ):
        if src == dst:
            continue
        ws = texts[int(src)].split()
        n_swap = max(1, len(ws) // 7)
        for j in rng.integers(0, len(ws), n_swap):
            ws[int(j)] = str(vocab[int(rng.choice(len(vocab), p=pw))])
        texts[int(dst)] = " ".join(ws)
    write(out, "documents", pa.table({
        "doc_id": pa.array(np.arange(nd), pa.int64()),
        "text": texts,
        "lang": pa.array(
            np.array(DOC_LANGS)[rng.integers(0, len(DOC_LANGS), nd)]
        ),
        "source": [f"src{i}" for i in rng.integers(0, 20, nd)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    rng = rng_for("embeddings", sf)
    nv = n["embeddings"]
    labels = rng.integers(0, 10, nv)
    # unit-norm vectors with weak label-cluster structure (sf0.1 ground
    # truth: between-centroid distance ~0.1, within-cluster ~1.0)
    cents = rng.normal(0, 1, (10, 64))
    cents = 0.07 * cents / np.linalg.norm(cents, axis=1, keepdims=True)
    vecs = rng.normal(0, 1, (nv, 64))
    vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True) + cents[labels]
    vecs = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)).astype(
        np.float32
    )
    write(out, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(nv), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }))


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = sys.argv[2] if len(sys.argv) > 2 else f"_data/sf{sf:g}"
    print(f"generating sf={sf} -> {out}")
    gen(sf, out)
