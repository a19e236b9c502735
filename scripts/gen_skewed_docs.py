#!/usr/bin/env python
"""Skewed documents/customer fixture twin (VERDICT r10 task 1).

The seeded documents fixture is production-unlike in exactly the ways
that hide text-family scale bugs: doc lengths are uniform 25-105
words, no term is hot beyond the smooth Zipf(1.05) head, and customer
name prefixes spread linkage blocks evenly.  Real corpora have
power-law doc lengths with a mega-doc tail, a handful of terms
present in a third of all documents (a hot term is a hot join key in
the BM25 tf shuffle and the LSH band self-joins), and entity tables
with one dominant surname block.  This writes a twin where:

- documents.text lengths are lognormal (median ~55 words, p99 ~1.5k,
  clipped at 30k) plus ONE planted mega-doc of ~200k*sf words;
- two of the three fixed BM25 query terms ('spark', 'merge') plus a
  synthetic 'hotgamma' are injected into ~30% of docs at ~1 token in
  17 — tf mass proportional to doc length, so the per-term shuffle
  key carries real skew;
- the exact-dup (~0.16%) and near-dup (~0.3%) plant rates match the
  uniform fixture, so dedup operators keep their recall targets;
- customer.c_name gets a hot surname block: ~3% of customers share
  the full 14-char blocking prefix 'Customer#smith' AND one nation,
  concentrating the blocked-linkage quadratic in a single block
  (suffixes are random base36, plus ~200 planted 1-edit twins so the
  match set is non-trivial);
- every other table is symlinked from the uniform source dir, so any
  registered query runs against the twin unchanged.

Everything is seeded (rng_for), so uniform-vs-skewed timing deltas
are attributable to the distribution shape alone.

Usage: python scripts/gen_skewed_docs.py <sf> <outdir> <uniform_dir>
  e.g. python scripts/gen_skewed_docs.py 1.0 _data/sf1_skewdocs _data/sf1
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from gen_fixtures import (  # noqa: E402
    DOC_LANGS,
    DOC_VOCAB_HEAD,
    DOC_VOCAB_TAIL,
    DOC_ZIPF_EXP,
    rng_for,
)

HOT_TOKENS = ("spark", "merge", "hotgamma")
HOT_DOC_FRACTION = 0.30
HOT_TOKEN_STRIDE = 17  # 1 in 17 tokens of a hot doc becomes the hot term
HOT_SURNAME_PREFIX = "Customer#smith"  # exactly the 14-char blocking prefix
HOT_CUSTOMER_FRACTION = 0.03
HOT_CUSTOMER_NATION = 7


def _b36(x: int) -> str:
    digits = "0123456789abcdefghijklmnopqrstuvwxyz"
    out = ""
    while True:
        x, r = divmod(x, 36)
        out = digits[r] + out
        if x == 0:
            return out


def gen(sf: float, out: str, uniform_dir: str) -> None:
    os.makedirs(out, exist_ok=True)

    # -- documents: power-law lengths + hot terms + one mega-doc ------
    rng = rng_for(f"documents_skew", sf)
    nd = max(10, int(50_000 * sf))
    vocab = np.array(
        DOC_VOCAB_HEAD + [f"w{_b36(i)}" for i in range(DOC_VOCAB_TAIL)]
    )
    ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
    pw = ranks**-DOC_ZIPF_EXP
    pw /= pw.sum()
    # lognormal word counts: keep the >=25 floor (same rationale as the
    # uniform fixture: ultra-short zipf-head docs near-dup by chance)
    wcs = np.clip(
        np.exp(rng.normal(np.log(55.0), 1.15, nd)), 25, 30_000
    ).astype(np.int64)
    mega_idx = nd // 2
    wcs[mega_idx] = max(20_000, int(200_000 * sf))
    flat = rng.choice(len(vocab), size=int(wcs.sum()), p=pw)
    hot_docs = rng.random(nd) < HOT_DOC_FRACTION
    hot_pick = rng.integers(0, len(HOT_TOKENS), nd)
    texts, pos = [], 0
    for i, wc in enumerate(wcs):
        words = vocab[flat[pos : pos + int(wc)]]
        if hot_docs[i]:
            words = words.copy()
            words[:: HOT_TOKEN_STRIDE] = HOT_TOKENS[int(hot_pick[i])]
        texts.append(" ".join(words))
        pos += int(wc)
    # planted duplicate signal at the uniform fixture's rates
    n_dups = max(1, int(0.0016 * nd))
    for src, dst in zip(rng.integers(0, nd, n_dups), rng.integers(0, nd, n_dups)):
        if src != dst and dst != mega_idx:
            texts[int(dst)] = texts[int(src)]
    n_near = max(1, int(0.003 * nd))
    for src, dst in zip(rng.integers(0, nd, n_near), rng.integers(0, nd, n_near)):
        if src == dst or dst == mega_idx:
            continue
        ws = texts[int(src)].split()
        n_swap = max(1, len(ws) // 7)
        for j in rng.integers(0, len(ws), n_swap):
            ws[int(j)] = str(vocab[int(rng.choice(len(vocab), p=pw))])
        texts[int(dst)] = " ".join(ws)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(nd), pa.int64()),
                "text": texts,
                "lang": pa.array(
                    np.array(DOC_LANGS)[rng.integers(0, len(DOC_LANGS), nd)]
                ),
                "source": [f"src{i}" for i in rng.integers(0, 20, nd)],
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        os.path.join(out, "documents.parquet"),
    )

    # -- customer: one dominant (nation x prefix) linkage block --------
    rng = rng_for("customer_skew", sf)
    nc = max(10, int(150_000 * sf))
    names = [f"Customer#{i:09d}" for i in range(nc)]
    nations = rng.integers(0, 25, nc).astype(np.int32)
    hot = np.flatnonzero(rng.random(nc) < HOT_CUSTOMER_FRACTION)
    for i in hot:
        suffix = "".join(
            "0123456789abcdefghijklmnopqrstuvwxyz"[d]
            for d in rng.integers(0, 36, 6)
        )
        names[int(i)] = HOT_SURNAME_PREFIX + suffix
        nations[int(i)] = HOT_CUSTOMER_NATION
    # ~200 planted 1-edit twins inside the hot block so the linkage
    # result set on the skewed corpus is non-trivial
    n_twin = min(len(hot) // 2, max(2, int(200 * sf)))
    for a, b in zip(hot[:n_twin], hot[n_twin : 2 * n_twin]):
        base = list(names[int(a)])
        pos = int(rng.integers(len(HOT_SURNAME_PREFIX), len(base)))
        base[pos] = "0123456789abcdefghijklmnopqrstuvwxyz"[
            int(rng.integers(0, 36))
        ]
        names[int(b)] = "".join(base)
    acct = np.round(rng.uniform(0, 10_000, nc), 2)
    segs = np.array(["AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY", "HOUSEHOLD"])
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(np.arange(nc), pa.int64()),
                "c_name": names,
                "c_nationkey": pa.array(nations, pa.int32()),
                "c_acctbal": acct,
                "c_mktsegment": pa.array(segs[rng.integers(0, 5, nc)]),
            }
        ),
        os.path.join(out, "customer.parquet"),
    )

    # -- everything else: symlink the uniform fixture ------------------
    for t in (
        "region nation supplier part orders lineitem events embeddings"
    ).split():
        src = os.path.abspath(os.path.join(uniform_dir, f"{t}.parquet"))
        dst = os.path.join(out, f"{t}.parquet")
        if os.path.lexists(dst):
            os.remove(dst)
        os.symlink(src, dst)
    print(
        f"skewed twin @ {out}: {nd} docs (mega={wcs[mega_idx]} words, "
        f"{int(hot_docs.sum())} hot docs), {nc} customers "
        f"({len(hot)} in the '{HOT_SURNAME_PREFIX}' block)"
    )


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = sys.argv[2] if len(sys.argv) > 2 else f"_data/sf{sf:g}_skewdocs"
    uniform = sys.argv[3] if len(sys.argv) > 3 else f"_data/sf{sf:g}"
    gen(sf, out, uniform)
