#!/usr/bin/env python
"""Zipf-skewed events fixture twin (VERDICT r9 task 6).

The seeded events fixture draws user_id UNIFORMLY over 15k·sf users,
so every per-user operator (retention, rolling actives, attribution,
funnel, CUSUM, z-score) shuffles perfectly even partitions — a shape
production never has.  This writes an events twin whose user_id is
Zipf(s)-distributed (rank-probability ranks^-s over the same user
domain): at s=1.2 the hottest user owns ~6% of all events, the
top-10 ~25% — the hot-key shape a consumer product's event stream
actually lands on an engine.

Everything except user_id is IDENTICAL in distribution to the uniform
twin (same seed derivation, same timestamps/types/values), so a
uniform-vs-zipf timing delta is attributable to skew alone.

Usage: python scripts/gen_zipf_events.py <sf> <outdir> [s]
  e.g. python scripts/gen_zipf_events.py 1.0 _data/sf1_zipf
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from gen_fixtures import DAY_US, EVENT_TYPES, rng_for, ts_us  # noqa: E402


def gen(sf: float, out: str, s: float = 1.2) -> None:
    os.makedirs(out, exist_ok=True)
    rng = rng_for(f"events_zipf{s}", sf)
    ne = int(1_000_000 * sf)
    span_us = 30 * DAY_US
    gaps = rng.exponential(span_us / ne, ne).astype(np.int64) + 1
    tsv = np.minimum(np.cumsum(gaps), span_us - 1)
    n_users = max(1, int(15_000 * sf))
    ranks = np.arange(1, n_users + 1, dtype=np.float64)
    p = ranks**-s
    p /= p.sum()
    users = rng.choice(n_users, size=ne, p=p)
    kvals = rng.integers(0, 100, ne)
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(ne), pa.int64()),
            "ts": ts_us(tsv, base="2024-01-01"),
            "user_id": pa.array(users, pa.int64()),
            "event_type": pa.array(
                np.array(EVENT_TYPES)[rng.integers(0, 5, ne)]
            ),
            "value": np.round(np.minimum(rng.exponential(50, ne), 600.0), 2),
            "props": [json.dumps({"k": int(k)}) for k in kvals],
        }
    )
    pq.write_table(tbl, os.path.join(out, "events.parquet"))
    top = np.bincount(users, minlength=n_users)
    top.sort()
    print(
        f"wrote {ne} events, {n_users} users, s={s}; "
        f"hottest user {top[-1]} rows ({100 * top[-1] / ne:.1f}%), "
        f"top-10 share {100 * top[-10:].sum() / ne:.1f}%"
    )


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = sys.argv[2] if len(sys.argv) > 2 else "_data/sf1_zipf"
    s = float(sys.argv[3]) if len(sys.argv) > 3 else 1.2
    gen(sf, out, s)
