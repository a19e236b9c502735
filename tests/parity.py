"""Shared differential-compare helper emulating the driver's check:
row count + schema width + order-insensitive rounded-value equality
between a Spark result and its DuckDB oracle."""

from __future__ import annotations

import math

import pandas as pd


import datetime


def _norm_cell(v):
    if v is None or v is pd.NaT:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "∅"
        r = round(v, 6)
        return "0.0" if r == 0 else repr(r)
    if isinstance(v, bool):
        return "T" if v else "F"
    if isinstance(v, pd.Timestamp):
        # DuckDB DATE → pandas midnight Timestamp; Spark DATE →
        # datetime.date.  Collapse midnight timestamps to the date
        # form so the logical value compares equal.  tz-aware values
        # normalize to naive UTC.
        if v.tzinfo is not None:
            v = v.tz_convert("UTC").tz_localize(None)
        v = v.floor("us")
        if v.time() == datetime.time(0, 0):
            return v.date().isoformat()
        return v.isoformat()
    return str(v)


def normalize_frame(df: pd.DataFrame) -> list[tuple]:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = [tuple(_norm_cell(v) for v in rec) for rec in df.itertuples(index=False)]
    return sorted(rows)


def rows_only_canonical(pdf: pd.DataFrame) -> list[tuple]:
    """Driver-identical rows-only canonicalization.

    The driver's weaker no-oracle check still column-sorts and
    value-sorts the result in pandas, whose hashtable-backed sort
    raises ``TypeError: unhashable type`` on list/dict/ndarray cells —
    exactly how ``multimodal_feature_extract`` went red in round 5
    while the old count()-only local twin stayed green.  Enforce
    hashability explicitly (mirrors pandas ``factorize``) and then
    sort, so unhashable output types fail locally first."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for col in pdf.columns:
        for v in pdf[col]:
            hash(v)  # TypeError on list/dict/set/ndarray, like the driver
    if len(pdf.columns):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    return [tuple(rec) for rec in pdf.itertuples(index=False)]


def assert_frames_match(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str):
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: column mismatch {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} vs {len(duck_pdf)}"
    )
    a, b = normalize_frame(spark_pdf), normalize_frame(duck_pdf)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mismatches, f"{name}: {len(mismatches)} mismatching rows; first: {mismatches[:3]}"
