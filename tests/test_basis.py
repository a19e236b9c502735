"""Repeatable reads: a Basis pins the file manifest, so appends after
acquisition are invisible to reads at that basis (core2's
log-position + clock semantics, §3.3)."""

from __future__ import annotations

import os
import shutil

from core2_spark.basis import acquire_basis

DATA_DIR = "/root/repo/_data/basis_test"


def test_basis_pins_file_manifest(spark):
    shutil.rmtree(DATA_DIR, ignore_errors=True)
    os.makedirs(DATA_DIR, exist_ok=True)
    tbl = f"{DATA_DIR}/tbl"
    spark.createDataFrame([(1, "a")], "id long, s string").write.mode("append").parquet(tbl)

    basis = acquire_basis({"tbl": tbl}, "2024-06-01T00:00:00")
    assert basis.read(spark, "tbl").count() == 1

    # Append after basis acquisition — a new transaction.
    spark.createDataFrame([(2, "b")], "id long, s string").write.mode("append").parquet(tbl)

    # Reads at the old basis are repeatable; a new basis sees the append.
    assert basis.read(spark, "tbl").count() == 1
    basis2 = acquire_basis({"tbl": tbl}, "2024-06-02T00:00:00")
    assert basis2.read(spark, "tbl").count() == 2
    # the pinned clock travels with the basis (deterministic "now")
    assert basis.current_time.isoformat() == "2024-06-01T00:00:00"
