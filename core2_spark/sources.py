"""External data sources (SURVEY.md §2.1 `:arrow` / `:csv` row).

CSV/JSON ride Spark's native readers (see queries/extras_q.py).  Arrow
IPC files have no built-in Spark reader; ``read_arrow_ipc`` loads them
through pyarrow and hands Spark an Arrow-backed DataFrame.  This is a
*reference-data* path (driver-side materialization) — the reference
uses ARROW_TABLE() the same way, for small external tables
[upstream: core2 `operator/external_data.clj`].  Big data belongs in
Parquet; the docstring is the guardrail.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# Driver-side materialization ceiling for read_arrow_ipc: reference
# tables are MBs; anything bigger belongs in Parquet as a distributed
# scan, and loading it onto the driver is how OOMs happen at scale.
ARROW_IPC_MAX_BYTES = 256 * 1024 * 1024


def read_arrow_ipc(
    spark: SparkSession, path: str, max_bytes: int = ARROW_IPC_MAX_BYTES
) -> DataFrame:
    """Load an Arrow IPC (Feather v2 / stream) file as a DataFrame.

    Driver-side read via pyarrow → Arrow-batch conversion into Spark
    (zero-copy where types allow).  Suitable for dimension/reference
    tables; the ``max_bytes`` guard (not just this docstring) refuses
    files too big for a driver-side materialization — convert those to
    Parquet and use a distributed ``spark.read`` scan instead.
    """
    import pyarrow as pa
    import pyarrow.ipc

    size = os.path.getsize(path)
    if size > max_bytes:
        raise ValueError(
            f"read_arrow_ipc is a driver-side reference-data path; {path} is "
            f"{size} bytes (> {max_bytes}). Convert it to Parquet and read it "
            "as a distributed scan (spark.read.parquet), or raise max_bytes "
            "explicitly if the driver really has the memory."
        )

    try:
        with pa.memory_map(path) as source:
            table = pa.ipc.open_file(source).read_all()
    except pa.ArrowInvalid:
        with pa.OSFile(path, "rb") as source:
            table = pa.ipc.open_stream(source).read_all()
    return spark.createDataFrame(table.to_pandas())
