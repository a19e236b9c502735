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

from pyspark.sql import DataFrame, SparkSession


def read_arrow_ipc(spark: SparkSession, path: str) -> DataFrame:
    """Load an Arrow IPC (Feather v2 / stream) file as a DataFrame.

    Driver-side read via pyarrow → Arrow-batch conversion into Spark
    (zero-copy where types allow).  Suitable for dimension/reference
    tables; not a distributed scan.
    """
    import pyarrow as pa
    import pyarrow.ipc

    try:
        with pa.memory_map(path) as source:
            table = pa.ipc.open_file(source).read_all()
    except pa.ArrowInvalid:
        with pa.OSFile(path, "rb") as source:
            table = pa.ipc.open_stream(source).read_all()
    return spark.createDataFrame(table.to_pandas())
