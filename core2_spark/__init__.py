"""core2_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the xtdb/core2 research database.

Reference: /root/reference/README.adoc (archived landing page of xtdb/core2).
core2 is a bitemporal, dynamic, SQL-first relational database
(README.adoc:9-15).  This package re-expresses its capability surface —
scans, full relational algebra, bitemporal visibility, dynamic/nested data,
scalar function library — as an idiomatic PySpark library (DataFrame /
Spark SQL / Catalyst / Structured Streaming), NOT a port of its
single-node Arrow execution engine.  Spark supplies vectorized execution,
optimization, and distribution; this library supplies the semantics.

Extensions beyond the reference (per the build contract): window
functions, event-time streaming, and LLM-training-data operators
(dedup, similarity search, text analysis, multimodal plumbing), all
designed for 100 TB scale: no driver-side collect loops, broadcast for
small sides, LSH pruning instead of cross joins.
"""

from core2_spark.session import get_spark
from core2_spark.catalog import TABLES, load_tables, register_views

__all__ = ["get_spark", "load_tables", "register_views", "TABLES"]
__version__ = "0.1.0"
