"""Nested / dynamic data operators (SURVEY.md §2.7, §1.2).

core2 represents complex and nested data as Arrow types automatically
(reference README.adoc:12): lists, structs, and dense unions for
polymorphic columns, with `:unwind` for unnesting [upstream: core2
`operator/unwind.clj`] and dot/subscript navigation in the expression
JIT.  Spark mapping: ArrayType/StructType/MapType + explode family;
JSON-encoded dynamic columns (the `events.props` fixture) are accessed
with get_json_object / from_json — the variant-encoding strategy for
union-typed documents (dynamics.py).

Array-valued outputs are serialized to strings (concat_ws) so the
oracle hash compare is representation-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from core2_spark.catalog import load_tables
from core2_spark.queries.registry import query


def _tokens(df: DataFrame) -> DataFrame:
    """Whitespace tokens of document text (single-space fixture)."""
    return df.withColumn("toks", F.split(F.trim(F.col("text")), " "))


@query(
    "unwind_explode",
    oracle="""
    SELECT d.doc_id, u.word
    FROM (SELECT doc_id, string_split(trim(text), ' ') AS toks
          FROM documents WHERE doc_id < 100) d,
         unnest(d.toks) AS u(word)
    """,
)
def unwind_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`:unwind` — array → rows (SQL UNNEST / Datalog collection
    binding)."""
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    return (
        _tokens(d.filter(F.col("doc_id") < 100))
        .select("doc_id", F.explode("toks").alias("word"))
    )


@query(
    "unwind_with_ordinality",
    oracle="""
    SELECT d.doc_id, CAST(t.i - 1 AS BIGINT) AS pos, d.toks[CAST(t.i AS INT)] AS word
    FROM (SELECT doc_id, string_split(trim(text), ' ') AS toks
          FROM documents WHERE doc_id < 50) d,
         unnest(generate_series(1, len(d.toks))) AS t(i)
    """,
)
def unwind_ordinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`:unwind` with ordinality — posexplode."""
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    return (
        _tokens(d.filter(F.col("doc_id") < 50))
        .select("doc_id", F.posexplode("toks").alias("pos", "word"))
        .withColumn("pos", F.col("pos").cast("bigint"))
        .select("doc_id", "pos", "word")
    )


@query(
    "unwind_outer_empty",
    oracle="""
    SELECT d.doc_id, u.word
    FROM (SELECT doc_id,
                 list_filter(string_split(trim(text), ' '), x -> length(x) >= 8) AS toks
          FROM documents WHERE doc_id < 100) d
    LEFT JOIN LATERAL (SELECT unnest(d.toks) AS word) u ON TRUE
    """,
)
def unwind_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer — empty arrays keep their parent row (NULL word),
    matching core2's absent-field → NULL semantics."""
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    long_toks = F.filter(F.col("toks"), lambda x: F.length(x) >= 8)
    return (
        _tokens(d.filter(F.col("doc_id") < 100))
        .withColumn("toks", long_toks)
        .select("doc_id", F.explode_outer("toks").alias("word"))
    )


@query(
    "array_functions",
    oracle="""
    SELECT doc_id,
           CAST(len(toks) AS BIGINT)                          AS n_toks,
           toks[2]                                            AS second_tok,
           array_to_string(list_slice(toks, 1, 3), ',')       AS first3,
           array_to_string(list_sort(list_distinct(toks)), ',') AS uniq_sorted,
           list_contains(toks, 'spark')                       AS has_spark
    FROM (SELECT doc_id, string_split(trim(text), ' ') AS toks
          FROM documents WHERE doc_id < 100)
    """,
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CARDINALITY / subscript (1-based) / TRIM_ARRAY-style slice /
    distinct / membership — §2.8 array family."""
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    return _tokens(d.filter(F.col("doc_id") < 100)).select(
        "doc_id",
        F.size("toks").cast("bigint").alias("n_toks"),
        F.element_at("toks", 2).alias("second_tok"),
        F.concat_ws(",", F.slice("toks", 1, 3)).alias("first3"),
        F.concat_ws(",", F.array_sort(F.array_distinct("toks"))).alias("uniq_sorted"),
        F.array_contains("toks", "spark").alias("has_spark"),
    )


@query(
    "json_dynamic_access",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
    FROM events
    GROUP BY event_type
    """,
)
def json_dynamic_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-document field access: the `props` column is the
    variant/JSON encoding of core2's union-typed documents — navigate
    with get_json_object (dot-path), aggregate the extracted leg."""
    e = load_tables(spark, sf_dir, ("events",))["events"]
    k = F.get_json_object("props", "$.k").cast("bigint")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
        F.sum(k).alias("sum_k"),
    )


@query(
    "json_from_json_struct",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) // 10 AS k_bucket,
           COUNT(*) AS n
    FROM events
    GROUP BY 1
    """,
)
def json_from_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read variant decoding: from_json parses the dynamic
    column into a typed struct (the declared-leg form of §1.2's variant
    encoding), then navigates it like any nested column."""
    from pyspark.sql import types as T

    e = load_tables(spark, sf_dir, ("events",))["events"]
    schema = T.StructType([T.StructField("k", T.LongType())])
    parsed = e.withColumn("p", F.from_json("props", schema))
    return (
        parsed.groupBy(F.expr("p.k div 10").alias("k_bucket"))
        .agg(F.count("*").alias("n"))
    )


@query(
    "struct_construct_access",
    oracle="""
    SELECT c_custkey,
           struct_pack(name := c_name, bal := ROUND(c_acctbal, 4)).name AS nested_name,
           struct_pack(name := c_name, bal := ROUND(c_acctbal, 4)).bal  AS nested_bal
    FROM customer WHERE c_custkey <= 200
    """,
)
def struct_construct_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct construction + dot navigation (`a.b` paths over open
    maps in core2)."""
    c = load_tables(spark, sf_dir, ("customer",))["customer"]
    nested = F.struct(
        F.col("c_name").alias("name"), F.round("c_acctbal", 4).alias("bal")
    )
    return c.filter(F.col("c_custkey") <= 200).select(
        "c_custkey",
        nested.getField("name").alias("nested_name"),
        nested.getField("bal").alias("nested_bal"),
    )


@query(
    "array_higher_order",
    oracle="""
    WITH t AS (
        SELECT doc_id, string_split(trim(text), ' ') AS toks
        FROM documents WHERE doc_id < 60
    )
    SELECT doc_id,
           array_to_string(list_transform(list_slice(toks, 1, 5), x -> upper(x)), ',')
                                                                 AS up5,
           CAST(list_aggregate(list_transform(toks, x -> length(x)), 'sum') AS BIGINT)
                                                                 AS total_chars,
           len(list_filter(toks, x -> length(x) > 5)) > 0        AS has_long,
           len(list_filter(toks, x -> length(x) >= 2)) = len(toks) AS all_ge2,
           array_to_string(list_transform(generate_series(1, 3),
                                          i -> toks[CAST(i AS INT)] || ':' || CAST(i AS VARCHAR)), ',')
                                                                 AS zipped3
    FROM t
    """,
)
def array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions (transform / aggregate / exists /
    forall / sequence+zip) — the column-lambda surface Catalyst fully
    codegens, mirroring core2's per-leg vectorized expression JIT."""
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    t = _tokens(d.filter(F.col("doc_id") < 60))
    toks = F.col("toks")
    zipped = F.transform(
        F.sequence(F.lit(1), F.lit(3)),
        lambda i: F.concat(F.element_at(toks, i), F.lit(":"), i.cast("string")),
    )
    return t.select(
        "doc_id",
        F.concat_ws(",", F.transform(F.slice(toks, 1, 5), lambda x: F.upper(x))).alias(
            "up5"
        ),
        F.aggregate(
            F.transform(toks, lambda x: F.length(x).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("total_chars"),
        F.exists(toks, lambda x: F.length(x) > 5).alias("has_long"),
        F.forall(toks, lambda x: F.length(x) >= 2).alias("all_ge2"),
        F.concat_ws(",", zipped).alias("zipped3"),
    )


@query(
    "set_semantics_arrays",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               list_sort(list_distinct(string_split(trim(text), ' ')))      AS s,
               list_sort(list_distinct(string_split(upper(trim(text)), ' '))) AS u
        FROM documents WHERE doc_id < 60
    )
    SELECT doc_id,
           COALESCE(array_to_string(list_sort(list_intersect(s, u)), ','), '')
                                                                  AS set_inter,
           CAST(len(list_distinct(list_concat(s, u))) AS BIGINT)  AS set_union_size,
           COALESCE(array_to_string(list_sort(list_filter(s, x -> NOT list_contains(u, x))), ','), '')
                                                                  AS set_minus
    FROM t
    """,
)
def set_semantics_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """core2's `set` type → arrays + distinct discipline (§1.2):
    set intersection / union-cardinality / difference as column ops."""
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    t = d.filter(F.col("doc_id") < 60).select(
        "doc_id",
        F.array_sort(F.array_distinct(F.split(F.trim("text"), " "))).alias("s"),
        F.array_sort(
            F.array_distinct(F.split(F.trim(F.upper("text")), " "))
        ).alias("u"),
    )
    return t.select(
        "doc_id",
        F.concat_ws(",", F.array_sort(F.array_intersect("s", "u"))).alias("set_inter"),
        F.size(F.array_union("s", "u")).cast("bigint").alias("set_union_size"),
        F.concat_ws(",", F.array_sort(F.array_except("s", "u"))).alias("set_minus"),
    )


@query(
    "tagged_identifier_types",
    oracle="""
    SELECT doc_id,
           substr(md5(text), 1, 8) || '-' || substr(md5(text), 9, 4) || '-' ||
           substr(md5(text), 13, 4) || '-' || substr(md5(text), 17, 4) || '-' ||
           substr(md5(text), 21, 12)                       AS doc_uuid,
           ':' || lower(lang) || '/' || source             AS doc_keyword
    FROM documents WHERE doc_id < 80
    """,
)
def tagged_identifier_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """core2's uuid / keyword extension types (§1.2) as tagged strings:
    a deterministic content-derived UUID (md5-formatted) and a
    keyword-form identifier."""
    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    h = F.md5("text")
    uuid_str = F.concat_ws(
        "-",
        h.substr(1, 8),
        h.substr(9, 4),
        h.substr(13, 4),
        h.substr(17, 4),
        h.substr(21, 12),
    )
    return d.filter(F.col("doc_id") < 80).select(
        "doc_id",
        uuid_str.alias("doc_uuid"),
        F.concat(F.lit(":"), F.lower("lang"), F.lit("/"), F.col("source")).alias(
            "doc_keyword"
        ),
    )


@query(
    "map_construct_access",
    oracle="""
    SELECT o_orderkey,
           map(['status', 'priority'], [o_orderstatus, o_orderpriority])['status'][1]
             AS m_status
    FROM orders WHERE o_orderkey <= 300
    """,
)
def map_construct_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + key lookup."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    m = F.create_map(
        F.lit("status"), F.col("o_orderstatus"), F.lit("priority"), F.col("o_orderpriority")
    )
    return o.filter(F.col("o_orderkey") <= 300).select(
        "o_orderkey", F.element_at(m, "status").alias("m_status")
    )
