"""Datalog-ish query frontend (SURVEY.md §3.2, M8).

core2 exposes an EDN Datalog API — `{:find [...] :where [...]}` —
compiled onto the same logical-plan algebra as SQL (reference
README.adoc:15; [upstream: core2 `datalog.clj`]): triple patterns
become scans + equi-joins on shared logic variables, predicates become
selections, `:find` aggregates become group-bys.

This is the same architecture on Spark: a small dict-shaped query
compiles to DataFrame operations, so Catalyst optimizes Datalog and
SQL identically.  It is sugar over §2's operators, not new capability.

Query shape::

    q(spark, sf_dir, {
        "find": ["?name", ("count", "?order", "n_orders")],
        "where": [
            ("customer", {"c_custkey": "?cust", "c_name": "?name"}),
            ("orders", {"o_custkey": "?cust", "o_orderkey": "?order",
                        "o_totalprice": "?price"}),
            (">", "?price", 100000),
        ],
    })

- pattern clause: (table, {column: "?var" | constant}) — constants
  filter, shared vars join (equi, on all common vars).
- predicate clause: (op, "?var", value-or-var) with op in
  > >= < <= = != — becomes a filter.
- negation clause: ("not-exists", (table, {column: binding, ...})) —
  anti join on the shared variables (core2 `not-exists?` →
  `:anti-join`).
- find: plain vars project; (agg, "?var", alias) aggregates with
  plain find-vars as grouping keys (agg in count/sum/avg/min/max/
  count-distinct).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from core2_spark.catalog import load_table

_PRED_OPS = {
    ">": lambda a, b: a > b,
    ">=": lambda a, b: a >= b,
    "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
    "=": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
}

_AGGS = {
    "count": lambda c: F.count(c),
    "count-distinct": lambda c: F.countDistinct(c),
    "sum": lambda c: F.sum(c),
    "avg": lambda c: F.avg(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
}


def _is_var(v) -> bool:
    return isinstance(v, str) and v.startswith("?")


def _var_name(v: str) -> str:
    return v[1:]


def _compile_pattern(df: DataFrame, bindings: dict) -> DataFrame:
    """Rename columns to variable names + constant filters."""
    cols, filters = [], []
    for col, v in bindings.items():
        if _is_var(v):
            cols.append(F.col(col).alias(_var_name(v)))
        else:
            filters.append(F.col(col) == F.lit(v))
    for f in filters:
        df = df.filter(f)
    return df.select(*cols)


def q_with_resolver(resolver, query: dict) -> DataFrame:
    """Compile and run a Datalog-ish query; ``resolver(table)`` supplies
    each pattern's relation (a catalog scan, or a basis-pinned
    bitemporal view when called through Engine/Snapshot)."""
    rel: DataFrame | None = None
    predicates: list[tuple] = []
    negations: list[tuple] = []
    for clause in query["where"]:
        if isinstance(clause[0], str) and clause[0] in _PRED_OPS:
            predicates.append(clause)
            continue
        if clause[0] == "not-exists":
            negations.append(clause[1])
            continue
        table, bindings = clause
        part = _compile_pattern(resolver(table), bindings)
        if rel is None:
            rel = part
        else:
            shared = sorted(set(rel.columns) & set(part.columns))
            rel = rel.join(part, shared) if shared else rel.crossJoin(part)
    if rel is None:
        raise ValueError("query has no pattern clauses")

    for table, bindings in negations:
        part = _compile_pattern(resolver(table), bindings)
        shared = sorted(set(rel.columns) & set(part.columns))
        if not shared:
            raise ValueError("not-exists clause shares no variables with the query")
        rel = rel.join(part, shared, "left_anti")

    for op, a, b in predicates:
        left: Column = F.col(_var_name(a)) if _is_var(a) else F.lit(a)
        right: Column = F.col(_var_name(b)) if _is_var(b) else F.lit(b)
        rel = rel.filter(_PRED_OPS[op](left, right))

    find = query["find"]
    group_vars = [_var_name(f) for f in find if _is_var(f)]
    agg_specs = [f for f in find if not _is_var(f)]
    if not agg_specs:
        return rel.select(*group_vars)
    aggs = []
    for spec in agg_specs:
        agg_name, var, alias = spec
        aggs.append(_AGGS[agg_name](F.col(_var_name(var))).alias(alias))
    if group_vars:
        return rel.groupBy(*group_vars).agg(*aggs)
    return rel.agg(*aggs)


def q(spark: SparkSession, sf_dir: str, query: dict) -> DataFrame:
    """Compile and run a Datalog-ish query against the catalog."""
    return q_with_resolver(lambda table: load_table(spark, sf_dir, table), query)
