"""XTQL-style pipeline frontend (the reference's successor query
language to EDN-Datalog; README.adoc:13-15 claims the query surface):
a query is a PIPELINE of operator dicts, compiled step by step to
DataFrame algebra — the same compile-to-Catalyst strategy as the
Datalog frontend (`datalog.py`), so every pipeline inherits pushdown,
pruning, and join planning for free.

Pipeline representation (Python lists/dicts standing in for the EDN)::

    q(spark, sf_dir, [
        {"from": "orders",
         "bind": ["o_orderkey", {"o_custkey": "cust"},
                  {"o_orderstatus": {"=": "F"}}]},
        {"where": [[">", "o_totalprice", 1000.0]]},
        {"with": {"bucket": ["%", "cust", 10]}},
        {"aggregate": {"n": ["count"],
                       "total": ["sum", "o_totalprice"]},
         "group": ["bucket"]},
        {"order-by": [["total", "desc"], "bucket"]},
        {"limit": 5},
        {"return": ["bucket", "n", "total"]},
    ])

Operators: ``from`` (bind: plain string = bind column under its own
name, {col: name} = rename, {col: {"=": lit}} = equality match pushed
into the scan), ``where`` (expression list, all ANDed), ``with``
(computed columns), ``without`` (drop), ``join`` / ``left-join``
(sub-pipeline or {"from": ...} + ``on`` column pairs), ``unnest``
(explode an array column), ``aggregate`` (+ ``group``), ``order-by``,
``limit`` / ``offset`` (require an order-by earlier in the pipeline —
an unordered limit is non-deterministic, same rule as the Datalog
frontend), ``return``.

Expressions are ``[op, operand, ...]`` lists: strings are COLUMN
references, numbers/booleans/None are literals, and ``["lit", x]``
wraps a literal string.  Scalar ops: comparison/arithmetic/bool,
``like``, ``lower``/``upper``, ``coalesce``, ``%``.

Scale notes: ``from`` binds compile to column pruning + pushed
equality filters (PushedFilters in the scan); ``order-by``+``limit``
fuses to TakeOrderedAndProject; joins are plain equi-joins Catalyst
plans (broadcast when a side is small).  Nothing here collects to the
driver."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from core2_spark.catalog import load_table

_BINARY = {
    "=": lambda a, b: a == b,
    "<>": lambda a, b: a != b,
    "!=": lambda a, b: a != b,
    "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
    ">": lambda a, b: a > b,
    ">=": lambda a, b: a >= b,
    "+": lambda a, b: a + b,
    "-": lambda a, b: a - b,
    "*": lambda a, b: a * b,
    "/": lambda a, b: a / b,
    "%": lambda a, b: a % b,
}

_AGGS = {
    "count": lambda col: F.count(F.lit(1)) if col is None else F.count(col),
    "count-distinct": lambda col: F.countDistinct(col),
    "sum": F.sum,
    "avg": F.avg,
    "min": F.min,
    "max": F.max,
}


def _expr(e) -> Column:
    """Compile an expression: str = column ref, scalars = literals,
    [op, ...] = application."""
    if isinstance(e, str):
        return F.col(e)
    if not isinstance(e, (list, tuple)):
        return F.lit(e)
    op, *args = e
    if op == "lit":
        (v,) = args
        return F.lit(v)
    if op == "like":
        col, pat = args
        if isinstance(pat, (list, tuple)) and pat and pat[0] == "lit":
            pat = pat[1]
        if not isinstance(pat, str):
            raise ValueError("like needs a literal string pattern")
        return _expr(col).like(pat)
    if op == "and":
        out = _expr(args[0])
        for a in args[1:]:
            out = out & _expr(a)
        return out
    if op == "or":
        out = _expr(args[0])
        for a in args[1:]:
            out = out | _expr(a)
        return out
    if op == "not":
        (a,) = args
        return ~_expr(a)
    if op in ("lower", "upper"):
        (a,) = args
        return getattr(F, op)(_expr(a))
    if op == "coalesce":
        return F.coalesce(*[_expr(a) for a in args])
    if op == "cast":
        a, typ = args
        if not isinstance(typ, str):
            raise ValueError("cast needs a type-name string")
        return _expr(a).cast(typ)
    if op == "round":
        a, n = args
        return F.round(_expr(a), int(n))
    if op in _BINARY:
        a, b = args
        return _BINARY[op](_expr(a), _expr(b))
    raise ValueError(f"XTQL: unknown expression op {op!r}")


def _compile_from(resolver, spec: dict) -> DataFrame:
    df = resolver(spec["from"])
    binds = spec.get("bind")
    if binds is None:
        return df
    cols, filters = [], []
    for b in binds:
        if isinstance(b, str):
            cols.append(F.col(b))
            continue
        if not (isinstance(b, dict) and len(b) == 1):
            raise ValueError(f"XTQL from: bad bind {b!r}")
        (col, target), = b.items()
        if isinstance(target, str):
            cols.append(F.col(col).alias(target))
        elif isinstance(target, dict) and set(target) == {"="}:
            filters.append(F.col(col) == F.lit(target["="]))
        else:
            raise ValueError(f"XTQL from: bad bind target {target!r}")
    for flt in filters:
        df = df.filter(flt)
    if not cols:
        raise ValueError("XTQL from: bind selected no columns")
    return df.select(*cols)


def xtql_with_resolver(resolver, pipeline: list) -> DataFrame:
    """Compile and run an XTQL pipeline; ``resolver(table)`` supplies
    each ``from``'s relation (catalog scan, or a basis-pinned view via
    ``Snapshot.xtql``)."""
    if not pipeline:
        raise ValueError("XTQL: empty pipeline")
    head, *rest = pipeline
    if "from" not in head:
        raise ValueError("XTQL: a pipeline starts with a from op")
    df = _compile_from(resolver, head)
    ordered = False
    for op in rest:
        if "where" in op:
            for e in op["where"]:
                df = df.filter(_expr(e))
        elif "with" in op:
            for name, e in op["with"].items():
                df = df.withColumn(name, _expr(e))
        elif "without" in op:
            df = df.drop(*op["without"])
        elif "join" in op or "left-join" in op:
            kind = "join" if "join" in op else "left-join"
            spec = op[kind]
            if isinstance(spec, dict):
                other = _compile_from(resolver, spec)
            else:
                other = xtql_with_resolver(resolver, spec)
            on = op.get("on")
            if not on:
                raise ValueError("XTQL join: 'on' column pairs required")
            cond = None
            for pair in on:
                l, r = (pair, pair) if isinstance(pair, str) else pair
                c = df[l] == other[r]
                cond = c if cond is None else cond & c
            df = df.join(
                other, cond, "inner" if kind == "join" else "left"
            )
        elif "unnest" in op:
            (name, src), = op["unnest"].items()
            df = df.withColumn(name, F.explode(F.col(src)))
        elif "aggregate" in op:
            group = op.get("group", [])
            aggs = []
            for alias, spec in op["aggregate"].items():
                fn, *args = spec
                if fn not in _AGGS:
                    raise ValueError(f"XTQL aggregate: unknown fn {fn!r}")
                col = _expr(args[0]) if args else None
                aggs.append(_AGGS[fn](col).alias(alias))
            df = (
                df.groupBy(*[F.col(g) for g in group]).agg(*aggs)
                if group
                else df.agg(*aggs)
            )
        elif "order-by" in op:
            cols = []
            for item in op["order-by"]:
                name, direction = (
                    item if isinstance(item, (list, tuple)) else (item, "asc")
                )
                if direction not in ("asc", "desc"):
                    raise ValueError(
                        f"XTQL order-by: direction {direction!r}"
                    )
                c = F.col(name)
                cols.append(c.desc() if direction == "desc" else c.asc())
            df = df.orderBy(*cols)
            ordered = True
        elif "limit" in op or "offset" in op:
            if not ordered:
                raise ValueError(
                    "XTQL: limit/offset need an order-by earlier in the "
                    "pipeline — an unordered limit is non-deterministic"
                )
            if "offset" in op:
                df = df.offset(int(op["offset"]))
            if "limit" in op:
                df = df.limit(int(op["limit"]))
        elif "return" in op:
            cols = []
            for r in op["return"]:
                if isinstance(r, str):
                    cols.append(F.col(r))
                elif isinstance(r, dict) and len(r) == 1:
                    (col, alias), = r.items()
                    cols.append(F.col(col).alias(alias))
                else:
                    raise ValueError(f"XTQL return: bad item {r!r}")
            df = df.select(*cols)
        elif "from" in op:
            raise ValueError(
                "XTQL: a mid-pipeline from is not supported — use join"
            )
        else:
            raise ValueError(f"XTQL: unknown operator {sorted(op)!r}")
    return df


def q(spark: SparkSession, sf_dir: str, pipeline: list) -> DataFrame:
    """Run an XTQL pipeline against the catalog tables."""
    return xtql_with_resolver(
        lambda table: load_table(spark, sf_dir, table), pipeline
    )
