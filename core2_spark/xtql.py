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

Operators: ``rel`` (inline document-list relation head, the algebra's
``:table`` — RECORDS-style type inference), ``unify`` (head op:
Datalog-style variable unification over from/rel/with/left-join/
unnest/where clauses — shared variable names natural-join, re-binding
unifies by equality; see ``_compile_unify``), ``from`` (bind: plain
string = bind column under its own name, {col: name} = rename,
{col: {"=": lit}} = equality match pushed into the scan; per-from temporal options ``for-valid-time`` /
``for-system-time`` with ``["at", t]`` / ``["from", lo, "to", hi]`` /
``["in", lo, hi]`` / ``"all-time"`` — the XTDB-v2 spelling, compiled
to the same pushed period predicates as the SQL dialect), ``where``
(expression list, all ANDed; ``["exists"|"not-exists", sub, on]``
compiles a correlated sub-pipeline to left_semi/left_anti), ``with``
(computed columns), ``without`` (drop), ``join`` / ``left-join``
(sub-pipeline or {"from": ...} + ``on`` column pairs; same-name pairs
join on the name list so the key coalesces), ``asof-join`` (nearest
right row per key at-or-before/after each left timestamp — the
library union+window operator, one shuffle, no range join), ``unnest``
(explode an array column), ``pull`` (Datomic-style document projection — reuses
datalog._attach_pull), ``aggregate`` (+ ``group``), ``order-by``
(items: ``"col"`` / ``[col, dir]`` / ``[col, dir, "nulls-first"|
"nulls-last"]`` — the v2 ``{:val :dir :nulls}`` triple),
``limit`` / ``offset`` (require an order-by earlier in the pipeline —
an unordered limit is non-deterministic, same rule as the Datalog
frontend), ``return``.

Expressions are ``[op, operand, ...]`` lists: strings are COLUMN
references, numbers/booleans/None are literals, and ``["lit", x]``
wraps a literal string.  Scalar ops: comparison/arithmetic/bool,
``like``, ``lower``/``upper``/``trim``/``length``/``concat``/
``substring``/``replace``/``starts-with``/``ends-with``, ``abs``,
``extract`` (year..second), ``coalesce``, ``if``, ``in``, ``null?``/
``not-null?``, ``greatest``/``least``, ``cast``, ``round``, ``%`` —
all compiling to built-in JVM-side column functions (never a Python
UDF).

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
    "stddev": F.stddev_samp,
    "variance": F.var_samp,
    "array-agg": lambda col: F.sort_array(F.collect_list(col)),
    "bool-and": F.bool_and,
    "bool-or": F.bool_or,
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
    if op in ("lower", "upper", "trim", "length", "abs"):
        (a,) = args
        return getattr(F, op)(_expr(a))
    if op == "coalesce":
        return F.coalesce(*[_expr(a) for a in args])
    if op == "concat":
        return F.concat(*[_expr(a) for a in args])
    if op == "substring":
        a, pos, ln = args
        return F.substring(_expr(a), int(pos), int(ln))
    if op == "replace":
        a, find, repl = args
        if not (isinstance(find, str) and isinstance(repl, str)):
            raise ValueError("replace needs literal find/replace strings")
        return F.replace(_expr(a), F.lit(find), F.lit(repl))
    if op in ("starts-with", "ends-with"):
        a, pre = args
        if isinstance(pre, (list, tuple)) and pre and pre[0] == "lit":
            pre = pre[1]
        if not isinstance(pre, str):
            raise ValueError(f"{op} needs a literal string")
        col = _expr(a)
        return col.startswith(pre) if op == "starts-with" else col.endswith(pre)
    if op == "extract":
        field, a = args
        fns = {"year": F.year, "month": F.month, "day": F.dayofmonth,
               "hour": F.hour, "minute": F.minute, "second": F.second}
        if field not in fns:
            raise ValueError(f"extract: unknown field {field!r}")
        return fns[field](_expr(a))
    if op == "if":
        cond, then, els = args
        return F.when(_expr(cond), _expr(then)).otherwise(_expr(els))
    if op in ("null?", "not-null?"):
        (a,) = args
        col = _expr(a)
        return col.isNull() if op == "null?" else col.isNotNull()
    if op == "in":
        a, *vals = args
        lits = []
        for v in vals:
            if isinstance(v, (list, tuple)) and v and v[0] == "lit":
                lits.append(v[1])
            elif isinstance(v, str):
                # a bare string is a COLUMN ref everywhere else in the
                # expression language — require ["lit", s] here rather
                # than silently flipping the convention
                raise ValueError(
                    "in: wrap literal strings as ['lit', s] "
                    f"(got bare {v!r})"
                )
            else:
                lits.append(v)
        return _expr(a).isin(lits)
    if op in ("greatest", "least"):
        return getattr(F, op)(*[_expr(a) for a in args])
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


def _temporal_spec_filter(df: DataFrame, spec, start_col: str,
                          end_col: str, axis: str) -> DataFrame:
    """Compile one per-from temporal option (the XTDB-v2 spelling:
    ``(at t)`` / ``(from lo to hi)`` / ``(in lo hi)`` / ``:all-time``,
    here as lists) to the same pushed-down period predicates the SQL
    dialect emits (temporal.as_of_predicate / scan_between)."""
    from core2_spark import temporal as bt

    missing = [c for c in (start_col, end_col) if c not in df.columns]
    if missing:
        raise ValueError(
            f"XTQL {axis}: relation has no {missing} columns — "
            "temporal binds need a versioned (bitemporal) relation"
        )
    if spec == "all-time":
        return df
    if not (isinstance(spec, (list, tuple)) and spec):
        raise ValueError(f"XTQL {axis}: bad temporal spec {spec!r}")
    if spec[0] == "at" and len(spec) == 2:
        t = bt._ts(spec[1])
        return df.filter((F.col(start_col) <= t) & (t < F.col(end_col)))
    if spec[0] == "from" and len(spec) == 4 and spec[2] == "to":
        lo, hi = spec[1], spec[3]
    elif spec[0] == "in" and len(spec) == 3:
        lo, hi = spec[1], spec[2]
    else:
        raise ValueError(f"XTQL {axis}: bad temporal spec {spec!r}")
    return bt.scan_between(df, start_col, end_col, lo, hi)


def _compile_from(resolver, spec: dict) -> DataFrame:
    from core2_spark import temporal as bt

    sys_spec = spec.get("for-system-time")
    app_spec = spec.get("for-valid-time")
    df = None
    handled_sys = handled_app = False
    # ``(at t)`` binds first try a BASIS-AWARE resolver (Snapshot.table
    # takes per-call system_time/app_time and applies the engine's
    # rectangle-correct resolution — strictly better than raw column
    # filters when available); plain lambda resolvers reject the
    # kwargs and fall through to the column-predicate path below.
    def _is_at(s) -> bool:
        return isinstance(s, (list, tuple)) and len(s) == 2 and s[0] == "at"

    def _accepts_kwargs(fn, names: tuple[str, ...]) -> bool:
        """Signature-inspect instead of try/except TypeError: a
        TypeError raised INSIDE the resolver must surface, not silently
        re-route resolution through the wrong (current-state) path."""
        import inspect

        try:
            params = inspect.signature(fn).parameters
        except (TypeError, ValueError):
            return False
        if any(
            p.kind is inspect.Parameter.VAR_KEYWORD for p in params.values()
        ):
            return True
        return all(n in params for n in names)

    all_at = all(s is None or _is_at(s) for s in (sys_spec, app_spec))
    if all_at:
        kw = {}
        if _is_at(sys_spec):
            kw["system_time"] = sys_spec[1]
        if _is_at(app_spec):
            kw["app_time"] = app_spec[1]
        if kw and _accepts_kwargs(resolver, tuple(kw)):
            df = resolver(spec["from"], **kw)
            handled_sys = "system_time" in kw
            handled_app = "app_time" in kw
    elif sys_spec is not None or app_spec is not None:
        # a range / all-time form needs the raw version rows: on the
        # engine path that's Snapshot.history (FOR ALL SYSTEM_TIME,
        # closed periods); every spec — including an at-form mixed
        # with a range — then applies as pushed column predicates
        if _accepts_kwargs(resolver, ("history",)):
            df = resolver(spec["from"], history=True)
    if df is None:
        df = resolver(spec["from"])
    # remaining temporal binds (range forms, all-time, or a resolver
    # without basis support) become pushed column predicates, applied
    # BEFORE the bind projection so the version columns need not
    # survive into the pipeline
    if sys_spec is not None and not handled_sys:
        df = _temporal_spec_filter(
            df, sys_spec, bt.SYS_START, bt.SYS_END, "for-system-time"
        )
    if app_spec is not None and not handled_app:
        df = _temporal_spec_filter(
            df, app_spec, bt.APP_START, bt.APP_END, "for-valid-time"
        )
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


def _join_pairs(df: DataFrame, other: DataFrame, on, how: str) -> DataFrame:
    """Shared pair compiler for join/left-join and exists/not-exists:
    all-same-name pairs join on the column-NAME list (single coalesced
    key, no AMBIGUOUS_REFERENCE downstream, self-join safe); mixed
    pairs join aliased frames and — for row-producing joins — drop the
    right twin of any same-name pair."""
    pairs = [(p, p) if isinstance(p, str) else (p[0], p[1]) for p in on]
    if all(l == r for l, r in pairs):
        return df.join(other, [l for l, _ in pairs], how)
    dl, dr = df.alias("_xtql_l"), other.alias("_xtql_r")
    cond = None
    for l, r in pairs:
        c = F.col(f"_xtql_l.{l}") == F.col(f"_xtql_r.{r}")
        cond = c if cond is None else cond & c
    out = dl.join(dr, cond, how)
    if how in ("inner", "left"):  # semi/anti keep only left columns
        for l, r in pairs:
            if l == r:
                out = out.drop(F.col(f"_xtql_r.{r}"))
    return out


def _apply_exists(resolver, df: DataFrame, e) -> DataFrame:
    """``["exists", sub, on]`` / ``["not-exists", sub, on]`` inside
    ``where`` (XTDB-v2's exists?/not-exists? subqueries): ``sub`` is a
    from-spec dict or a full sub-pipeline, ``on`` the correlation
    column pairs (same format as join).  Compiles to left_semi /
    left_anti — the same decorrelation the Datalog frontend and the SQL
    dialect's EXISTS rewrite use, so Catalyst plans one hash join and
    never a per-row subquery."""
    if len(e) != 3:
        raise ValueError(
            f"XTQL {e[0]}: expected [{e[0]!r}, sub-pipeline, on-pairs]"
        )
    kind, sub, on = e
    other = (
        _compile_from(resolver, sub)
        if isinstance(sub, dict)
        else xtql_with_resolver(resolver, sub)
    )
    if not on:
        raise ValueError(f"XTQL {kind}: 'on' column pairs required")
    return _join_pairs(
        df, other, on, "left_semi" if kind == "exists" else "left_anti"
    )


def _rel_literal(docs) -> DataFrame:
    """Inline relation literal (XTQL `rel` / the algebra's `:table`):
    a list of documents; reuses the RECORDS type-inference +
    int->double coercion so mixed numerics behave like DML."""
    from core2_spark.sql_dml import records_to_df

    if not (isinstance(docs, list) and docs
            and all(isinstance(d, dict) for d in docs)):
        raise ValueError("XTQL rel: a non-empty list of documents")
    # getActiveSession is thread-scoped (None on e.g. an HTTP
    # handler thread that never touched Spark); fall back to the
    # process-wide default session
    spark = SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()
    return records_to_df(spark, docs)


def _compile_unify(resolver, clauses) -> DataFrame:
    """XTQL ``unify`` — Datalog-style variable unification as a source
    op (the one v2 language op the pipeline head lacked).  Each
    relation clause binds logic variables (columns); clauses sharing a
    variable natural-join on it — the same shared-column equi-join
    strategy as the Datalog pattern pass (``datalog.q_with_resolver``),
    so Catalyst still plans join order and broadcasts small sides.

    Clause kinds: ``from`` / ``rel`` (relations, incl. per-from
    temporal options), ``with`` (computed binding; RE-binding an
    already-bound variable unifies — an equality filter, which on a
    fresh cross product Catalyst folds back into the join condition),
    ``left-join`` (optional unification: unmatched rows survive with
    NULL bindings; joins on shared variables, or explicit ``on``
    pairs), ``unnest`` (explode an array binding), ``where``
    (predicates, incl. exists/not-exists — deferred until every
    variable is bound, so clause order between relations and wheres is
    declarative).  ``with``/``left-join``/``unnest`` may only
    reference variables bound by EARLIER clauses."""
    if not (isinstance(clauses, list) and clauses):
        raise ValueError("XTQL unify: a non-empty list of clauses")
    rel: DataFrame | None = None
    wheres: list = []
    for c in clauses:
        if not isinstance(c, dict):
            raise ValueError(f"XTQL unify: bad clause {c!r}")
        if "where" in c:
            wheres.extend(c["where"])
            continue
        if "with" in c:
            if rel is None:
                raise ValueError(
                    "XTQL unify: 'with' needs a prior relation clause"
                )
            for name, e in c["with"].items():
                col = _expr(e)
                if name in rel.columns:
                    rel = rel.filter(F.col(name) == col)
                else:
                    rel = rel.withColumn(name, col)
            continue
        if "left-join" in c:
            if rel is None:
                raise ValueError(
                    "XTQL unify: 'left-join' needs a prior relation clause"
                )
            spec = c["left-join"]
            part = (
                _compile_from(resolver, spec)
                if isinstance(spec, dict)
                else xtql_with_resolver(resolver, spec)
            )
            on = c.get("on")
            if on:
                rel = _join_pairs(rel, part, on, "left")
            else:
                shared = sorted(set(rel.columns) & set(part.columns))
                if not shared:
                    raise ValueError(
                        "XTQL unify left-join: no shared variables "
                        "(and no 'on' pairs)"
                    )
                rel = rel.join(part, shared, "left")
            continue
        if "unnest" in c:
            if rel is None:
                raise ValueError(
                    "XTQL unify: 'unnest' needs a prior relation clause"
                )
            (uname, usrc), = c["unnest"].items()
            rel = rel.withColumn(uname, F.explode(F.col(usrc)))
            continue
        if "rel" in c:
            part = _rel_literal(c["rel"])
        elif "from" in c:
            part = _compile_from(resolver, c)
        else:
            raise ValueError(f"XTQL unify: unknown clause {sorted(c)!r}")
        if rel is None:
            rel = part
        else:
            shared = sorted(set(rel.columns) & set(part.columns))
            rel = rel.join(part, shared) if shared else rel.crossJoin(part)
    if rel is None:
        raise ValueError(
            "XTQL unify: at least one relation clause (from/rel)"
        )
    for e in wheres:
        if (isinstance(e, (list, tuple)) and e
                and e[0] in ("exists", "not-exists")):
            rel = _apply_exists(resolver, rel, e)
        else:
            rel = rel.filter(_expr(e))
    return rel


def xtql_with_resolver(resolver, pipeline: list) -> DataFrame:
    """Compile and run an XTQL pipeline; ``resolver(table)`` supplies
    each ``from``'s relation (catalog scan, or a basis-pinned view via
    ``Snapshot.xtql``)."""
    if not pipeline:
        raise ValueError("XTQL: empty pipeline")
    head, *rest = pipeline
    if "rel" in head:
        df = _rel_literal(head["rel"])
    elif "unify" in head:
        df = _compile_unify(resolver, head["unify"])
    elif "from" in head:
        df = _compile_from(resolver, head)
    else:
        raise ValueError(
            "XTQL: a pipeline starts with a from, rel, or unify op"
        )
    ordered = False
    for op in rest:
        if "where" in op:
            for e in op["where"]:
                if (
                    isinstance(e, (list, tuple))
                    and e
                    and e[0] in ("exists", "not-exists")
                ):
                    df = _apply_exists(resolver, df, e)
                else:
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
            df = _join_pairs(
                df, other, on, "inner" if kind == "join" else "left"
            )
        elif "asof-join" in op:
            # event-stream enrichment: attach the nearest right row per
            # key in `direction` — compiles to the library's
            # union+window operator (ONE shuffle on the keys, no range
            # join, robust to arbitrarily large key groups)
            from core2_spark.operators.asof_join import asof_join

            spec = op["asof-join"]
            other = (
                _compile_from(resolver, spec)
                if isinstance(spec, dict)
                else xtql_with_resolver(resolver, spec)
            )
            by = op.get("on")
            if not by or not all(isinstance(p, str) for p in by):
                raise ValueError(
                    "XTQL asof-join: 'on' must list same-name key "
                    "columns (the matched timestamps are never equality"
                    "-joined, so there is no pair form)"
                )
            ts = op.get("time")
            values = op.get("values")
            if not isinstance(ts, str) or not values:
                raise ValueError(
                    "XTQL asof-join: 'time' (shared timestamp column) "
                    "and 'values' (right columns to attach) required"
                )
            tol = op.get("tolerance")
            if isinstance(tol, str):
                tol = F.expr(tol)
            df = asof_join(
                df, other, ts, list(by), list(values),
                direction=op.get("direction", "backward"),
                tolerance=tol,
            )
        elif "unnest" in op:
            (name, src), = op["unnest"].items()
            df = df.withColumn(name, F.explode(F.col(src)))
        elif "pull" in op:
            # Datomic-style document projection inside XTQL: reuses the
            # Datalog frontend's pull compiler (datalog._attach_pull —
            # one groupBy+collect_list per rel, one equi-join back; no
            # per-entity subqueries).  ``on`` names the pipeline column
            # holding the entity id; the rest is the pull spec.
            from core2_spark.datalog import _attach_pull

            p = dict(op["pull"])
            try:
                var = p.pop("on")
            except KeyError:
                raise ValueError(
                    "XTQL pull: 'on' (the pipeline column holding the "
                    "entity id) is required"
                ) from None
            df = _attach_pull(resolver, df, var, p)
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
                # "col" | ["col", dir] | ["col", dir, "nulls-first"/
                # "nulls-last"] — the v2 spec's {:val :dir :nulls}
                # triple.  Default nulls placement follows the dir's
                # natural Spark order (asc → nulls first, desc → last).
                nulls = None
                if isinstance(item, (list, tuple)):
                    name, direction, *restn = item
                    if restn:
                        (nulls,) = restn
                else:
                    name, direction = item, "asc"
                if direction not in ("asc", "desc"):
                    raise ValueError(
                        f"XTQL order-by: direction {direction!r}"
                    )
                if nulls not in (None, "nulls-first", "nulls-last"):
                    raise ValueError(
                        f"XTQL order-by: nulls placement {nulls!r}"
                    )
                c = F.col(name)
                if direction == "desc":
                    c = (
                        c.desc_nulls_first() if nulls == "nulls-first"
                        else c.desc_nulls_last() if nulls == "nulls-last"
                        else c.desc()
                    )
                else:
                    c = (
                        c.asc_nulls_first() if nulls == "nulls-first"
                        else c.asc_nulls_last() if nulls == "nulls-last"
                        else c.asc()
                    )
                cols.append(c)
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
