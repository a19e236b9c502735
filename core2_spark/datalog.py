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
- bind clause (core2 function expressions in `:where`):
  ("bind", "?new", (op, term, term)) with op in + - * / div mod —
  computes a new variable from bound ones (nestable expressions).
- in bindings (core2 `:in`): ``"in": ["?a", "?coll"]`` + ``args=[...]``
  — a scalar arg filters/binds its variable; a list/tuple arg is a
  collection binding (core2 `[?x ...]` → `:table` relation joined on
  the variable, i.e. relational membership, never a driver-side loop).
- rules (core2 `:rules`): ``"rules": [(name, [head vars], [body
  clauses]), ...]`` — multiple definitions of one name union; a rule
  is invoked from `where` (or another rule body) as
  ``(name, term, ...)`` with positional terms.  Self-recursive rules
  run as a semi-naive fixpoint (operators.recursion.fixpoint), the
  algebra's μ operator.
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

_BIND_OPS = {
    "+": lambda a, b: a + b,
    "-": lambda a, b: a - b,
    "*": lambda a, b: a * b,
    "/": lambda a, b: a / b,
    # floor division (matches SQL DIV on the non-negative keys it's used for)
    "div": lambda a, b: F.floor(a / b).cast("long"),
    "mod": lambda a, b: a % b,
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


def _collection_relation(resolver, var: str, values) -> DataFrame:
    """core2 collection binding `[?x ...]` → an inline `:table`
    relation with one column named after the variable; joined on that
    variable it is relational membership (and broadcastable)."""
    spark = SparkSession.getActiveSession()
    name = _var_name(var)
    return spark.createDataFrame([(v,) for v in values], [name]).distinct()


def _references(body: list, name: str) -> bool:
    return any(
        isinstance(c[0], str) and c[0] == name
        for c in body
        if isinstance(c, tuple) and len(c) >= 1
    )


def _neg_references(body: list, names: set[str]) -> set[str]:
    """Rule names from ``names`` referenced under not-exists in
    ``body`` (negative dependencies)."""
    out: set[str] = set()
    for c in body:
        if (
            isinstance(c, tuple)
            and c
            and c[0] == "not-exists"
            and isinstance(c[1], tuple)
            and c[1]
            and isinstance(c[1][0], str)
            and c[1][0] in names
        ):
            out.add(c[1][0])
    return out


def _sccs(order: list[str], edges: dict[str, set[str]]) -> list[list[str]]:
    """Tarjan strongly-connected components, emitted dependencies-first
    (every SCC a component references is emitted before it)."""
    index: dict[str, int] = {}
    low: dict[str, int] = {}
    on_stack: set[str] = set()
    stack: list[str] = []
    out: list[list[str]] = []
    counter = [0]

    def visit(v: str) -> None:
        index[v] = low[v] = counter[0]
        counter[0] += 1
        stack.append(v)
        on_stack.add(v)
        for w in sorted(edges.get(v, ())):
            if w not in index:
                visit(w)
                low[v] = min(low[v], low[w])
            elif w in on_stack:
                low[v] = min(low[v], index[w])
        if low[v] == index[v]:
            comp = []
            while True:
                w = stack.pop()
                on_stack.discard(w)
                comp.append(w)
                if w == v:
                    break
            out.append(sorted(comp, key=order.index))

    for v in order:
        if v not in index:
            visit(v)
    return out


def _eval_rules(
    resolver,
    rules: list[tuple],
    outer_frames: dict[str, tuple[list[str], DataFrame]],
) -> dict[str, tuple[list[str], DataFrame]]:
    """Evaluate rule definitions into named relations.

    Multiple definitions of one name union (bag→set).  A rule whose
    bodies reference itself runs as a semi-naive fixpoint: the base
    bodies seed the accumulator, each iteration re-evaluates the
    recursive bodies with the self-invocation bound to the previous
    frontier only — the μ operator of core2's logical-plan algebra
    [upstream: core2 `logical_plan.clj` fixpoint] on Spark joins.

    MUTUALLY recursive rules (core2 allows rule bodies to invoke each
    other freely) are grouped into strongly-connected components of
    the reference graph and each SCC runs a joint monotone fixpoint:
    base bodies seed, every round re-derives each member from the full
    accumulated relations, distinct+checkpoint bounds lineage, and the
    round converges when no member grew.  Positive datalog is
    monotone, so naive joint iteration is exact; ``not-exists`` bodies
    resolve against TABLES only (never rules), so no non-stratified
    negation can arise.  Definition order never matters — SCCs are
    processed dependencies-first.
    """
    from core2_spark.operators.recursion import fixpoint

    defs: dict[str, list[tuple[list[str], list]]] = {}
    order: list[str] = []
    for name, head, body in rules:
        if name not in defs:
            order.append(name)
        defs.setdefault(name, []).append((head, body))

    all_names = set(order)
    edges = {
        name: {
            other
            for other in order
            if any(_references(b, other) for _, b in bodies)
        }
        | {
            neg
            for _, b in bodies
            for neg in _neg_references(b, all_names)
        }
        for name, bodies in defs.items()
    }

    frames = dict(outer_frames)

    def eval_body(head: list[str], body: list, extra) -> DataFrame:
        df = q_with_resolver(
            resolver, {"find": head, "where": body}, rule_frames={**frames, **extra}
        )
        return df

    canon_heads = {name: defs[name][0][0] for name in order}

    def to_canon(df: DataFrame, head: list[str], name: str) -> DataFrame:
        canon_cols = [_var_name(v) for v in canon_heads[name]]
        if [_var_name(v) for v in head] != canon_cols:
            return df.toDF(*canon_cols)
        return df

    for comp in _sccs(order, edges):
        scc_names = set(comp)
        for member in comp:
            for _, b in defs[member]:
                bad = _neg_references(b, scc_names)
                if bad:
                    raise ValueError(
                        f"rule {member!r} negates {sorted(bad)!r} inside "
                        "its own recursive component — not stratified"
                    )
        name = comp[0]
        if len(comp) == 1 and name not in edges.get(name, ()):
            bodies = defs[name]
            canon_head = canon_heads[name]
            canon_cols = [_var_name(v) for v in canon_head]
            rec_bodies = [(h, b) for h, b in bodies if _references(b, name)]
            if not rec_bodies:
                parts = [to_canon(eval_body(h, b, {}), h, name) for h, b in bodies]
                rel = parts[0]
                for p in parts[1:]:
                    rel = rel.unionByName(p)
                frames[name] = (canon_head, rel.distinct())
                continue
            base_bodies = [(h, b) for h, b in bodies if not _references(b, name)]
            if not base_bodies:
                raise ValueError(
                    f"recursive rule {name!r} has no non-recursive body"
                )
            base = None
            for h, b in base_bodies:
                part = to_canon(eval_body(h, b, {}), h, name)
                base = part if base is None else base.unionByName(part)

            def step(frontier: DataFrame, _name=name, _rec=tuple(rec_bodies)) -> DataFrame:
                out = None
                for h, b in _rec:
                    part = to_canon(
                        eval_body(h, b, {_name: (canon_heads[_name], frontier)}),
                        h,
                        _name,
                    )
                    out = part if out is None else out.unionByName(part)
                return out

            frames[name] = (canon_head, fixpoint(base, step, key_cols=canon_cols))
            continue

        # mutually recursive component (or a self-loop listed with
        # itself): joint SEMI-NAIVE fixpoint over the whole SCC.  Each
        # round evaluates every recursive body once per referenced
        # member, with THAT reference bound to the member's delta (the
        # rows new last round) and every other reference to the full
        # accumulator — the standard semi-naive rewrite, exact for
        # monotone (positive) datalog.  Work per round is proportional
        # to the frontier, not the accumulated relations — the same
        # property the single-rule fixpoint operator already has.
        scc = set(comp)
        cur: dict[str, DataFrame] = {}
        delta: dict[str, DataFrame] = {}
        for member in comp:
            base = None
            for h, b in defs[member]:
                if any(_references(b, r) for r in scc):
                    continue
                part = to_canon(eval_body(h, b, {}), h, member)
                base = part if base is None else base.unionByName(part)
            if base is not None:
                rel = base.distinct().localCheckpoint(eager=True)
                cur[member] = rel
                delta[member] = rel
        if not cur:
            raise ValueError(
                f"mutually recursive rules {comp!r} have no "
                "non-recursive body anywhere in the component"
            )
        for round_no in range(1, 201):
            new_delta: dict[str, DataFrame] = {}
            for member in comp:
                parts = []
                for h, b in defs[member]:
                    refs = {r for r in scc if _references(b, r)}
                    if not refs:
                        continue  # base body, already seeded
                    if any(r not in cur for r in refs):
                        continue  # an empty relation derives nothing
                    full = {
                        r: (canon_heads[r], cur[r]) for r in scc if r in cur
                    }
                    for dref in refs:
                        if dref not in delta:
                            continue  # nothing new there last round
                        extra = {
                            **full,
                            dref: (canon_heads[dref], delta[dref]),
                        }
                        parts.append(
                            to_canon(eval_body(h, b, extra), h, member)
                        )
                if not parts:
                    continue
                derived = parts[0]
                for p in parts[1:]:
                    derived = derived.unionByName(p)
                canon_cols = [_var_name(v) for v in canon_heads[member]]
                fresh = derived.distinct()
                if member in cur:
                    # NULL-SAFE anti-join, same reason as the single-rule
                    # fixpoint (operators/recursion.py): under plain `=`
                    # a derived row holding a NULL key (e.g. from a bind
                    # expression) never matches its twin in the
                    # accumulator, is re-derived as "new" every round,
                    # and the component falsely fails to converge.
                    from functools import reduce

                    d, a = fresh.alias("_d"), cur[member].alias("_a")
                    cond = reduce(
                        lambda x, y: x & y,
                        [
                            F.col(f"_d.{k}").eqNullSafe(F.col(f"_a.{k}"))
                            for k in canon_cols
                        ],
                    )
                    fresh = d.join(a, cond, "left_anti")
                fresh = fresh.localCheckpoint(eager=True)
                if fresh.count() == 0:
                    continue
                new_delta[member] = fresh
                cur[member] = (
                    cur[member].unionByName(fresh)
                    if member in cur
                    else fresh
                ).localCheckpoint(eager=True)
            delta = new_delta
            if not delta:
                break
        else:
            raise ValueError(
                f"mutually recursive rules {comp!r} did not converge "
                "in 200 rounds"
            )
        missing = [m for m in comp if m not in cur]
        if missing:
            raise ValueError(
                f"rules {missing!r} derive no rows and every body "
                "references an empty mutual relation — cannot type them"
            )
        for member in comp:
            frames[member] = (canon_heads[member], cur[member])

    return frames


def _compile_invocation(
    frame: DataFrame, head_vars: list[str], terms: tuple
) -> DataFrame:
    """Bind a rule's relation (columns = head var names) to the
    invocation's positional terms: vars rename, constants filter,
    repeated vars assert equality."""
    if len(terms) != len(head_vars):
        raise ValueError(
            f"rule invoked with {len(terms)} terms, head has {len(head_vars)}"
        )
    df = frame
    seen: dict[str, str] = {}
    keep: list[F.Column] = []
    for head_var, term in zip(head_vars, terms):
        col = _var_name(head_var)
        if _is_var(term):
            name = _var_name(term)
            if name in seen:
                df = df.filter(F.col(col) == F.col(seen[name]))
            else:
                seen[name] = col
                keep.append(F.col(col).alias(name))
        else:
            df = df.filter(F.col(col) == F.lit(term))
    return df.select(*keep)


def _attach_pull(resolver, rel: DataFrame, var: str, spec: dict) -> DataFrame:
    """core2/xtdb Datalog ``pull`` (reference README.adoc:15 — the
    EDN-Datalog surface; Datomic-style document projection): for each
    bound entity variable, assemble a nested document — scalar
    attributes plus one sorted ``array<struct>`` per declared
    relationship — as a single struct column.

    Spec::

        {"from": "customer", "id": "c_custkey",
         "attrs": ["c_name", "c_mktsegment"],
         "rels": [{"table": "orders", "fk": "o_custkey",
                   "attrs": ["o_orderkey", "o_totalprice"],
                   "order": "o_orderkey", "as": "orders"}],
         "as": "customer_doc"}

    Scale shape: each rel is ONE groupBy(fk) + collect_list (shuffle
    on the fk, map-side partial lists), then an equi-join back on the
    entity id — never a per-entity subquery.  The order key leads the
    struct so ``sort_array`` yields a deterministic member order;
    entities with no related rows get an empty array."""
    if var not in rel.columns:
        raise ValueError(f"pull variable ?{var} is not bound by :where")
    ent = resolver(spec["from"])
    attrs = spec.get("attrs", [])
    if attrs == "*":  # Datomic [*] wildcard: every non-id column
        attrs = [c for c in ent.columns if c != spec["id"]]
        spec = {**spec, "attrs": attrs}
    # r12 (guide §3.2/§8 — decide with small rows): only entities whose
    # id is BOUND in the pipeline can survive the final left join, yet
    # the pre-r12 shape aggregated EVERY rel row into sorted
    # array<struct> documents before throwing the unmatched ones away —
    # at scale the collect_list shuffle is the pull's whole cost, and a
    # selective :where (both gate pulls filter to one nation, 1/25th)
    # paid it in full.  Semi-filtering the entity table and every rel
    # table by the bound ids pushes the pipeline's selectivity below
    # the heavy aggregation; the semi side is just the distinct id
    # column (broadcast when small, plain hash semi-join otherwise).
    # Equivalence: the final join is an equi left join on the id, so
    # rows whose id is not bound could never match it (NULL ids
    # included — `=` never matches NULL), and entities bound in rel
    # keep their full order set (the fk semi-join drops only rows
    # whose fk is not a bound id).
    bound_ids = rel.select(F.col(var)).distinct()
    doc = ent.select(
        F.col(spec["id"]).alias(var),
        *[F.col(a) for a in attrs],
    ).join(bound_ids, var, "left_semi")
    rel_names = []
    for r_spec in spec.get("rels", []):
        r = resolver(r_spec["table"]).join(
            bound_ids.select(F.col(var).alias("__pull_bound_id__")),
            F.col(r_spec["fk"]) == F.col("__pull_bound_id__"),
            "left_semi",
        )
        r_attrs = r_spec["attrs"]
        if r_attrs == "*":  # wildcard: every non-fk column
            r_attrs = [c for c in r.columns if c != r_spec["fk"]]
        order = r_spec.get("order", r_attrs[0])
        struct_cols = [F.col(order)] + [
            F.col(a) for a in r_attrs if a != order
        ]
        as_name = r_spec.get("as", r_spec["table"])
        nested = r.groupBy(F.col(r_spec["fk"]).alias(var)).agg(
            F.sort_array(F.collect_list(F.struct(*struct_cols))).alias(as_name)
        )
        doc = doc.join(nested, var, "left")
        elem_type = dict(zip(nested.columns, nested.schema))[
            as_name
        ].dataType.simpleString()
        doc = doc.withColumn(
            as_name,
            F.coalesce(F.col(as_name), F.expr(f"CAST(array() AS {elem_type})")),
        )
        rel_names.append(as_name)
    doc_col = F.struct(
        *[F.col(a) for a in spec.get("attrs", [])],
        *[F.col(n) for n in rel_names],
    ).alias(spec.get("as", f"{var}_doc"))
    pulled = doc.select(var, doc_col)
    return rel.join(pulled, var, "left")


def q_with_resolver(
    resolver,
    query: dict,
    args: list | None = None,
    rule_frames: dict[str, tuple[list[str], DataFrame]] | None = None,
) -> DataFrame:
    """Compile and run a Datalog-ish query; ``resolver(table)`` supplies
    each pattern's relation (a catalog scan, or a basis-pinned
    bitemporal view when called through Engine/Snapshot)."""
    rule_frames = dict(rule_frames or {})
    if query.get("rules"):
        rule_frames.update(_eval_rules(resolver, query["rules"], rule_frames))

    scalar_in: dict[str, object] = {}
    collection_parts: list[DataFrame] = []
    in_vars = query.get("in", [])
    if in_vars:
        if args is None or len(args) != len(in_vars):
            raise ValueError(f"query declares {len(in_vars)} :in vars, args mismatch")
        for var, value in zip(in_vars, args):
            if isinstance(value, (list, tuple, set)):
                collection_parts.append(_collection_relation(resolver, var, value))
            else:
                scalar_in[_var_name(var)] = value

    rel: DataFrame | None = None
    predicates: list[tuple] = []
    negations: list[tuple] = []
    binds: list[tuple] = []
    for clause in query["where"]:
        if isinstance(clause[0], str) and clause[0] in _PRED_OPS:
            predicates.append(clause)
            continue
        if clause[0] == "not-exists":
            negations.append(clause[1])
            continue
        if clause[0] == "bind":
            binds.append(clause)
            continue
        if isinstance(clause[0], str) and clause[0] in rule_frames:
            head_vars, frame = rule_frames[clause[0]]
            part = _compile_invocation(frame, head_vars, tuple(clause[1:]))
        else:
            table, bindings = clause
            part = _compile_pattern(resolver(table), bindings)
        if rel is None:
            rel = part
        else:
            shared = sorted(set(rel.columns) & set(part.columns))
            rel = rel.join(part, shared) if shared else rel.crossJoin(part)
    if rel is None:
        raise ValueError("query has no pattern clauses")

    for part in collection_parts:
        shared = sorted(set(rel.columns) & set(part.columns))
        if not shared:
            raise ValueError("collection :in binding shares no variables")
        rel = rel.join(F.broadcast(part), shared)
    for name, value in scalar_in.items():
        if name in rel.columns:
            rel = rel.filter(F.col(name) == F.lit(value))
        else:
            rel = rel.withColumn(name, F.lit(value))

    def compile_expr(term) -> Column:
        if isinstance(term, tuple):
            op, x, y = term
            return _BIND_OPS[op](compile_expr(x), compile_expr(y))
        return F.col(_var_name(term)) if _is_var(term) else F.lit(term)

    for _, var, expr in binds:
        rel = rel.withColumn(_var_name(var), compile_expr(expr))

    for inner in negations:
        name = inner[0]
        if isinstance(name, str) and name in rule_frames:
            # stratified negation over a rule relation: rules are
            # fully evaluated before the body that negates them (the
            # SCC pass rejects negation WITHIN a recursive component)
            head_vars, frame = rule_frames[name]
            if len(inner) == 2 and isinstance(inner[1], dict):
                part = _compile_pattern(frame, inner[1])
            else:
                part = _compile_invocation(frame, head_vars, tuple(inner[1:]))
        else:
            table, bindings = inner
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
    pull_specs = [f for f in find if not _is_var(f) and f[0] == "pull"]
    agg_specs = [f for f in find if not _is_var(f) and f[0] != "pull"]
    if pull_specs:
        if agg_specs:
            raise ValueError("pull and aggregates cannot mix in one :find")
        out = rel.select(*sorted(set(group_vars) | {
            _var_name(p[1]) for p in pull_specs
        }))
        for _tag, var, spec in pull_specs:
            out = _attach_pull(resolver, out, _var_name(var), spec)
        keep = group_vars + [
            spec.get("as", f"{_var_name(var)}_doc")
            for _tag, var, spec in pull_specs
        ]
        return _order_limit(out.select(*keep), query)
    if not agg_specs:
        return _order_limit(rel.select(*group_vars), query)
    aggs = []
    for spec in agg_specs:
        agg_name, var, alias = spec
        aggs.append(_AGGS[agg_name](F.col(_var_name(var))).alias(alias))
    if group_vars:
        return _order_limit(rel.groupBy(*group_vars).agg(*aggs), query)
    return _order_limit(rel.agg(*aggs), query)


def _order_limit(rel: DataFrame, query: dict) -> DataFrame:
    """core2 `:order-by` / `:limit` / `:offset` result modifiers.
    order-by entries are ``"?var"`` or ``("?var", "asc"|"desc")`` and
    may also name aggregate ALIASES from :find.  An ordered+limited
    result compiles to TakeOrderedAndProject (top-k, no global sort);
    limit/offset without order-by is rejected — an unordered limit is
    non-deterministic across partitions, which the reference's
    deterministic query model must not expose."""
    ob = query.get("order-by")
    lim, off = query.get("limit"), query.get("offset")
    if (lim is not None or off is not None) and not ob:
        raise ValueError(
            ":limit/:offset need :order-by — an unordered limit is "
            "non-deterministic"
        )
    if ob:
        cols = []
        for item in ob:
            var, direction = item if isinstance(item, tuple) else (item, "asc")
            name = _var_name(var) if _is_var(var) else var
            if name not in rel.columns:
                raise ValueError(f":order-by references unknown {var!r}")
            if direction not in ("asc", "desc"):
                raise ValueError(f":order-by direction {direction!r}")
            c = F.col(name)
            cols.append(c.desc() if direction == "desc" else c.asc())
        rel = rel.orderBy(*cols)
    if off is not None:
        rel = rel.offset(int(off))
    if lim is not None:
        rel = rel.limit(int(lim))
    return rel


def q(
    spark: SparkSession, sf_dir: str, query: dict, args: list | None = None
) -> DataFrame:
    """Compile and run a Datalog-ish query against the catalog."""
    return q_with_resolver(
        lambda table: load_table(spark, sf_dir, table), query, args=args
    )
