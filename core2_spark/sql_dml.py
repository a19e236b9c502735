"""SQL DML → transaction ops (SURVEY.md §2.1 DML sinks, §3.3).

core2 executes SQL DML deterministically at index time: INSERT appends
version rows, UPDATE closes the old version's application period and
appends the new one, DELETE closes it, ERASE physically removes
[upstream: core2 `sql/plan.clj` DML section, `core2/indexer.clj`].

This frontend keeps the same split the engine already has: statements
are parsed here (a small regex skeleton over the research dialect —
the statement *shapes*, not a full SQL grammar), while every value,
predicate, and SET expression is delegated verbatim to Spark SQL
against the pre-transaction snapshot.  The result is a list of
`engine.Put/Delete/Erase` ops executed through `Engine.submit_tx`, so
SQL DML and programmatic ops share one log, one clock, and one
visibility rule.

Supported statements::

    INSERT INTO t (c1, c2, ...) VALUES (...), (...)
    INSERT INTO t SELECT ...                      -- over snapshot views
    UPDATE t [FOR PORTION OF APPLICATION_TIME FROM 'a' TO 'b']
        SET c = expr, ... [WHERE pred]
    DELETE FROM t [FOR PORTION OF APPLICATION_TIME FROM 'a' TO 'b']
        [WHERE pred]
    ERASE FROM t [WHERE pred]

UPDATE appends new versions of the matched current rows (the old
versions stay visible to historical queries — core2's semantics);
DELETE appends tombstones; ERASE rewrites the table without the ids
(the only destructive op, as upstream).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_INSERT_VALUES = re.compile(
    r"^\s*INSERT\s+INTO\s+(?P<table>\w+)\s*\((?P<cols>[^)]*)\)\s*"
    r"VALUES\s*(?P<values>.+)$",
    re.IGNORECASE | re.DOTALL,
)
_INSERT_SELECT = re.compile(
    r"^\s*INSERT\s+INTO\s+(?P<table>\w+)\s+(?P<select>SELECT\b.+)$",
    re.IGNORECASE | re.DOTALL,
)
_UPDATE = re.compile(
    r"^\s*UPDATE\s+(?P<table>\w+)"
    r"(?:\s+FOR\s+PORTION\s+OF\s+APPLICATION_TIME\s+FROM\s+"
    r"'(?P<app_from>[^']+)'\s+TO\s+'(?P<app_to>[^']+)')?"
    r"\s+SET\s+(?P<sets>.+?)(?:\s+WHERE\s+(?P<where>.+))?$",
    re.IGNORECASE | re.DOTALL,
)
_DELETE = re.compile(
    r"^\s*(?P<verb>DELETE|ERASE)\s+FROM\s+(?P<table>\w+)"
    r"(?:\s+FOR\s+PORTION\s+OF\s+APPLICATION_TIME\s+FROM\s+"
    r"'(?P<app_from>[^']+)'\s+TO\s+'(?P<app_to>[^']+)')?"
    r"(?:\s+WHERE\s+(?P<where>.+))?$",
    re.IGNORECASE | re.DOTALL,
)


def _split_set_clauses(sets: str) -> list[tuple[str, str]]:
    """Split `a = expr, b = expr` on top-level commas (not inside
    parentheses or quotes)."""
    parts, depth, in_str, cur = [], 0, False, []
    for ch in sets:
        if ch == "'":
            in_str = not in_str
        elif not in_str:
            if ch in "([":
                depth += 1
            elif ch in ")]":
                depth -= 1
            elif ch == "," and depth == 0:
                parts.append("".join(cur))
                cur = []
                continue
        cur.append(ch)
    parts.append("".join(cur))
    out = []
    for p in parts:
        col, expr = p.split("=", 1)
        out.append((col.strip(), expr.strip()))
    return out


@dataclass(frozen=True)
class _ParsedDml:
    verb: str
    table: str
    detail: dict


def parse_dml(statement: str) -> _ParsedDml:
    m = _INSERT_VALUES.match(statement)
    if m:
        return _ParsedDml(
            "insert_values",
            m["table"],
            {"cols": [c.strip() for c in m["cols"].split(",")], "values": m["values"]},
        )
    m = _INSERT_SELECT.match(statement)
    if m:
        return _ParsedDml("insert_select", m["table"], {"select": m["select"]})
    m = _UPDATE.match(statement)
    if m:
        return _ParsedDml(
            "update",
            m["table"],
            {
                "sets": _split_set_clauses(m["sets"]),
                "where": m["where"],
                "app_from": m["app_from"],
                "app_to": m["app_to"],
            },
        )
    m = _DELETE.match(statement)
    if m:
        if m["verb"].upper() == "ERASE" and m["app_from"]:
            raise ValueError(
                "ERASE removes whole ids (the only destructive op); "
                "FOR PORTION OF applies to DELETE only"
            )
        return _ParsedDml(
            m["verb"].lower(),
            m["table"],
            {
                "where": m["where"],
                "app_from": m["app_from"],
                "app_to": m["app_to"],
            },
        )
    raise ValueError(f"unsupported DML statement: {statement[:120]}")


def dml_to_ops(engine, statement: str, id_col: str = "id") -> list:
    """Compile one DML statement to engine ops against the CURRENT
    pre-transaction snapshot (core2: DML runs deterministically at
    index time against the database value as of the tx)."""
    from core2_spark.engine import Delete, Erase, Put

    spark = engine.spark
    p = parse_dml(statement)
    snap = engine.db()

    if p.verb == "insert_values":
        cols = ", ".join(p.detail["cols"])
        rows = spark.sql(
            f"SELECT * FROM (VALUES {p.detail['values']}) AS _ins({cols})"
        )
        # align literal types with the existing table schema: a bare
        # `4` is INT and `4.0` DECIMAL(2,1), which would fork the
        # parquet schema of a BIGINT/DOUBLE version table (merge error
        # on the next read) — cast by column name like UPDATE does
        if p.table in snap.basis.manifests:
            types = {
                f.name: f.dataType.simpleString()
                for f in snap.table(p.table).schema.fields
            }
            rows = rows.select(
                *[
                    rows[c].cast(types[c]).alias(c) if c in types else rows[c]
                    for c in rows.columns
                ]
            )
        return [Put(p.table, rows)]

    if p.verb == "insert_select":
        # materialize before the write: the SELECT may read the very
        # table the Put appends to
        return [Put(p.table, snap.sql(p.detail["select"]).localCheckpoint(eager=True))]

    cur = snap.table(p.table)
    cur.createOrReplaceTempView("_dml_target")
    where = p.detail.get("where")
    matched = spark.sql(
        f"SELECT * FROM _dml_target" + (f" WHERE {where}" if where else "")
    )

    if p.verb == "update":
        projections = []
        set_map = dict(p.detail["sets"])
        types = {f.name: f.dataType.simpleString() for f in matched.schema.fields}
        for name in matched.columns:
            if name in set_map:
                # cast to the column's existing type: a bare literal
                # (0.0 → DECIMAL(1,1)) would otherwise fork the
                # parquet schema of the version table
                projections.append(
                    f"CAST(({set_map[name]}) AS {types[name]}) AS {name}"
                )
            else:
                projections.append(name)
        matched.createOrReplaceTempView("_dml_matched")
        updated = spark.sql(
            f"SELECT {', '.join(projections)} FROM _dml_matched"
        ).localCheckpoint(eager=True)  # reads the table the Put appends to
        return [
            Put(
                p.table,
                updated,
                app_start=p.detail["app_from"],
                app_end=p.detail["app_to"],
            )
        ]

    ids = matched.select(id_col).localCheckpoint(eager=True)
    if p.verb == "delete":
        return [
            Delete(
                p.table,
                ids,
                id_col,
                app_start=p.detail.get("app_from"),
                app_end=p.detail.get("app_to"),
            )
        ]
    return [Erase(p.table, ids, id_col)]
