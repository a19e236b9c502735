"""SQL:2011 temporal dialect pre-pass (SURVEY.md §3.1 dialect deltas).

core2's SQL accepts `FOR SYSTEM_TIME AS OF ...` / `FOR
APPLICATION_TIME AS OF ...` table clauses; Spark SQL does not.  This
module rewrites those clauses into ordinary filtered subqueries over
the bitemporal version columns BEFORE handing the query to
``spark.sql`` — a string-level pre-pass, exactly the "tiny rewrite,
not a SQL engine" approach the survey prescribes (Catalyst does the
rest).

Supported clause forms (per table reference, any order, at most one
per axis)::

    t FOR SYSTEM_TIME AS OF TIMESTAMP '2024-01-02 03:04:05'
    t FOR SYSTEM_TIME FROM TIMESTAMP '...' TO TIMESTAMP '...'
    t FOR SYSTEM_TIME ALL
    t FOR APPLICATION_TIME AS OF TIMESTAMP '...'   (also FROM..TO / ALL)

The rewrite targets *version tables* (those carrying the four
temporal columns).  `FOR ... ALL` disables the axis filter.  A bare
table reference with no FOR clause defaults to "latest at now" only
when the caller supplies ``default_system_time`` — there is no silent
wall-clock read (determinism rule)."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from core2_spark import temporal as bt

_AXIS_COLS = {
    "SYSTEM_TIME": (bt.SYS_START, bt.SYS_END),
    "APPLICATION_TIME": (bt.APP_START, bt.APP_END),
}

_FOR_RE = re.compile(
    r"(?P<table>\b\w+\b)"
    r"(?P<clauses>(?:\s+FOR\s+(?:SYSTEM_TIME|APPLICATION_TIME)\s+"
    r"(?:AS\s+OF\s+TIMESTAMP\s+'[^']+'|"
    r"FROM\s+TIMESTAMP\s+'[^']+'\s+TO\s+TIMESTAMP\s+'[^']+'|ALL))+)"
    r"(?:\s+(?:AS\s+)?(?P<alias>\w+))?",
    re.IGNORECASE,
)

# words that can follow a table reference and must not be mistaken for
# an alias
_KEYWORDS = {
    "join", "inner", "left", "right", "full", "cross", "on", "where",
    "group", "order", "having", "limit", "union", "intersect", "except",
    "natural", "using", "qualify", "window", "for", "asof",
}

_CLAUSE_RE = re.compile(
    r"FOR\s+(?P<axis>SYSTEM_TIME|APPLICATION_TIME)\s+"
    r"(?:AS\s+OF\s+TIMESTAMP\s+'(?P<asof>[^']+)'|"
    r"FROM\s+TIMESTAMP\s+'(?P<lo>[^']+)'\s+TO\s+TIMESTAMP\s+'(?P<hi>[^']+)'|"
    r"(?P<all>ALL))",
    re.IGNORECASE,
)


def _axis_predicate(axis: str, m: re.Match) -> str | None:
    start_col, end_col = _AXIS_COLS[axis]
    if m.group("all"):
        return None
    if m.group("asof"):
        t = m.group("asof")
        return (
            f"{start_col} <= TIMESTAMP '{t}' AND TIMESTAMP '{t}' < {end_col}"
        )
    lo, hi = m.group("lo"), m.group("hi")
    return f"{start_col} < TIMESTAMP '{hi}' AND {end_col} > TIMESTAMP '{lo}'"


def rewrite_temporal_sql(sql: str, table_map: dict[str, str] | None = None) -> str:
    """Rewrite every `table FOR <axis> ...` reference into a filtered
    subquery aliased to the table name.

    ``table_map`` redirects the rewritten subquery's FROM source (e.g.
    ``{"trades": "trades__sys_history"}``): the engine registers the
    current-state view under the bare name (temporal columns dropped)
    and the full version history under an internal view name, so a
    FOR-clause reference must read the history view while bare
    references in the same query keep reading current state."""
    table_map = table_map or {}

    def replace(match: re.Match) -> str:
        table = match.group("table")
        alias = match.group("alias")
        trailing = ""
        if alias and alias.lower() in _KEYWORDS:
            trailing = " " + alias  # not an alias — restore the keyword
            alias = None
        name = alias or table
        source = table_map.get(table, table)
        preds = []
        for cm in _CLAUSE_RE.finditer(match.group("clauses")):
            axis = cm.group("axis").upper()
            p = _axis_predicate(axis, cm)
            if p:
                preds.append(p)
        if not preds:
            return f"(SELECT * FROM {source}) AS {name}{trailing}"
        where = " AND ".join(preds)
        return f"(SELECT * FROM {source} WHERE {where}) AS {name}{trailing}"

    return _FOR_RE.sub(replace, sql)


def sql_with_temporal(
    spark: SparkSession,
    sql: str,
    version_views: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Run SQL with the temporal dialect enabled.  ``version_views``
    registers version tables (with the four temporal columns and
    system_time_end already derived) as temp views first."""
    if version_views:
        for name, df in version_views.items():
            df.createOrReplaceTempView(name)
    return spark.sql(rewrite_temporal_sql(sql))
