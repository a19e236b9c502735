"""Shared helpers for oracle-parity queries.

Floating-point discipline: distributed summation order differs between
Spark and DuckDB, so double SUM/AVG can differ in the last ulp — and a
result that lands a hair from a rounding boundary then hashes
differently.  The fix is exactness, not tolerance:

1. money-ish fixture columns carry ≤ 6 true decimals, so each addend
   is cast to DECIMAL(38,6) (recovering the exact intended value — a
   double can never sit exactly on the half at the cast's rounding
   cut, so the cast is engine-agnostic), summed exactly in decimal,
   and cast back to double → bit-identical doubles in both engines;
2. the exact rational result can still sit exactly ON a rounding
   boundary (e.g. a 2-decimal sum divided by 8), and the two engines'
   ROUND implementations break such ties differently even on identical
   doubles — so a +1e-9 nudge is added before ROUND, far larger than
   any representation error and far smaller than the value spacing,
   pushing every boundary case to the same side in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,6)"
# Tie-breaking nudge applied before ROUND; see module docstring.
EPS = 1e-9
SQL_EPS = "0.000000001"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def sql_quote(s: str) -> str:
    """Quote a string as an ANSI-SQL literal for generated oracle SQL.

    Every oracle *builder* that interpolates user-supplied strings
    (BM25 terms, retention/attribution event types) must route them
    through here — an embedded single quote would otherwise produce
    broken oracle SQL."""
    return "'" + s.replace("'", "''") + "'"


def fround(col: Column | str, scale: int = 4) -> Column:
    """Plain round — for raw low-decimal or irrational values that can
    never sit exactly on a rounding boundary."""
    return F.round(_c(col), scale)


def pround(col: Column | str, scale: int = 4) -> Column:
    """Round a finite-decimal *computed* value (product/ratio) whose
    exact rational form CAN sit on the boundary — nudged first."""
    return F.round(_c(col) + EPS, scale)


def sql_pround(expr: str, scale: int = 4) -> str:
    return f"ROUND(({expr}) + {SQL_EPS}, {scale})"


def dsum(col: Column | str, scale: int = 4) -> Column:
    """Exact decimal sum of a ≤6-decimal double column → double."""
    return F.round(F.sum(_c(col).cast(DEC)).cast("double") + EPS, scale)


def davg(col: Column | str, scale: int = 6) -> Column:
    """Exact-sum average: decimal SUM / COUNT, both engines identical."""
    c = _c(col)
    return F.round(F.sum(c.cast(DEC)).cast("double") / F.count(c) + EPS, scale)


def sql_dsum(expr: str, scale: int = 4) -> str:
    return (
        f"ROUND(CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE)"
        f" + {SQL_EPS}, {scale})"
    )


def sql_davg(expr: str, scale: int = 6) -> str:
    return (
        f"ROUND(CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE)"
        f" / COUNT({expr}) + {SQL_EPS}, {scale})"
    )
