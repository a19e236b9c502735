"""SQL:2011 period predicates (SURVEY.md §2.8).

core2 compiles these in its expression JIT [upstream: core2
`expression/temporal.clj`]; Spark has no built-ins, but each predicate
is pure column algebra over (start, end) pairs — fully codegen'd by
Catalyst, no UDFs.  Periods are half-open [start, end), matching the
reference's bitemporal convention.
"""

from __future__ import annotations

from pyspark.sql import Column


def overlaps(a_start: Column, a_end: Column, b_start: Column, b_end: Column) -> Column:
    """a OVERLAPS b — the periods share at least one instant."""
    return (a_start < b_end) & (b_start < a_end)


def contains_period(
    a_start: Column, a_end: Column, b_start: Column, b_end: Column
) -> Column:
    """a CONTAINS b — b lies entirely within a."""
    return (a_start <= b_start) & (b_end <= a_end)


def contains_instant(a_start: Column, a_end: Column, t: Column) -> Column:
    """a CONTAINS t for an instant t (half-open)."""
    return (a_start <= t) & (t < a_end)


def equals(a_start: Column, a_end: Column, b_start: Column, b_end: Column) -> Column:
    """a EQUALS b — identical periods."""
    return (a_start == b_start) & (a_end == b_end)


def precedes(a_start: Column, a_end: Column, b_start: Column, b_end: Column) -> Column:
    """a PRECEDES b — a ends at or before b starts."""
    return a_end <= b_start


def succeeds(a_start: Column, a_end: Column, b_start: Column, b_end: Column) -> Column:
    """a SUCCEEDS b — a starts at or after b ends."""
    return a_start >= b_end


def immediately_precedes(
    a_start: Column, a_end: Column, b_start: Column, b_end: Column
) -> Column:
    """a IMMEDIATELY PRECEDES b — a ends exactly where b starts."""
    return a_end == b_start


def immediately_succeeds(
    a_start: Column, a_end: Column, b_start: Column, b_end: Column
) -> Column:
    """a IMMEDIATELY SUCCEEDS b — a starts exactly where b ends."""
    return a_start == b_end
