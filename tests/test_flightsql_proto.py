"""Pure-Python wire-codec properties for the hand-rolled FlightSQL
protobuf subset — no Spark session needed."""

from __future__ import annotations

from hypothesis import given
from hypothesis import strategies as st

from core2_spark import flightsql_proto as fsql


@given(st.integers(min_value=0, max_value=2**64 - 1))
def test_varint_roundtrip(n):
    buf = fsql._varint(n)
    got, i = fsql._read_varint(buf, 0)
    assert got == n and i == len(buf)


@given(st.text(max_size=200))
def test_statement_query_roundtrip(sql):
    any_bytes = fsql.command_statement_query(sql)
    name, payload = fsql.unpack_any(any_bytes)
    assert name == "CommandStatementQuery"
    assert fsql.parse_statement_query(payload) == sql


@given(st.binary(max_size=200))
def test_statement_ticket_roundtrip(handle):
    name, payload = fsql.unpack_any(fsql.ticket_statement_query(handle))
    assert name == "TicketStatementQuery"
    assert fsql.parse_statement_ticket(payload) == handle


@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_do_put_update_result_roundtrip(count):
    assert fsql.parse_do_put_update_result(fsql.do_put_update_result(count)) == count


@given(st.binary(max_size=64))
def test_unpack_any_never_raises_on_garbage(blob):
    # arbitrary bytes either parse as a FlightSQL Any or return None —
    # the server's legacy-envelope fallback depends on no exception
    assert fsql.unpack_any(blob) is None or isinstance(
        fsql.unpack_any(blob), tuple
    )


def test_get_tables_pattern_fields():
    any_bytes = fsql.command_get_tables(
        catalog="core2", table_name_pattern="tr%", include_schema=True
    )
    name, payload = fsql.unpack_any(any_bytes)
    assert name == "CommandGetTables"
    spec = fsql.parse_get_tables(payload)
    assert spec == {"table_name_pattern": "tr%", "include_schema": True}
