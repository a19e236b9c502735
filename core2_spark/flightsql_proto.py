"""Hand-rolled protobuf wire codec for the Arrow Flight SQL command
envelope (reference README.adoc:14 — "preliminary Arrow Flight SQL
driver support").

Flight SQL rides on generic Flight: every command is a protobuf
message wrapped in a ``google.protobuf.Any`` and carried in the
FlightDescriptor (requests) or Ticket (DoGet).  The sandbox has no
generated FlightSQL protobuf classes and no ADBC client, so this
module implements the three wire primitives the envelope needs —
varints, length-delimited fields, and ``Any`` — straight from the
public protobuf wire spec, plus encode/decode for the handful of
FlightSQL messages the server speaks:

- ``CommandStatementQuery``   (field 1: query string)
- ``TicketStatementQuery``    (field 1: statement_handle bytes)
- ``CommandGetCatalogs``      (no fields)
- ``CommandGetDbSchemas``     (1: catalog, 2: db_schema_filter_pattern)
- ``CommandGetTables``        (1: catalog, 2: schema pattern,
                               3: table pattern, 4*: table_types,
                               5: include_schema bool)
- ``CommandGetTableTypes``    (no fields)

Message/field numbers follow the public FlightSql.proto
(apache/arrow format/FlightSql.proto); only the subset a stock
FlightSQL client needs for connect → list tables → run query is
implemented, which is exactly the "preliminary driver support" tier
the reference claims.
"""

from __future__ import annotations

FLIGHTSQL_NS = "type.googleapis.com/arrow.flight.protocol.sql."


# -- protobuf wire primitives -----------------------------------------


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | (0x80 if n else 0))
        if not n:
            return bytes(out)


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = 0
    val = 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7


def _ld(field: int, payload: bytes) -> bytes:
    """Length-delimited field (wire type 2)."""
    return _varint((field << 3) | 2) + _varint(len(payload)) + payload


def _vi(field: int, value: int) -> bytes:
    """Varint field (wire type 0)."""
    return _varint(field << 3) + _varint(value)


def fields(buf: bytes):
    """Yield (field_number, wire_type, raw_value) triples."""
    i = 0
    while i < len(buf):
        tag, i = _read_varint(buf, i)
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            v, i = _read_varint(buf, i)
        elif wire == 2:
            ln, i = _read_varint(buf, i)
            v = buf[i : i + ln]
            i += ln
        elif wire == 5:
            v = buf[i : i + 4]
            i += 4
        elif wire == 1:
            v = buf[i : i + 8]
            i += 8
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, v


# -- google.protobuf.Any ----------------------------------------------


def pack_any(type_name: str, payload: bytes) -> bytes:
    """Wrap a serialized message as Any (1: type_url, 2: value)."""
    return _ld(1, (FLIGHTSQL_NS + type_name).encode()) + _ld(2, payload)


def unpack_any(buf: bytes) -> tuple[str, bytes] | None:
    """Return (short type name, payload) for a FlightSQL Any, or None
    if the bytes are not an Any carrying a FlightSQL message (the
    server falls back to its raw-SQL legacy envelope then)."""
    type_url, value = None, b""
    try:
        for field, wire, v in fields(buf):
            if field == 1 and wire == 2:
                type_url = v.decode("utf-8", "strict")
            elif field == 2 and wire == 2:
                value = v
    except (ValueError, IndexError, UnicodeDecodeError):
        return None
    if type_url is None or not type_url.startswith(FLIGHTSQL_NS):
        return None
    return type_url[len(FLIGHTSQL_NS) :], value


# -- FlightSQL messages (the served subset) ---------------------------


def command_statement_query(query: str) -> bytes:
    return pack_any("CommandStatementQuery", _ld(1, query.encode()))


def parse_statement_query(payload: bytes) -> str:
    for field, wire, v in fields(payload):
        if field == 1 and wire == 2:
            return v.decode()
    return ""


def ticket_statement_query(handle: bytes) -> bytes:
    return pack_any("TicketStatementQuery", _ld(1, handle))


def parse_statement_ticket(payload: bytes) -> bytes:
    for field, wire, v in fields(payload):
        if field == 1 and wire == 2:
            return v
    return b""


def command_get_catalogs() -> bytes:
    return pack_any("CommandGetCatalogs", b"")


def command_get_db_schemas(catalog: str | None = None) -> bytes:
    payload = _ld(1, catalog.encode()) if catalog else b""
    return pack_any("CommandGetDbSchemas", payload)


def command_get_tables(
    catalog: str | None = None,
    table_name_pattern: str | None = None,
    include_schema: bool = False,
) -> bytes:
    payload = b""
    if catalog:
        payload += _ld(1, catalog.encode())
    if table_name_pattern:
        payload += _ld(3, table_name_pattern.encode())
    if include_schema:
        payload += _vi(5, 1)
    return pack_any("CommandGetTables", payload)


def parse_get_tables(payload: bytes) -> dict:
    out = {"table_name_pattern": None, "include_schema": False}
    for field, wire, v in fields(payload):
        if field == 3 and wire == 2:
            out["table_name_pattern"] = v.decode()
        elif field == 5 and wire == 0:
            out["include_schema"] = bool(v)
    return out


def command_get_table_types() -> bytes:
    return pack_any("CommandGetTableTypes", b"")


# -- prepared statements (round-5: the ActionCreatePreparedStatement /
# -- CommandPreparedStatementQuery tier a stock ADBC client defaults
# -- to, per the public FlightSql.proto field numbers) -----------------


def action_create_prepared_statement_request(query: str) -> bytes:
    """ActionCreatePreparedStatementRequest (field 1: query)."""
    return pack_any(
        "ActionCreatePreparedStatementRequest", _ld(1, query.encode())
    )


def parse_action_create_prepared_statement_request(payload: bytes) -> str:
    for field, wire, v in fields(payload):
        if field == 1 and wire == 2:
            return v.decode()
    return ""


def action_create_prepared_statement_result(
    handle: bytes, dataset_schema: bytes = b"", parameter_schema: bytes = b""
) -> bytes:
    """ActionCreatePreparedStatementResult (1: prepared_statement_handle,
    2: dataset_schema as an IPC-encapsulated Arrow schema message,
    3: parameter_schema — empty here, the served statements are
    parameterless)."""
    payload = _ld(1, handle)
    if dataset_schema:
        payload += _ld(2, dataset_schema)
    if parameter_schema:
        payload += _ld(3, parameter_schema)
    return pack_any("ActionCreatePreparedStatementResult", payload)


def parse_action_create_prepared_statement_result(payload: bytes) -> dict:
    out = {"handle": b"", "dataset_schema": b"", "parameter_schema": b""}
    for field, wire, v in fields(payload):
        if field == 1 and wire == 2:
            out["handle"] = v
        elif field == 2 and wire == 2:
            out["dataset_schema"] = v
        elif field == 3 and wire == 2:
            out["parameter_schema"] = v
    return out


def action_close_prepared_statement_request(handle: bytes) -> bytes:
    """ActionClosePreparedStatementRequest (1: prepared_statement_handle)."""
    return pack_any("ActionClosePreparedStatementRequest", _ld(1, handle))


def parse_prepared_statement_handle(payload: bytes) -> bytes:
    """Field 1 (prepared_statement_handle) of any of the prepared-
    statement messages — Close request, CommandPreparedStatementQuery
    and CommandPreparedStatementUpdate all carry it as field 1."""
    for field, wire, v in fields(payload):
        if field == 1 and wire == 2:
            return v
    return b""


def command_prepared_statement_query(handle: bytes) -> bytes:
    """CommandPreparedStatementQuery (1: prepared_statement_handle)."""
    return pack_any("CommandPreparedStatementQuery", _ld(1, handle))


def command_prepared_statement_update(handle: bytes) -> bytes:
    """CommandPreparedStatementUpdate (1: prepared_statement_handle)."""
    return pack_any("CommandPreparedStatementUpdate", _ld(1, handle))


def do_put_prepared_statement_result(handle: bytes) -> bytes:
    """DoPutPreparedStatementResult (1: prepared_statement_handle) —
    the app-metadata reply to binding parameters into a prepared
    statement; a stateless server returns an UPDATED handle that
    captures the bound values."""
    return _ld(1, handle)


def parse_do_put_prepared_statement_result(buf: bytes) -> bytes:
    for field, wire, v in fields(buf):
        if field == 1 and wire == 2:
            return v
    return b""


def command_statement_update(query: str) -> bytes:
    """FlightSQL DML envelope (DoPut): field 1 = the SQL statement."""
    return pack_any("CommandStatementUpdate", _ld(1, query.encode()))


def parse_statement_update(payload: bytes) -> str:
    for field, wire, v in fields(payload):
        if field == 1 and wire == 2:
            return v.decode()
    return ""


def do_put_update_result(record_count: int) -> bytes:
    """DoPutUpdateResult (field 1: record_count int64, varint; -1 =
    unknown, encoded two's-complement like protobuf int64)."""
    return _vi(1, record_count & 0xFFFFFFFFFFFFFFFF)


def parse_do_put_update_result(buf: bytes) -> int:
    for field, wire, v in fields(buf):
        if field == 1 and wire == 0:
            return v - (1 << 64) if v >= (1 << 63) else v
    return 0
