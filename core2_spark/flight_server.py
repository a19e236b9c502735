"""Arrow Flight result server (reference README.adoc:14 — "preliminary
Arrow Flight SQL driver support"; SURVEY.md §3 client boundary).

A minimal SQL-over-Arrow-Flight surface: clients submit a SQL string
(the temporal dialect included, since execution goes through
``Snapshot.sql``) as the flight descriptor/ticket and stream the result
back as Arrow record batches — the same transport Flight SQL rides on.
This is deliberately the *preliminary* tier the reference claims: the
full FlightSQL protobuf command vocabulary (prepared statements,
catalog introspection messages) is not implemented; `do_get` with a
SQL ticket covers the run-query-fetch-result loop BI tools script
against first.

Scale posture: Flight is a RESULT boundary, not a data-movement path —
queries should reduce (aggregates, top-k) before crossing it.  The
``max_result_rows`` guard refuses to materialize oversized results on
the driver, same discipline as ``sources.read_arrow_ipc``.
"""

from __future__ import annotations

from collections.abc import Callable

import pyarrow as pa
from pyspark.sql import DataFrame

try:  # grpc support is optional in pyarrow builds
    import pyarrow.flight as _flight
except ImportError:  # pragma: no cover
    _flight = None


def df_to_arrow(df: DataFrame, max_result_rows: int | None = None) -> pa.Table:
    """Spark DataFrame → Arrow table (Spark 4's native toArrow), with a
    driver-materialization guard."""
    if max_result_rows is not None:
        n = df.limit(max_result_rows + 1).count()
        if n > max_result_rows:
            raise ValueError(
                f"result exceeds max_result_rows={max_result_rows}; Flight is "
                "a result boundary — aggregate or LIMIT before fetching, or "
                "raise the cap deliberately"
            )
    return df.toArrow()


class SqlFlightServer(_flight.FlightServerBase if _flight else object):
    """Serve ``executor(sql) -> DataFrame`` results over Arrow Flight;
    optionally accept Arrow uploads as engine transactions via do_put.

    ``executor`` is typically ``Snapshot.sql`` (basis-pinned, temporal
    dialect enabled) or a closure over ``Engine.db()``; ``engine``
    (optional) enables the write side — each do_put stream commits as
    one ``submit_tx`` Put.
    """

    def __init__(
        self,
        executor: Callable[[str], DataFrame],
        location: str = "grpc://127.0.0.1:0",
        max_result_rows: int = 1_000_000,
        engine=None,
    ):
        if _flight is None:  # pragma: no cover
            raise RuntimeError("pyarrow was built without flight support")
        super().__init__(location)
        self._executor = executor
        self._max_result_rows = max_result_rows
        self._engine = engine

    def _run(self, sql: str) -> pa.Table:
        return df_to_arrow(self._executor(sql), self._max_result_rows)

    # -- Flight protocol ----------------------------------------------
    def get_flight_info(self, context, descriptor):
        sql = descriptor.command.decode()
        table = self._run(sql)
        return _flight.FlightInfo(
            table.schema,
            descriptor,
            [_flight.FlightEndpoint(_flight.Ticket(sql.encode()), [])],
            table.num_rows,
            table.nbytes,
        )

    def do_get(self, context, ticket):
        return _flight.RecordBatchStream(self._run(ticket.ticket.decode()))

    def do_put(self, context, descriptor, reader, writer):
        """Ingest an Arrow stream as ONE engine transaction.  The
        descriptor command is JSON ``{"table": ..., "tx_time": ...?}``;
        the whole upload commits atomically (one tx_time), matching
        submit_tx semantics over the wire."""
        import json

        if self._engine is None:
            raise _flight.FlightServerError(
                "this server is read-only (no engine attached)"
            )
        from core2_spark.engine import Put

        spec = json.loads(descriptor.command.decode())
        table = reader.read_all()
        rows = self._engine.spark.createDataFrame(table.to_pandas())
        self._engine.submit_tx(
            [Put(spec["table"], rows)], tx_time=spec.get("tx_time")
        )


def fetch_sql(location: str, sql: str) -> pa.Table:
    """Client helper: run SQL against a SqlFlightServer and return the
    Arrow result (what a Flight-speaking BI tool does under the hood)."""
    client = _flight.connect(location)
    try:
        info = client.get_flight_info(
            _flight.FlightDescriptor.for_command(sql.encode())
        )
        return client.do_get(info.endpoints[0].ticket).read_all()
    finally:
        client.close()


def put_table(
    location: str, table_name: str, table: pa.Table, tx_time: str | None = None
) -> None:
    """Client helper: upload an Arrow table as one engine transaction."""
    import json

    client = _flight.connect(location)
    try:
        desc = _flight.FlightDescriptor.for_command(
            json.dumps({"table": table_name, "tx_time": tx_time}).encode()
        )
        writer, _ = client.do_put(desc, table.schema)
        writer.write_table(table)
        writer.close()
    finally:
        client.close()
