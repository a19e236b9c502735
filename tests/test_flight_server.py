"""SQL-over-Arrow-Flight boundary: engine ingest → Flight client
round-trip, temporal dialect included."""

from __future__ import annotations

import shutil

import pytest

from core2_spark.engine import Engine, Put

ROOT = "/root/repo/_data/flight_test"


@pytest.fixture
def engine(spark):
    shutil.rmtree(ROOT, ignore_errors=True)
    return Engine(spark, ROOT)


def test_flight_sql_roundtrip(spark, engine):
    from core2_spark.flight_server import SqlFlightServer, fetch_sql

    v1 = spark.createDataFrame(
        [(1, "AAPL", 100.0), (2, "MSFT", 200.0)], "id long, sym string, px double"
    )
    engine.submit_tx([Put("trades", v1)], tx_time="2024-01-01 00:00:01")
    fix = spark.createDataFrame([(1, "AAPL", 111.0)], "id long, sym string, px double")
    engine.submit_tx([Put("trades", fix)], tx_time="2024-02-01 00:00:00")

    server = SqlFlightServer(lambda sql: engine.db().sql(sql))
    try:
        loc = f"grpc://127.0.0.1:{server.port}"
        cur = fetch_sql(loc, "SELECT id, sym, px FROM trades ORDER BY id")
        assert cur.to_pydict()["px"] == [111.0, 200.0]

        # the temporal dialect crosses the wire too
        jan = fetch_sql(
            loc,
            "SELECT id, px FROM trades FOR SYSTEM_TIME AS OF "
            "TIMESTAMP '2024-01-15 00:00:00' ORDER BY id",
        )
        assert jan.to_pydict()["px"] == [100.0, 200.0]
    finally:
        server.shutdown()


def test_flight_result_size_guard(spark, engine):
    from core2_spark.flight_server import SqlFlightServer, fetch_sql

    rows = spark.range(0, 50).selectExpr("id", "CAST(id AS STRING) AS sym")
    engine.submit_tx([Put("trades", rows)], tx_time="2024-01-01 00:00:01")

    server = SqlFlightServer(lambda sql: engine.db().sql(sql), max_result_rows=10)
    try:
        loc = f"grpc://127.0.0.1:{server.port}"
        with pytest.raises(Exception, match="max_result_rows"):
            fetch_sql(loc, "SELECT * FROM trades")
        # reduced results pass
        ok = fetch_sql(loc, "SELECT COUNT(*) AS n FROM trades")
        assert ok.to_pydict()["n"] == [50]
    finally:
        server.shutdown()


def test_flight_do_put_ingests_as_transaction(spark, engine):
    import pyarrow as pa

    from core2_spark.flight_server import SqlFlightServer, fetch_sql, put_table

    server = SqlFlightServer(lambda sql: engine.db().sql(sql), engine=engine)
    try:
        loc = f"grpc://127.0.0.1:{server.port}"
        t1 = pa.table({"id": [1, 2], "sym": ["AAPL", "MSFT"], "px": [100.0, 200.0]})
        put_table(loc, "trades", t1, tx_time="2024-01-01 00:00:01")
        t2 = pa.table({"id": [1], "sym": ["AAPL"], "px": [111.0]})
        put_table(loc, "trades", t2, tx_time="2024-02-01 00:00:00")

        cur = fetch_sql(loc, "SELECT id, px FROM trades ORDER BY id")
        assert cur.to_pydict()["px"] == [111.0, 200.0]
        # and the upload is a real transaction: time-travel works
        jan = fetch_sql(
            loc,
            "SELECT px FROM trades FOR SYSTEM_TIME AS OF "
            "TIMESTAMP '2024-01-15 00:00:00' ORDER BY id",
        )
        assert jan.to_pydict()["px"] == [100.0, 200.0]
    finally:
        server.shutdown()


def test_flight_do_put_readonly_server_refuses(spark, engine):
    import pyarrow as pa

    from core2_spark.flight_server import SqlFlightServer, put_table

    server = SqlFlightServer(lambda sql: engine.db().sql(sql))  # no engine
    try:
        loc = f"grpc://127.0.0.1:{server.port}"
        with pytest.raises(Exception, match="read-only"):
            put_table(loc, "trades", pa.table({"id": [1]}))
    finally:
        server.shutdown()
