"""ASSERT transaction statements (engine.Assert, sql_dml): a SQL
boolean predicate over the pre-tx snapshot; false or NULL aborts the
whole transaction with zero rows written — the reference's assert tx
op, the canonical uniqueness/invariant guard."""

from __future__ import annotations

import pytest

from core2_spark.engine import Assert, Engine, Put, TxAssertionError


@pytest.fixture()
def eng(spark, tmp_path):
    e = Engine(spark, str(tmp_path / "db"))
    e.sql_dml(
        "INSERT INTO users (id, email) VALUES (1, 'ada@x'), (2, 'bob@x')",
        tx_time="2024-01-01 00:00:01",
    )
    return e


def emails(e):
    return {r["email"] for r in e.db().table("users").collect()}


def test_assert_true_tx_commits(eng):
    eng.sql_dml_many(
        [
            "ASSERT NOT EXISTS (SELECT 1 FROM users WHERE email = 'eve@x')",
            "INSERT INTO users (id, email) VALUES (3, 'eve@x')",
        ],
        tx_time="2024-01-01 00:00:02",
    )
    assert emails(eng) == {"ada@x", "bob@x", "eve@x"}


def test_assert_false_aborts_whole_tx(eng):
    with pytest.raises(TxAssertionError, match="duplicate email"):
        eng.sql_dml_many(
            [
                "INSERT INTO users (id, email) VALUES (3, 'new@x')",
                "ASSERT NOT EXISTS (SELECT 1 FROM users "
                "WHERE email = 'ada@x'), 'duplicate email'",
            ],
            tx_time="2024-01-01 00:00:02",
        )
    # atomic: the INSERT in the same tx left nothing behind
    assert emails(eng) == {"ada@x", "bob@x"}


def test_assert_null_counts_as_false(eng):
    with pytest.raises(TxAssertionError):
        eng.sql_dml("ASSERT CAST(NULL AS BOOLEAN)")


def test_assert_sees_pre_tx_snapshot(eng):
    """Like every op, ASSERT evaluates against the PRE-transaction
    state — an insert earlier in the same tx is not visible to it."""
    eng.sql_dml_many(
        [
            "INSERT INTO users (id, email) VALUES (3, 'eve@x')",
            "ASSERT NOT EXISTS (SELECT 1 FROM users WHERE email = 'eve@x')",
        ],
        tx_time="2024-01-01 00:00:02",
    )
    assert "eve@x" in emails(eng)


def test_assert_scalar_comparison_form(eng):
    eng.sql_dml("ASSERT (SELECT COUNT(*) FROM users) = 2")
    with pytest.raises(TxAssertionError):
        eng.sql_dml("ASSERT (SELECT COUNT(*) FROM users) = 99")


def test_assert_message_with_top_level_comma_in_predicate(eng):
    with pytest.raises(TxAssertionError, match="bad coalesce"):
        eng.sql_dml("ASSERT COALESCE(FALSE, FALSE), 'bad coalesce'")


def test_assert_programmatic_op(spark, eng):
    with pytest.raises(TxAssertionError, match="cap"):
        eng.submit_tx(
            [
                Put(
                    "users",
                    spark.createDataFrame([(9, "zoe@x")], "id int, email string"),
                ),
                Assert("(SELECT COUNT(*) FROM users) < 2", "cap"),
            ]
        )
    assert emails(eng) == {"ada@x", "bob@x"}


def test_assert_rejects_malformed(eng):
    with pytest.raises(ValueError, match="optional trailing"):
        eng.sql_dml("ASSERT TRUE, 'a', 'b'")


def test_assert_over_pgwire(spark, eng):
    from core2_spark.pgwire_server import PgWireServer
    from tests.test_pgwire_server import MiniPgClient

    server = PgWireServer(lambda sql: eng.db().sql(sql), engine=eng)
    try:
        client = MiniPgClient(server.port)
        _, rows, err = client.query("ASSERT (SELECT COUNT(*) FROM users) = 2")
        assert err is None and rows == []
        _, _, err = client.query(
            "ASSERT (SELECT COUNT(*) FROM users) = 99, 'wrong count'"
        )
        assert err is not None and "wrong count" in err
        client.close()
    finally:
        server.shutdown()
