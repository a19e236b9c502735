"""SQL DML frontend (sql_dml.py): INSERT/UPDATE/DELETE/ERASE
statements must behave exactly like their programmatic submit_tx
twins — same log, same clock, same bitemporal visibility."""

from __future__ import annotations

import pytest

from core2_spark.engine import Engine


@pytest.fixture()
def eng(spark, tmp_path):
    e = Engine(spark, str(tmp_path / "db"))
    e.sql_dml(
        "INSERT INTO accounts (id, owner, balance) VALUES "
        "(1, 'ada', CAST(100.0 AS DOUBLE)), (2, 'bob', CAST(50.0 AS DOUBLE)), "
        "(3, 'eve', CAST(75.0 AS DOUBLE))"
    )
    return e


def rows(df):
    return {
        (r["id"], r["owner"], r["balance"])
        for r in df.select("id", "owner", "balance").collect()
    }


def test_insert_values_visible(eng):
    assert rows(eng.db().table("accounts")) == {
        (1, "ada", 100.0),
        (2, "bob", 50.0),
        (3, "eve", 75.0),
    }


def test_update_appends_new_version_keeps_history(eng):
    pre = eng.db()
    eng.sql_dml("UPDATE accounts SET balance = balance * 2 WHERE owner = 'bob'")
    post = eng.db()
    assert rows(post.table("accounts")) == {
        (1, "ada", 100.0),
        (2, "bob", 100.0),
        (3, "eve", 75.0),
    }
    # pre-DML snapshot still answers with the old value (repeatable basis)
    assert (2, "bob", 50.0) in rows(pre.table("accounts"))
    # history carries both versions of id=2
    assert post.history("accounts").filter("id = 2").count() == 2


def test_update_expression_uses_snapshot_state(eng):
    # SET references other columns; WHERE matches several rows
    eng.sql_dml("UPDATE accounts SET balance = balance + 10 WHERE balance >= 75.0")
    assert rows(eng.db().table("accounts")) == {
        (1, "ada", 110.0),
        (2, "bob", 50.0),
        (3, "eve", 85.0),
    }


def test_delete_tombstones_current_but_not_history(eng):
    eng.sql_dml("DELETE FROM accounts WHERE owner = 'eve'")
    post = eng.db()
    assert rows(post.table("accounts")) == {(1, "ada", 100.0), (2, "bob", 50.0)}
    # the deleted id's versions remain in history (soft delete)
    assert post.history("accounts").filter("id = 3").count() >= 1


def test_erase_physically_removes(eng):
    eng.sql_dml("ERASE FROM accounts WHERE id = 1")
    post = eng.db()
    assert rows(post.table("accounts")) == {(2, "bob", 50.0), (3, "eve", 75.0)}
    assert post.history("accounts").filter("id = 1").count() == 0


def test_insert_select_derives_from_snapshot(eng):
    eng.sql_dml(
        "INSERT INTO accounts "
        "SELECT id + 100 AS id, owner, balance * 0.5 AS balance FROM accounts"
    )
    got = rows(eng.db().table("accounts"))
    assert (101, "ada", 50.0) in got and (103, "eve", 37.5) in got
    assert len(got) == 6


def test_update_for_portion_of_application_time(eng):
    eng.sql_dml(
        "UPDATE accounts FOR PORTION OF APPLICATION_TIME "
        "FROM '2024-06-01' TO '2024-07-01' "
        "SET balance = 0.0 WHERE id = 1"
    )
    db = eng.db()
    # inside the portion the new version wins ...
    assert (1, "ada", 0.0) in rows(db.table("accounts", app_time="2024-06-15"))
    # ... outside it the original still applies
    assert (1, "ada", 100.0) in rows(db.table("accounts", app_time="2024-08-01"))


def test_unsupported_statement_raises(eng):
    with pytest.raises(ValueError, match="unsupported DML"):
        eng.sql_dml("MERGE INTO accounts USING x ON TRUE")
