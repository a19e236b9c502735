"""SETTING DEFAULT VALID_TIME/SYSTEM_TIME AS OF '...' query prefix
(sql_dialect.strip_setting_prefix + Snapshot.sql): statement-scoped
default clocks — the SQL spelling of the as-of kwargs."""

from __future__ import annotations

import pytest

from core2_spark.engine import Engine, Put
from core2_spark.sql_dialect import strip_setting_prefix


# -- prefix parser -------------------------------------------------------


def test_strip_single_clause():
    rest, kw = strip_setting_prefix(
        "SETTING DEFAULT SYSTEM_TIME AS OF '2024-02-01' SELECT * FROM t"
    )
    assert rest.strip() == "SELECT * FROM t"
    assert kw == {"system_time": "2024-02-01"}


def test_strip_both_axes_and_valid_time_synonym():
    rest, kw = strip_setting_prefix(
        "SETTING DEFAULT VALID_TIME AS OF TIMESTAMP '2024-03-01', "
        "DEFAULT SYSTEM_TIME AS OF '2024-02-01' SELECT 1"
    )
    assert rest.strip() == "SELECT 1"
    assert kw == {"app_time": "2024-03-01", "system_time": "2024-02-01"}


def test_strip_passthrough_without_setting():
    assert strip_setting_prefix("SELECT 1") == ("SELECT 1", {})


@pytest.mark.parametrize(
    "bad, msg",
    [
        ("SETTING DEFAULT VALID_TIME ALL SELECT 1", "per table"),
        (
            "SETTING DEFAULT VALID_TIME AS OF '2024-01-01', "
            "DEFAULT APPLICATION_TIME AS OF '2024-01-02' SELECT 1",
            "twice",
        ),
        ("SETTING SELECT 1", "must be followed"),
    ],
)
def test_strip_rejects(bad, msg):
    with pytest.raises(ValueError, match=msg):
        strip_setting_prefix(bad)


# -- engine behavior -----------------------------------------------------


@pytest.fixture()
def eng(spark, tmp_path):
    e = Engine(spark, str(tmp_path / "db"))
    mk = lambda v: spark.createDataFrame([(1, v)], "id long, v string")
    e.submit_tx([Put("t", mk("v1"))], tx_time="2024-01-01 00:00:01")
    e.submit_tx([Put("t", mk("v2"))], tx_time="2024-02-01 00:00:01")
    return e


def test_setting_system_time_default(eng):
    assert eng.db().sql("SELECT v FROM t").collect()[0]["v"] == "v2"
    got = eng.db().sql(
        "SETTING DEFAULT SYSTEM_TIME AS OF '2024-01-15' SELECT v FROM t"
    )
    assert got.collect()[0]["v"] == "v1"


def test_setting_per_table_for_clause_still_overrides(eng):
    """An explicit FOR SYSTEM_TIME AS OF on a table reference resolves
    against the history view and beats the statement default."""
    got = eng.db().sql(
        "SETTING DEFAULT SYSTEM_TIME AS OF '2024-01-15' "
        "SELECT a.v AS dflt, b.v AS pinned FROM t a JOIN "
        "t FOR SYSTEM_TIME AS OF TIMESTAMP '2024-02-02 00:00:00' b "
        "ON a.id = b.id"
    ).collect()[0]
    assert (got["dflt"], got["pinned"]) == ("v1", "v2")


def test_setting_conflicts_with_kwarg(eng):
    with pytest.raises(ValueError, match="pick one"):
        eng.db().sql(
            "SETTING DEFAULT SYSTEM_TIME AS OF '2024-01-15' "
            "SELECT v FROM t",
            system_time="2024-02-02",
        )
