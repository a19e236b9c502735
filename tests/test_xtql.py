"""XTQL pipeline frontend (xtql.py): operator-by-operator compilation
to DataFrame algebra, plan properties, and the basis-pinned
Snapshot.xtql surface."""

from __future__ import annotations

import pytest

from core2_spark.xtql import xtql_with_resolver


@pytest.fixture()
def res(spark):
    people = spark.createDataFrame(
        [(1, "ada", 30, 10), (2, "bob", 41, 10), (3, "eve", 25, 20)],
        "pid int, name string, age int, dept int",
    )
    depts = spark.createDataFrame(
        [(10, "eng"), (20, "ops"), (30, "empty")], "did int, dname string"
    )
    tagged = spark.createDataFrame(
        [(1, ["a", "b"]), (2, [])], "pid int, tags array<string>"
    )
    frames = {"people": people, "depts": depts, "tagged": tagged}
    return lambda t: frames[t]


def rows(df):
    return [tuple(r) for r in df.collect()]


def test_from_bind_rename_and_match(res):
    got = xtql_with_resolver(
        res,
        [
            {"from": "people",
             "bind": ["name", {"age": "years"}, {"dept": {"=": 10}}]},
            {"order-by": ["name"]},
        ],
    )
    assert got.columns == ["name", "years"]
    assert rows(got) == [("ada", 30), ("bob", 41)]


def test_where_with_without_return(res):
    got = xtql_with_resolver(
        res,
        [
            {"from": "people"},
            {"where": [[">", "age", 26], ["<>", "name", ["lit", "bob"]]]},
            {"with": {"next_age": ["+", "age", 1]}},
            {"without": ["dept", "pid"]},
            {"return": ["name", {"next_age": "na"}]},
        ],
    )
    assert rows(got) == [("ada", 31)]


def test_join_and_left_join(res):
    base = [
        {"from": "people", "bind": ["name", "dept"]},
        {"join": {"from": "depts", "bind": ["did", "dname"]},
         "on": [["dept", "did"]]},
        {"order-by": ["name"]},
        {"return": ["name", "dname"]},
    ]
    assert rows(xtql_with_resolver(res, base)) == [
        ("ada", "eng"), ("bob", "eng"), ("eve", "ops"),
    ]
    left = [
        {"from": "depts", "bind": ["did", "dname"]},
        {"left-join": {"from": "people", "bind": ["name", "dept"]},
         "on": [["did", "dept"]]},
        {"order-by": ["dname", "name"]},
        {"return": ["dname", "name"]},
    ]
    assert rows(xtql_with_resolver(res, left)) == [
        ("empty", None), ("eng", "ada"), ("eng", "bob"), ("ops", "eve"),
    ]


def test_unnest_and_aggregate(res):
    got = xtql_with_resolver(
        res,
        [
            {"from": "tagged"},
            {"unnest": {"tag": "tags"}},
            {"aggregate": {"n": ["count"]}, "group": ["pid"]},
            {"order-by": ["pid"]},
        ],
    )
    # pid 2's empty array vanishes under explode (inner-unnest)
    assert rows(got) == [(1, 2)]


def test_global_aggregate(res):
    got = xtql_with_resolver(
        res,
        [
            {"from": "people"},
            {"aggregate": {"n": ["count"], "oldest": ["max", "age"]}},
        ],
    )
    assert rows(got) == [(3, 41)]


def test_limit_requires_order(res):
    with pytest.raises(ValueError, match="non-deterministic"):
        xtql_with_resolver(res, [{"from": "people"}, {"limit": 2}])


def test_offset_and_limit(res):
    got = xtql_with_resolver(
        res,
        [
            {"from": "people", "bind": ["age"]},
            {"order-by": [["age", "desc"]]},
            {"offset": 1, "limit": 1},
        ],
    )
    assert rows(got) == [(30,)]


@pytest.mark.parametrize(
    "pipeline, msg",
    [
        ([], "empty pipeline"),
        ([{"where": []}], "starts with a from"),
        ([{"from": "people"}, {"from": "depts"}], "mid-pipeline"),
        ([{"from": "people"}, {"frobnicate": 1}], "unknown operator"),
        ([{"from": "people"}, {"join": {"from": "depts"}}], "'on'"),
        ([{"from": "people", "bind": [{"a": "b", "c": "d"}]}], "bad bind"),
    ],
)
def test_rejections(res, pipeline, msg):
    with pytest.raises(ValueError, match=msg):
        xtql_with_resolver(res, pipeline)


def test_ordered_limit_is_top_k_plan(res):
    got = xtql_with_resolver(
        res,
        [
            {"from": "people", "bind": ["age"]},
            {"order-by": [["age", "desc"]]},
            {"limit": 2},
        ],
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_snapshot_xtql_basis_pinned(spark, tmp_path):
    """Snapshot.xtql reads the same basis-pinned views as sql/q —
    a later commit is invisible to an earlier snapshot."""
    from core2_spark.engine import Engine, Put

    eng = Engine(spark, str(tmp_path / "db"))
    mk = lambda v: spark.createDataFrame([(1, v)], "id long, v string")
    eng.submit_tx([Put("t", mk("v1"))], tx_time="2024-01-01 00:00:01")
    snap = eng.db()
    eng.submit_tx([Put("t", mk("v2"))], tx_time="2024-02-01 00:00:01")
    pipeline = [{"from": "t"}, {"return": ["v"]}]
    assert rows(snap.xtql(pipeline)) == [("v1",)]
    assert rows(eng.db().xtql(pipeline)) == [("v2",)]
