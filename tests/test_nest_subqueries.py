"""NEST_MANY / NEST_ONE nested-result subqueries (sql_dialect.py):
the reference's XTDB-v2 SQL spelling for nested documents, compiled
to correlated aggregated scalar subqueries that Catalyst decorrelates
into joins."""

from __future__ import annotations

import pytest

from core2_spark.sql_dialect import rewrite_nest_subqueries


# -- text-level rewrite -------------------------------------------------


def test_rewrite_nest_many_shape():
    out = rewrite_nest_subqueries(
        "SELECT c.id, NEST_MANY(SELECT o.v AS v FROM o WHERE o.cid = c.id)"
        " AS xs FROM c"
    )
    assert "sort_array(collect_list(struct(o.v AS v)))" in out
    assert "NEST_MANY" not in out.upper()


def test_rewrite_nest_one_shape():
    out = rewrite_nest_subqueries(
        "SELECT c.id, NEST_ONE(SELECT n.nm AS nm FROM n WHERE n.k = c.id)"
        " AS nat FROM c"
    )
    assert "count(*) > 1" in out and "raise_error" in out
    assert "any_value(struct(n.nm AS nm))" in out


def test_rewrite_passthrough_without_nest():
    sql = "SELECT 1 AS x"
    assert rewrite_nest_subqueries(sql) == sql


def test_rewrite_string_literal_is_not_a_token():
    sql = "SELECT 'NEST_MANY(' AS s FROM t"
    assert rewrite_nest_subqueries(sql) == sql


@pytest.mark.parametrize(
    "body, msg",
    [
        ("SELECT o.v FROM o ORDER BY o.v", "ORDER"),
        ("SELECT o.v FROM o LIMIT 3", "LIMIT"),
        ("SELECT o.k FROM o GROUP BY o.k", "GROUP"),
        ("SELECT DISTINCT o.v FROM o", "DISTINCT"),
        ("VALUES (1)", "must wrap a SELECT"),
        ("SELECT 1", "FROM clause"),
    ],
)
def test_rewrite_rejects_unsupported_bodies(body, msg):
    with pytest.raises(ValueError, match=msg):
        rewrite_nest_subqueries(f"SELECT NEST_MANY({body}) AS xs FROM c")


def test_rewrite_nested_parens_in_predicates_survive():
    out = rewrite_nest_subqueries(
        "SELECT NEST_MANY(SELECT o.v AS v FROM o "
        "WHERE (o.cid = c.id AND (o.v > 0 OR o.v < -5))) AS xs FROM c"
    )
    assert "(o.cid = c.id AND (o.v > 0 OR o.v < -5))" in out


# -- execution semantics -------------------------------------------------


@pytest.fixture()
def views(spark):
    spark.createDataFrame(
        [(1, "a", 10), (2, "b", 10), (3, "c", 20)],
        "id int, name string, nk int",
    ).createOrReplaceTempView("nest_c")
    spark.createDataFrame(
        [(1, 30, "x"), (1, 20, "y"), (2, 5, "z")],
        "cid int, val int, tag string",
    ).createOrReplaceTempView("nest_o")
    spark.createDataFrame(
        [(10, "TEN"), (20, "TWENTY"), (20, "TWENTY-DUP")],
        "k int, nm string",
    ).createOrReplaceTempView("nest_n")
    yield
    for v in ("nest_c", "nest_o", "nest_n"):
        spark.catalog.dropTempView(v)


def test_nest_many_content_order_and_empty(spark, views):
    rows = spark.sql(
        rewrite_nest_subqueries(
            "SELECT c.id, NEST_MANY(SELECT o.val AS v, o.tag AS t "
            "FROM nest_o o WHERE o.cid = c.id) AS orders "
            "FROM nest_c c ORDER BY c.id"
        )
    ).collect()
    got = {r["id"]: [(e["v"], e["t"]) for e in r["orders"]] for r in rows}
    # canonical ascending (sort_array), [] for the no-match customer
    assert got == {1: [(20, "y"), (30, "x")], 2: [(5, "z")], 3: []}


def test_nest_one_null_and_raise(spark, views):
    rows = spark.sql(
        rewrite_nest_subqueries(
            "SELECT c.id, NEST_ONE(SELECT n.nm AS nm FROM nest_n n "
            "WHERE n.k = c.nk AND n.nm = 'TEN') AS nat "
            "FROM nest_c c ORDER BY c.id"
        )
    ).collect()
    got = {r["id"]: (r["nat"]["nm"] if r["nat"] else None) for r in rows}
    assert got == {1: "TEN", 2: "TEN", 3: None}
    # two nation rows share k=20 -> the guard must raise at execution
    with pytest.raises(Exception, match="more than one row"):
        spark.sql(
            rewrite_nest_subqueries(
                "SELECT c.id, NEST_ONE(SELECT n.nm AS nm FROM nest_n n "
                "WHERE n.k = c.nk) AS nat FROM nest_c c"
            )
        ).collect()


def test_nest_decorrelates_to_joins(spark, views):
    """The whole point at 100 TB: the correlated aggregated subquery
    must decorrelate — one aggregate + join, never a per-outer-row
    nested-loop plan."""
    plan = (
        spark.sql(
            rewrite_nest_subqueries(
                "SELECT c.id, NEST_MANY(SELECT o.val AS v FROM nest_o o "
                "WHERE o.cid = c.id) AS orders FROM nest_c c"
            )
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_nest_through_snapshot_sql(spark, tmp_path):
    """NEST_MANY/NEST_ONE ride Snapshot.sql like every dialect
    feature — over engine tables, at a pinned basis."""
    from core2_spark.engine import Engine, Put

    eng = Engine(spark, str(tmp_path / "db"))
    custs = spark.createDataFrame(
        [(1, "ada"), (2, "bob")], "id int, name string"
    )
    orders = spark.createDataFrame(
        [(100, 1, 9.0), (101, 1, 5.0), (102, 2, 7.0)],
        "id int, cust_id int, total double",
    )
    eng.submit_tx(
        [Put("custs", custs), Put("orders", orders)],
        tx_time="2024-01-01 00:00:01",
    )
    rows = eng.db().sql(
        "SELECT c.name, NEST_MANY(SELECT o.total AS t FROM orders o "
        "WHERE o.cust_id = c.id) AS ts FROM custs c ORDER BY c.name"
    ).collect()
    got = {r["name"]: [e["t"] for e in r["ts"]] for r in rows}
    assert got == {"ada": [5.0, 9.0], "bob": [7.0]}
