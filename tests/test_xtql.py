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


def test_scalar_expression_library(res):
    """Round-8 scalar fns: string ops, extract, if/in/null?,
    greatest/least — all compile to built-in JVM-side functions."""
    got = xtql_with_resolver(
        res,
        [
            {"from": "people", "bind": ["pid", "name", "age"]},
            {"with": {
                "n_len": ["length", "name"],
                "shout": ["upper", ["concat", "name", ["lit", "!"]]],
                "ini": ["substring", "name", 1, 2],
                "fixed": ["replace", "name", "a", "o"],
                "is_a": ["starts-with", "name", "a"],
                "tier": ["if", [">=", "age", 30], ["lit", "senior"],
                         ["lit", "junior"]],
                "known": ["in", "pid", 1, 3],
                "hi": ["greatest", "age", 30],
                "lo": ["least", "age", 30],
                "nn": ["not-null?", "name"],
            }},
            {"order-by": ["pid"]},
            {"return": ["name", "n_len", "shout", "ini", "fixed", "is_a",
                        "tier", "known", "hi", "lo", "nn"]},
        ],
    )
    r = {row["name"]: row.asDict() for row in got.collect()}
    assert r["ada"]["n_len"] == 3 and r["ada"]["shout"] == "ADA!"
    assert r["ada"]["ini"] == "ad" and r["ada"]["fixed"] == "odo"
    assert r["ada"]["is_a"] is True and r["bob"]["is_a"] is False
    assert r["ada"]["tier"] == "senior" and r["eve"]["tier"] == "junior"
    assert r["ada"]["known"] is True and r["bob"]["known"] is False
    assert r["eve"]["hi"] == 30 and r["eve"]["lo"] == 25
    assert all(row["nn"] is True for row in r.values())


def test_in_rejects_bare_string_literal(res):
    with pytest.raises(ValueError, match="lit"):
        xtql_with_resolver(
            res,
            [{"from": "people"},
             {"where": [["in", "name", "ada"]]}],
        )


def test_join_string_shorthand_coalesces_key(res, spark):
    """`"on": ["pid"]` (same-name shorthand) must leave ONE usable key
    column — later pipeline ops referencing it previously died with
    AMBIGUOUS_REFERENCE."""
    got = xtql_with_resolver(
        res,
        [
            {"from": "people", "bind": ["pid", "name"]},
            {"join": {"from": "tagged"}, "on": ["pid"]},
            {"where": [[">", "pid", 0]]},  # references the joined key
            {"with": {"pid2": ["*", "pid", 2]}},
            {"order-by": ["pid"]},
            {"return": ["pid", "pid2", "name"]},
        ],
    )
    assert rows(got) == [(1, 2, "ada"), (2, 4, "bob")]


def test_self_join_same_name_shorthand(res):
    """Self-join through the shorthand: same-lineage column resolution
    used to make df[l]==other[r] ambiguous."""
    got = xtql_with_resolver(
        res,
        [
            {"from": "people", "bind": ["dept", "pid"]},
            {"join": [{"from": "people", "bind": ["dept"]},
                      {"aggregate": {"dept_n": ["count"]},
                       "group": ["dept"]}],
             "on": ["dept"]},
            {"order-by": ["pid"]},
            {"return": ["pid", "dept_n"]},
        ],
    )
    assert rows(got) == [(1, 2), (2, 2), (3, 1)]


def test_mixed_on_pairs_with_same_name_pair(res, spark):
    other = spark.createDataFrame(
        [(10, 1, "x"), (10, 3, "y")], "dept int, p int, tag string"
    )
    got = xtql_with_resolver(
        lambda t: {"people": res("people"), "o": other}[t],
        [
            {"from": "people", "bind": ["pid", "dept", "name"]},
            {"join": {"from": "o"}, "on": ["dept", ["pid", "p"]]},
            {"order-by": ["pid"]},
            {"return": ["pid", "dept", "tag"]},
        ],
    )
    assert rows(got) == [(1, 10, "x")]


def test_where_exists_and_not_exists(res):
    has_tags = [
        {"from": "people", "bind": ["pid", "name"]},
        {"where": [["exists",
                    [{"from": "tagged"}, {"unnest": {"tag": "tags"}}],
                    ["pid"]]]},
        {"order-by": ["name"]},
        {"return": ["name"]},
    ]
    assert rows(xtql_with_resolver(res, has_tags)) == [("ada",)]
    no_tags = [
        {"from": "people", "bind": ["pid", "name"]},
        {"where": [["not-exists",
                    [{"from": "tagged"}, {"unnest": {"tag": "tags"}}],
                    ["pid"]]]},
        {"order-by": ["name"]},
        {"return": ["name"]},
    ]
    assert rows(xtql_with_resolver(res, no_tags)) == [("bob",), ("eve",)]


def test_where_exists_plan_is_semi_join_not_nested_loop(res):
    got = xtql_with_resolver(
        res,
        [
            {"from": "people", "bind": ["pid", "name"]},
            {"where": [["exists", {"from": "tagged"}, ["pid"]]]},
        ],
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_rel_literal_head_and_new_aggregates(res, spark):
    """`rel` starts a pipeline from an inline document list (the
    algebra's :table), sharing the RECORDS coercion rules; the widened
    aggregate set (stddev/array-agg/bool-and) compiles to built-ins."""
    got = xtql_with_resolver(res, [
        {"rel": [{"g": "a", "v": 1}, {"g": "a", "v": 2.5},
                 {"g": "b", "v": 4}]},
        {"aggregate": {"vals": ["array-agg", "v"], "n": ["count"]},
         "group": ["g"]},
        {"order-by": ["g"]},
    ])
    assert rows(got) == [("a", [1.0, 2.5], 2), ("b", [4.0], 1)]
    stats = xtql_with_resolver(res, [
        {"from": "people"},
        {"with": {"adult": [">=", "age", 18]}},
        {"aggregate": {"sd": ["stddev", "age"],
                       "all_adult": ["bool-and", "adult"]}},
    ])
    r = stats.collect()[0]
    assert r["all_adult"] is True and 7.0 < r["sd"] < 9.0
    # a rel literal can also feed a join against a real table
    joined = xtql_with_resolver(res, [
        {"rel": [{"dept": 10, "label": "eng-team"}]},
        {"join": {"from": "people", "bind": ["dept", "name"]},
         "on": ["dept"]},
        {"order-by": ["name"]},
        {"return": ["name", "label"]},
    ])
    assert rows(joined) == [("ada", "eng-team"), ("bob", "eng-team")]


def test_unify_shared_variable_joins(res):
    """`unify` head op: clauses sharing a variable natural-join on it
    (people⋈depts on the renamed dept/did variable), deferred where
    filters the unified row, and the result feeds the ordinary
    pipeline tail."""
    got = xtql_with_resolver(res, [
        {"unify": [
            {"from": "people", "bind": ["name", "age", {"dept": "d"}]},
            {"from": "depts", "bind": [{"did": "d"}, "dname"]},
            {"where": [[">", "age", 26]]},
        ]},
        {"order-by": ["name"]},
        {"return": ["name", "dname"]},
    ])
    assert rows(got) == [("ada", "eng"), ("bob", "eng")]


def test_unify_rel_with_rebinding_and_errors(res):
    """unify's remaining clause forms: a rel literal unifies like a
    from; a with binding a FRESH variable computes it; a with
    RE-binding an existing variable unifies (equality filter); bad
    clause shapes reject."""
    got = xtql_with_resolver(res, [
        {"unify": [
            {"from": "people", "bind": ["pid", "name"]},
            {"rel": [{"pid": 1, "badge": "x"}, {"pid": 3, "badge": "y"}]},
            {"with": {"tag": ["concat", "name", ["lit", "-"], "badge"]}},
        ]},
        {"order-by": ["pid"]},
        {"return": ["tag"]},
    ])
    assert rows(got) == [("ada-x",), ("eve-y",)]
    # re-binding: name must equal lower(name) -> only already-lower rows
    rebound = xtql_with_resolver(res, [
        {"unify": [
            {"from": "people", "bind": ["pid", "name"]},
            {"with": {"name": ["lower", "name"]}},
        ]},
        {"order-by": ["pid"]},
    ])
    assert [r[1] for r in rows(rebound)] == ["ada", "bob", "eve"]
    # exists inside a unify where decorrelates to a semi join
    sub = xtql_with_resolver(res, [
        {"unify": [
            {"from": "depts", "bind": ["did", "dname"]},
            {"where": [["exists", {"from": "people",
                                   "bind": [{"dept": "did"}]},
                        ["did"]]]},
        ]},
        {"order-by": ["dname"]},
        {"return": ["dname"]},
    ])
    assert rows(sub) == [("eng",), ("ops",)]
    for bad, msg in [
        ([{"unify": []}], "non-empty"),
        ([{"unify": [{"where": [[">", "age", 1]]}]}], "at least one"),
        ([{"unify": [{"with": {"x": 1}}]}], "prior relation"),
        ([{"unify": [{"limit": 3}]}], "unknown clause"),
        ([{"unify": [{"from": "people"},
                     {"left-join": {"from": "tagged",
                                    "bind": [{"tags": "zz"}]}}]}],
         "no shared"),
    ]:
        with pytest.raises(ValueError, match=msg):
            xtql_with_resolver(res, bad)


def test_unify_plans_hash_joins_never_cartesian(res):
    """Scale audit: both unification styles must plan hash joins —
    shared-variable clauses natural-join directly, and the rebind
    style's cross product + equality filter must be folded back into a
    join condition by Catalyst (PushPredicateThroughJoin), never left
    as a CartesianProduct/BroadcastNestedLoop."""
    shared = xtql_with_resolver(res, [
        {"unify": [
            {"from": "people", "bind": ["name", {"dept": "d"}]},
            {"from": "depts", "bind": [{"did": "d"}, "dname"]},
        ]},
    ])
    rebind = xtql_with_resolver(res, [
        {"unify": [
            {"from": "people", "bind": ["name", "dept"]},
            {"from": "depts", "bind": ["did", "dname"]},
            {"with": {"did": "dept"}},
        ]},
    ])
    for df in (shared, rebind):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Cartesian" not in plan and "NestedLoop" not in plan, plan
        assert "HashJoin" in plan or "SortMergeJoin" in plan, plan
    assert sorted(rows(shared.select("name", "dname"))) == [
        ("ada", "eng"), ("bob", "eng"), ("eve", "ops")
    ]
    assert sorted(rows(rebind.select("name", "dname"))) == [
        ("ada", "eng"), ("bob", "eng"), ("eve", "ops")
    ]


def test_order_by_nulls_placement(res, spark):
    """order-by triples [col, dir, nulls-first|nulls-last] — the v2
    {:val :dir :nulls} spelling; bad placements reject."""
    nully = spark.createDataFrame(
        [(1, 5), (2, None), (3, 1)], "k int, v int"
    )
    r = lambda t: {"nully": nully}[t]
    first = xtql_with_resolver(r, [
        {"from": "nully"},
        {"order-by": [["v", "desc", "nulls-first"]]},
        {"return": ["k"]},
    ])
    assert [x[0] for x in rows(first)] == [2, 1, 3]
    last = xtql_with_resolver(r, [
        {"from": "nully"},
        {"order-by": [["v", "asc", "nulls-last"]]},
        {"return": ["k"]},
    ])
    assert [x[0] for x in rows(last)] == [3, 1, 2]
    with pytest.raises(ValueError, match="nulls placement"):
        xtql_with_resolver(r, [
            {"from": "nully"},
            {"order-by": [["v", "asc", "bogus"]]},
        ])


def test_unify_left_join_and_unnest(res):
    """left-join clause: optional unification (eve's dept 20 has no
    tagged row -> NULL tags survive); unnest clause: explode an array
    binding inside the unification."""
    got = xtql_with_resolver(res, [
        {"unify": [
            {"from": "people", "bind": ["pid", "name"]},
            {"left-join": {"from": "tagged", "bind": ["pid", "tags"]}},
        ]},
        {"order-by": ["pid"]},
        {"return": ["name", "tags"]},
    ])
    assert rows(got) == [
        ("ada", ["a", "b"]), ("bob", []), ("eve", None)
    ]
    # explicit on-pairs override shared-name matching
    got2 = xtql_with_resolver(res, [
        {"unify": [
            {"from": "people", "bind": [{"pid": "person"}, "name"]},
            {"left-join": {"from": "tagged", "bind": ["pid", "tags"]},
             "on": [["person", "pid"]]},
        ]},
        {"order-by": ["person"]},
        {"return": ["name", "tags"]},
    ])
    assert rows(got2) == rows(got)
    # unnest inside unify: one row per tag, joined back to depts
    exploded = xtql_with_resolver(res, [
        {"unify": [
            {"from": "people", "bind": ["pid", {"dept": "did"}]},
            {"from": "tagged", "bind": ["pid", "tags"]},
            {"unnest": {"tag": "tags"}},
            {"from": "depts", "bind": ["did", "dname"]},
        ]},
        {"order-by": ["pid", "tag"]},
        {"return": ["pid", "tag", "dname"]},
    ])
    assert rows(exploded) == [(1, "a", "eng"), (1, "b", "eng")]


def test_asof_join_op(spark):
    """`asof-join` drives the library union+window matcher: backward
    nearest match per key, tolerance nulls out distant matches,
    unmatched left rows survive with NULLs (left semantics by
    default)."""
    trades = spark.createDataFrame(
        [("A", 10, 1), ("A", 25, 2), ("B", 5, 3)], "sym string, t long, tid int"
    )
    quotes = spark.createDataFrame(
        [("A", 8, 1.0), ("A", 20, 2.0), ("B", 50, 9.0)],
        "sym string, t long, px double",
    )
    res = lambda n: {"trades": trades, "quotes": quotes}[n]  # noqa: E731
    got = xtql_with_resolver(res, [
        {"from": "trades"},
        {"asof-join": {"from": "quotes"},
         "on": ["sym"], "time": "t", "values": ["px"]},
        {"order-by": ["tid"]},
        {"return": ["tid", "px"]},
    ])
    assert rows(got) == [(1, 1.0), (2, 2.0), (3, None)]
    tol = xtql_with_resolver(res, [
        {"from": "trades"},
        {"asof-join": {"from": "quotes"},
         "on": ["sym"], "time": "t", "values": ["px"], "tolerance": 3},
        {"order-by": ["tid"]},
        {"return": ["tid", "px"]},
    ])
    assert rows(tol) == [(1, 1.0), (2, None), (3, None)]
    with pytest.raises(ValueError, match="time"):
        xtql_with_resolver(res, [
            {"from": "trades"},
            {"asof-join": {"from": "quotes"}, "on": ["sym"]},
        ])


def test_temporal_bind_at_and_between(spark):
    """Per-from for-valid-time/for-system-time (XTDB-v2 spelling)
    against a versioned relation with the engine's temporal columns."""
    from core2_spark import temporal as bt

    v1 = bt.put(
        spark.createDataFrame([(1, "old")], "id int, v string"),
        tx_time="2024-01-01",
        app_start="2024-01-01", app_end="2024-06-01",
    )
    v2 = bt.put(
        spark.createDataFrame([(1, "new")], "id int, v string"),
        tx_time="2024-03-01",
        app_start="2024-03-01", app_end="2024-06-01",
    )
    versions = bt.close_system_versions(v1.unionByName(v2))
    res2 = lambda t: {"vt": versions}[t]  # noqa: E731
    at = lambda s, t: rows(xtql_with_resolver(res2, [  # noqa: E731
        {"from": "vt",
         "for-system-time": ["at", s], "for-valid-time": ["at", t],
         "bind": ["id", "v"]},
    ]))
    # before the correction was known: old; after: new shadows it
    assert at("2024-02-01", "2024-04-01") == [(1, "old")]
    assert at("2024-04-01", "2024-04-01") == [(1, "new")]
    # lead-closure semantics: once v2 is known it closes v1's system
    # period entirely, so an earlier valid time reads nothing
    assert at("2024-04-01", "2024-02-01") == []
    ranged = rows(xtql_with_resolver(res2, [
        {"from": "vt", "for-system-time": "all-time",
         "for-valid-time": ["from", "2024-01-15", "to", "2024-02-15"],
         "bind": ["id", "v"]},
    ]))
    assert ranged == [(1, "old")]
    in_form = rows(xtql_with_resolver(res2, [
        {"from": "vt", "for-system-time": ["in", "2024-01-01", "2024-02-01"],
         "bind": ["id", "v"]},
    ]))
    assert in_form == [(1, "old")]


def test_temporal_bind_requires_version_columns(res):
    with pytest.raises(ValueError, match="versioned"):
        xtql_with_resolver(
            res,
            [{"from": "people", "for-valid-time": ["at", "2024-01-01"]}],
        )


def test_pull_op(res, spark):
    got = xtql_with_resolver(
        res,
        [
            {"from": "people", "bind": ["name", "dept"]},
            {"pull": {"on": "dept", "from": "depts", "id": "did",
                      "attrs": ["dname"],
                      "rels": [{"table": "people", "fk": "dept",
                                "attrs": ["name", "age"],
                                "order": "name", "as": "colleagues"}],
                      "as": "doc"}},
            {"order-by": ["name"]},
            {"return": ["name", "doc"]},
        ],
    )
    out = {r["name"]: r["doc"].asDict(True) for r in got.collect()}
    assert out["ada"]["dname"] == "eng"
    assert [m["name"] for m in out["ada"]["colleagues"]] == ["ada", "bob"]
    assert [m["name"] for m in out["eve"]["colleagues"]] == ["eve"]


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


def test_snapshot_xtql_per_from_temporal_binds(spark, tmp_path):
    """On the ENGINE path, per-from `(at t)` binds forward to
    Snapshot.table's as-of kwargs — rectangle-correct resolution per
    from, not raw column filters; two froms in one pipeline can read
    DIFFERENT instants."""
    from core2_spark.engine import Engine, Put

    eng = Engine(spark, str(tmp_path / "db"))
    mk = lambda v: spark.createDataFrame([(1, v)], "id long, v string")
    eng.submit_tx([Put("t", mk("v1"))], tx_time="2024-01-01 00:00:01")
    eng.submit_tx([Put("t", mk("v2"))], tx_time="2024-02-01 00:00:01")
    snap = eng.db()
    # as-of the first commit
    old = snap.xtql([
        {"from": "t", "for-system-time": ["at", "2024-01-15 00:00:00"]},
        {"return": ["v"]},
    ])
    assert rows(old) == [("v1",)]
    # two froms, two instants, joined: old value beside current
    both = snap.xtql([
        {"from": "t", "for-system-time": ["at", "2024-01-15 00:00:00"],
         "bind": ["id", {"v": "v_old"}]},
        {"join": {"from": "t", "bind": ["id", {"v": "v_now"}]},
         "on": ["id"]},
        {"return": ["v_old", "v_now"]},
    ])
    assert rows(both) == [("v1", "v2")]
    # the same two-instant read as a UNIFY: temporal options on a
    # from CLAUSE ride the same basis-aware resolver, and the shared
    # `id` variable unifies the instants implicitly
    unified = snap.xtql([
        {"unify": [
            {"from": "t", "for-system-time": ["at", "2024-01-15 00:00:00"],
             "bind": ["id", {"v": "v_old"}]},
            {"from": "t", "bind": ["id", {"v": "v_now"}]},
        ]},
        {"return": ["v_old", "v_now"]},
    ])
    assert rows(unified) == [("v1", "v2")]


def test_snapshot_xtql_range_bind_reads_history(spark, tmp_path):
    """Range / all-time temporal binds on the ENGINE path resolve
    through Snapshot.history (raw closed-period versions) and then
    apply as column predicates."""
    from core2_spark.engine import Engine, Put

    eng = Engine(spark, str(tmp_path / "db"))
    mk = lambda v: spark.createDataFrame([(1, v)], "id long, v string")
    eng.submit_tx([Put("t", mk("v1"))], tx_time="2024-01-01 00:00:01")
    eng.submit_tx([Put("t", mk("v2"))], tx_time="2024-02-01 00:00:01")
    snap = eng.db()
    all_time = snap.xtql([
        {"from": "t", "for-system-time": "all-time"},
        {"order-by": ["v"]},
        {"return": ["v"]},
    ])
    assert rows(all_time) == [("v1",), ("v2",)]
    ranged = snap.xtql([
        {"from": "t",
         "for-system-time": ["from", "2024-01-01", "to", "2024-01-20"]},
        {"return": ["v"]},
    ])
    assert rows(ranged) == [("v1",)]
    # same hygiene as the SQL dialect's FOR-clause view: tombstone
    # MARKER rows never surface as data, and the write-order columns
    # (_tx_seq/_row_seq/_tombstone) never appear as output columns
    from core2_spark.engine import Delete

    eng.submit_tx(
        [Delete("t", spark.createDataFrame([(1,)], "id long"))],
        tx_time="2024-03-01 00:00:01",
    )
    hist = eng.db().xtql([{"from": "t", "for-system-time": "all-time"}])
    assert not any(c.startswith("_") for c in hist.columns)
    assert sorted(r["v"] for r in hist.collect()) == ["v1", "v2"]


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
