"""Driver-gated queries routed through the Engine / Snapshot.sql path.

The round-2 regression (Snapshot.sql raising TypeError) was invisible
to the driver gate because no registered query touched `Engine`.  These
queries close that hole: each one ingests deterministic rows derived
from the `nation` fixture through `Engine.submit_tx` / `Engine.sql_dml`
and reads the result back through `Snapshot.sql`, so the full ingest →
bitemporal storage → SQL:2011-dialect read path gets a CORRECTNESS row
every round.  The oracle reconstructs the expected state directly from
`nation` — the engine's visibility rules (latest-covering-version wins,
tombstones hide ids, FOR clauses read closed system periods) are simple
enough at this fixture shape to express as plain SQL.

Reference surface: README.adoc:13-15 (submit-tx, SQL at a basis);
SURVEY.md §3.1/§3.3.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from core2_spark.queries.registry import query


def _nation_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from core2_spark.catalog import load_table

    return load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("id"),
        F.col("n_name").alias("name"),
        F.col("n_regionkey").alias("regionkey"),
    )


@query(
    "engine_sql_time_travel",
    oracle="""
    SELECT n_nationkey AS id,
           CASE WHEN n_nationkey % 3 = 0 THEN n_name || '_v2' ELSE n_name END
               AS name_now,
           n_name AS name_orig
    FROM nation
    WHERE n_nationkey % 5 <> 0
    ORDER BY id
    """,
)
def engine_sql_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """submit_tx ingest (put, retroactive put, delete) → Snapshot.sql
    joining a bare reference (current state) with a FOR SYSTEM_TIME AS
    OF reference (pre-update state) on the same table — the exact shape
    the round-2 regression broke."""
    from core2_spark.engine import Delete, Engine, Put

    nation = _nation_rows(spark, sf_dir)
    eng = Engine(spark, tempfile.mkdtemp(prefix="engine_q_tt_"))
    eng.submit_tx([Put("nations", nation)], tx_time="2024-01-01 00:00:01")
    eng.submit_tx(
        [
            Put(
                "nations",
                nation.filter(F.col("id") % 3 == 0).withColumn(
                    "name", F.concat(F.col("name"), F.lit("_v2"))
                ),
            )
        ],
        tx_time="2024-01-01 00:00:02",
    )
    eng.submit_tx(
        [Delete("nations", nation.filter(F.col("id") % 5 == 0).select("id"))],
        tx_time="2024-01-01 00:00:03",
    )
    return eng.db().sql(
        """
        SELECT n.id AS id, n.name AS name_now, h.name AS name_orig
        FROM nations n
        JOIN nations FOR SYSTEM_TIME AS OF TIMESTAMP '2024-01-01 00:00:01' h
          ON n.id = h.id
        ORDER BY n.id
        """
    )


@query(
    "engine_dml_roundtrip",
    oracle="""
    WITH base AS (
        SELECT n_nationkey AS id, n_name AS name, n_regionkey AS regionkey
        FROM nation
        UNION ALL
        SELECT n_nationkey + 100, n_name, n_regionkey
        FROM nation WHERE n_regionkey = 0
    ),
    upd AS (
        SELECT id,
               CASE WHEN regionkey = 1 THEN name || '_upd' ELSE name END AS name,
               regionkey
        FROM base
    )
    SELECT id, name, regionkey FROM upd WHERE id % 7 <> 0 ORDER BY id
    """,
)
def engine_dml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL DML pipeline through the engine log: INSERT…SELECT (reads
    the snapshot via Snapshot.sql — the other red round-2 path), then
    UPDATE and DELETE, then a bare Snapshot.sql read of final current
    state.  Oracle replays the same edits in plain SQL over nation."""
    from core2_spark.engine import Engine, Put

    nation = _nation_rows(spark, sf_dir)
    eng = Engine(spark, tempfile.mkdtemp(prefix="engine_q_dml_"))
    eng.submit_tx([Put("nations", nation)], tx_time="2024-01-01 00:00:01")
    eng.sql_dml(
        "INSERT INTO nations "
        "SELECT id + 100 AS id, name, regionkey FROM nations WHERE regionkey = 0",
        tx_time="2024-01-01 00:00:02",
    )
    eng.sql_dml(
        "UPDATE nations SET name = concat(name, '_upd') WHERE regionkey = 1",
        tx_time="2024-01-01 00:00:03",
    )
    eng.sql_dml(
        "DELETE FROM nations WHERE id % 7 = 0",
        tx_time="2024-01-01 00:00:04",
    )
    return eng.db().sql(
        "SELECT id, name, regionkey FROM nations ORDER BY id"
    )


@query(
    "engine_sql_period_overlaps",
    oracle="""
    WITH v1 AS (
        SELECT n_nationkey AS id, n_name AS name,
               TIMESTAMP '2024-01-01 00:00:00' AS app_start
        FROM nation
    ),
    v2 AS (
        SELECT n_nationkey AS id, n_name AS name,
               TIMESTAMP '2024-05-01 00:00:00' AS app_start
        FROM nation WHERE n_nationkey % 2 = 0
    )
    SELECT id, name, app_start
    FROM (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
    ORDER BY id, app_start
    """,
)
def engine_sql_period_overlaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FOR ALL SYSTEM_TIME + SQL:2011 OVERLAPS through Snapshot.sql:
    versions whose application period overlaps [Jun 1, Aug 1) — the
    first put covers [Jan, Jul) (all 25 ids), the retroactive second
    put [May, ∞) (even ids), so both versions qualify for even ids and
    one for odd.  Gates the FOR ALL spelling and the OVERLAPS expansion
    end-to-end."""
    from core2_spark.engine import Engine, Put

    nation = _nation_rows(spark, sf_dir)
    eng = Engine(spark, tempfile.mkdtemp(prefix="engine_q_ovl_"))
    eng.submit_tx(
        [
            Put(
                "nations",
                nation,
                app_start="2024-01-01 00:00:00",
                app_end="2024-07-01 00:00:00",
            )
        ],
        tx_time="2024-01-01 00:00:01",
    )
    eng.submit_tx(
        [
            Put(
                "nations",
                nation.filter(F.col("id") % 2 == 0),
                app_start="2024-05-01 00:00:00",
            )
        ],
        tx_time="2024-01-01 00:00:02",
    )
    return eng.db().sql(
        """
        SELECT id, name, app_time_start AS app_start
        FROM nations FOR ALL SYSTEM_TIME h
        WHERE (app_time_start, app_time_end) OVERLAPS
              (TIMESTAMP '2024-06-01 00:00:00', TIMESTAMP '2024-08-01 00:00:00')
        ORDER BY id, app_start
        """
    )


@query(
    "engine_dml_portion_of_app_time",
    oracle="""
    SELECT 'apr' AS probe, n_nationkey AS id,
           CASE WHEN n_regionkey = 2 THEN n_name || '_mar' ELSE n_name END AS name
    FROM nation
    UNION ALL
    SELECT 'jul', n_nationkey, n_name FROM nation
    ORDER BY probe, id
    """,
)
def engine_dml_portion_of_app_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATE ... FOR PORTION OF APPLICATION_TIME through the engine:
    the correction covers only [Mar, Jun), so an April read sees the
    updated names (for regionkey 2) while a July read falls back to the
    original version — the rectangle-correct resolution (a partial
    retroactive correction never shadows periods it doesn't cover),
    driver-gated."""
    from core2_spark.engine import Engine, Put

    nation = _nation_rows(spark, sf_dir)
    eng = Engine(spark, tempfile.mkdtemp(prefix="engine_q_por_"))
    eng.submit_tx(
        [Put("nations", nation, app_start="2024-01-01 00:00:00")],
        tx_time="2024-01-01 00:00:01",
    )
    eng.sql_dml(
        "UPDATE nations FOR PORTION OF APPLICATION_TIME "
        "FROM '2024-03-01 00:00:00' TO '2024-06-01 00:00:00' "
        "SET name = concat(name, '_mar') WHERE regionkey = 2",
        tx_time="2024-01-01 00:00:02",
    )
    db = eng.db()
    apr = db.sql(
        "SELECT id, name FROM nations", app_time="2024-04-01 00:00:00"
    ).withColumn("probe", F.lit("apr"))
    jul = db.sql(
        "SELECT id, name FROM nations", app_time="2024-07-01 00:00:00"
    ).withColumn("probe", F.lit("jul"))
    return apr.unionByName(jul).select("probe", "id", "name").orderBy("probe", "id")


@query(
    "engine_changes_feed",
    oracle="""
    SELECT n_nationkey AS id, n_name || '_v2' AS name, 'put' AS _change
    FROM nation WHERE n_nationkey % 3 = 0
    UNION ALL
    SELECT n_nationkey, NULL, 'delete'
    FROM nation WHERE n_nationkey % 5 = 0
    ORDER BY id, _change
    """,
)
def engine_changes_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC view through the driver gate: after an initial load, an
    update (ids %3) and a delete (ids %5), the change feed since the
    load must contain exactly the updated versions as 'put' and the
    tombstones as 'delete' (name NULL — tombstones carry no data
    columns)."""
    from core2_spark.engine import Delete, Engine, Put

    nation = _nation_rows(spark, sf_dir)
    eng = Engine(spark, tempfile.mkdtemp(prefix="engine_q_cdc_"))
    eng.submit_tx([Put("nations", nation)], tx_time="2024-01-01 00:00:01")
    eng.submit_tx(
        [
            Put(
                "nations",
                nation.filter(F.col("id") % 3 == 0).withColumn(
                    "name", F.concat(F.col("name"), F.lit("_v2"))
                ),
            )
        ],
        tx_time="2024-01-01 00:00:02",
    )
    eng.submit_tx(
        [Delete("nations", nation.filter(F.col("id") % 5 == 0).select("id"))],
        tx_time="2024-01-01 00:00:03",
    )
    return (
        eng.db()
        .changes("nations", since="2024-01-01 00:00:01")
        .select("id", "name", "_change")
        .orderBy("id", "_change")
    )


@query(
    "engine_dml_delete_portion",
    oracle="""
    SELECT 'apr' AS probe, n_nationkey AS id, n_name AS name
    FROM nation WHERE n_regionkey <> 2
    UNION ALL
    SELECT 'jul', n_nationkey, n_name FROM nation
    ORDER BY probe, id
    """,
)
def engine_dml_delete_portion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETE ... FOR PORTION OF APPLICATION_TIME through the engine:
    the deletion covers only [Mar, Jun), so an April read hides the
    deleted rows (regionkey 2) while a July read sees every original
    row again — the bounded tombstone only shadows the periods it
    covers (SQL:2011 portion delete), driver-gated."""
    from core2_spark.engine import Engine, Put

    nation = _nation_rows(spark, sf_dir)
    eng = Engine(spark, tempfile.mkdtemp(prefix="engine_q_delpor_"))
    eng.submit_tx(
        [Put("nations", nation, app_start="2024-01-01 00:00:00")],
        tx_time="2024-01-01 00:00:01",
    )
    eng.sql_dml(
        "DELETE FROM nations FOR PORTION OF APPLICATION_TIME "
        "FROM '2024-03-01 00:00:00' TO '2024-06-01 00:00:00' "
        "WHERE regionkey = 2",
        tx_time="2024-01-01 00:00:02",
    )
    db = eng.db()
    apr = db.sql(
        "SELECT id, name FROM nations", app_time="2024-04-01 00:00:00"
    ).withColumn("probe", F.lit("apr"))
    jul = db.sql(
        "SELECT id, name FROM nations", app_time="2024-07-01 00:00:00"
    ).withColumn("probe", F.lit("jul"))
    return apr.unionByName(jul).select("probe", "id", "name").orderBy("probe", "id")


@query(
    "engine_replica_cdc_roundtrip",
    oracle="""
    SELECT n_nationkey AS id,
           CASE WHEN n_nationkey % 3 = 0 THEN n_name || '_v2' ELSE n_name END
               AS name,
           CAST(CASE WHEN n_nationkey % 3 = 0 THEN 2 ELSE 1 END AS BIGINT)
               AS n_versions
    FROM nation
    WHERE n_nationkey % 5 <> 0
    ORDER BY id
    """,
)
def engine_replica_cdc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§3.3 log shipping, driver-gated: a SOURCE engine ingests puts,
    an update and a delete; a REPLICA engine applies the source's
    ``changes()`` feed in two disjoint (since, until] slices
    (``Engine.apply_changes`` — the follower side of the CDC
    boundary).  The answer is read from the REPLICA: current state
    joined with per-id version counts from its replicated history, so
    both the visible state and the full bitemporal log must have
    shipped faithfully for the oracle to match."""
    from core2_spark.engine import Delete, Engine, Put

    nation = _nation_rows(spark, sf_dir)
    src = Engine(spark, tempfile.mkdtemp(prefix="engine_q_cdc_src_"))
    dst = Engine(spark, tempfile.mkdtemp(prefix="engine_q_cdc_dst_"))
    src.submit_tx([Put("nations", nation)], tx_time="2024-01-01 00:00:01")
    src.submit_tx(
        [
            Put(
                "nations",
                nation.filter(F.col("id") % 3 == 0).withColumn(
                    "name", F.concat(F.col("name"), F.lit("_v2"))
                ),
            )
        ],
        tx_time="2024-01-01 00:00:02",
    )
    src.submit_tx(
        [Delete("nations", nation.filter(F.col("id") % 5 == 0).select("id"))],
        tx_time="2024-01-01 00:00:03",
    )

    feed = src.db()
    dst.apply_changes(
        "nations",
        feed.changes(
            "nations", since="2023-12-31", until="2024-01-01 00:00:01"
        ),
    )
    dst.apply_changes(
        "nations", feed.changes("nations", since="2024-01-01 00:00:01")
    )

    db = dst.db()
    versions = (
        db.history("nations").groupBy("id").agg(F.count("*").alias("n_versions"))
    )
    return (
        db.table("nations")
        .join(versions, "id")
        .select("id", "name", "n_versions")
        .orderBy("id")
    )


@query(
    "engine_speculative_with_tx",
    oracle="""
    SELECT n_nationkey AS id,
           CASE WHEN n_nationkey % 3 = 0 THEN n_name || '_spec' ELSE n_name END
               AS name,
           (n_nationkey % 3 = 0) AS speculative
    FROM nation
    WHERE n_nationkey % 5 <> 0
    ORDER BY id
    """,
)
def engine_speculative_with_tx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Speculative transactions (Snapshot.with_tx — the reference
    lineage's what-if surface): commit a base table, then layer an
    UNCOMMITTED update + delete over the basis and answer from the
    speculative snapshot via Snapshot.sql.  The oracle reconstructs
    the what-if state in plain SQL; determinism is trivial since
    nothing concurrent exists, and the engine's real state is
    untouched (asserted by reading the live head too)."""
    from pyspark.sql import functions as FF

    from core2_spark.engine import Delete, Engine, Put

    nation = _nation_rows(spark, sf_dir)
    eng = Engine(spark, tempfile.mkdtemp(prefix="engine_q_spec_"))
    eng.submit_tx([Put("nations", nation)], tx_time="2024-01-01 00:00:01")

    spec = eng.db().with_tx(
        [
            Put(
                "nations",
                nation.filter(FF.col("id") % 3 == 0).withColumn(
                    "name", FF.concat(FF.col("name"), FF.lit("_spec"))
                ),
            ),
            Delete("nations", nation.filter(FF.col("id") % 5 == 0).select("id")),
        ]
    )
    out = spec.sql(
        """
        SELECT id, name,
               right(name, 5) = '_spec' AS speculative
        FROM nations ORDER BY id
        """
    )
    # the engine's committed state must be untouched by the overlay
    assert eng.db().table("nations").count() == nation.count()
    return out


@query(
    "engine_mview_incremental",
    oracle="""
    WITH f AS (
        SELECT CASE WHEN o_custkey % 20 = 0 THEN 'X'
                    ELSE o_orderstatus END AS status,
               CAST(o_totalprice AS DECIMAL(18,2))
                   + CASE WHEN o_custkey % 10 = 0 THEN 100 ELSE 0 END AS price
        FROM orders WHERE o_custkey % 13 <> 0
    )
    SELECT status, COUNT(*) AS n,
           ROUND(CAST(SUM(price) AS DOUBLE), 2) AS total
    FROM f GROUP BY status ORDER BY status
    """,
)
def engine_mview_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized view through the real engine write
    path (mviews.py): ingest orders, materialize a per-status revenue
    view, then commit a mixed transaction (price updates, status
    moves, deletes) and REFRESH — the incremental path is asserted
    (mode == 'incremental'), so a silent fall-back to full recompute
    fails the gate rather than hiding.  Prices ride DECIMAL(18,2)
    end-to-end so the maintained sums are exact in both engines.

    The oracle reconstructs the post-transaction state directly from
    `orders`; matching hashes prove the maintained view equals a
    from-scratch aggregate of current state."""
    from core2_spark.catalog import load_table
    from core2_spark.engine import Delete, Engine, Put

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("id"),
        F.col("o_custkey").alias("cust"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    eng = Engine(spark, tempfile.mkdtemp(prefix="engine_q_mv_"))
    eng.submit_tx([Put("orders", o)], tx_time="2024-01-01 00:00:01")
    eng.create_materialized_view(
        "rev", "orders", ["status"], {"n": ("count", "*"), "total": ("sum", "price")}
    )
    updates = (
        o.filter(F.col("cust") % 10 == 0)
        .withColumn("price", F.col("price") + F.lit(100).cast("decimal(18,2)"))
        .withColumn(
            "status",
            F.when(F.col("cust") % 20 == 0, "X").otherwise(F.col("status")),
        )
    )
    eng.submit_tx(
        [
            Put("orders", updates),
            Delete("orders", o.filter(F.col("cust") % 13 == 0).select("id")),
        ],
        tx_time="2024-01-01 00:00:02",
    )
    stats = eng.refresh_materialized_view("rev")
    assert stats["mode"] == "incremental", stats
    return (
        eng.materialized_view("rev")
        .select(
            "status",
            "n",
            F.round(F.col("total").cast("double"), 2).alias("total"),
        )
        .orderBy("status")
    )


@query(
    "engine_sql_basis_now",
    oracle="""
    SELECT n_nationkey AS id, n_name AS name,
           DATE '2024-03-05' AS asof_day,
           TRUE AS same_day
    FROM nation WHERE n_nationkey < 10 ORDER BY id
    """,
)
def engine_sql_basis_now(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeatable 'now' (SURVEY §2.8): CURRENT_DATE/CURRENT_TIMESTAMP
    through Snapshot.sql are the BASIS clock, never the wall clock —
    the oracle hard-codes the transaction date, so a wall-clock leak
    hash-mismatches on any day except the fixture's."""
    from core2_spark.engine import Engine, Put

    nation = _nation_rows(spark, sf_dir)
    eng = Engine(spark, tempfile.mkdtemp(prefix="engine_q_now_"))
    eng.submit_tx([Put("nations", nation)], tx_time="2024-03-05 12:00:00")
    return eng.db().sql(
        """
        SELECT id, name, CURRENT_DATE AS asof_day,
               CAST(CURRENT_TIMESTAMP AS DATE) = CURRENT_DATE AS same_day
        FROM nations WHERE id < 10 ORDER BY id
        """
    )


@query(
    "engine_vacuum_partition_drop",
    oracle="""
    SELECT n_nationkey AS id,
           CASE WHEN n_nationkey % 3 = 0 THEN n_name || '_v3'
                WHEN n_nationkey % 2 = 0 THEN n_name || '_v2'
                ELSE n_name END AS name,
           CASE WHEN n_nationkey % 6 = 0 THEN 2
                WHEN n_nationkey % 2 = 0 THEN 1
                WHEN n_nationkey % 3 = 0 THEN 2
                ELSE 1 END AS n_versions
    FROM nation
    ORDER BY id
    """,
)
def engine_vacuum_partition_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-6 partition-wise retention: day-1 puts for every id,
    day-2 corrections for even ids, day-4 corrections for ids % 3 = 0,
    vacuum at a day-3 horizon.  Dropped: exactly the day-1 versions of
    even ids (closed on day 2, before the horizon).  Kept: every other
    day-1 version (closed on day 4 or never — after the horizon) and
    everything from day 2 on; day-4 rows are untouched file-for-file
    (post-horizon partition).  Returns per-id current name + surviving
    version count; the oracle derives both from the fixture."""
    from core2_spark.engine import Engine, Put

    nation = _nation_rows(spark, sf_dir)
    eng = Engine(spark, tempfile.mkdtemp(prefix="engine_q_vac_"))
    eng.submit_tx([Put("nations", nation)], tx_time="2024-01-01 00:00:01")
    eng.submit_tx(
        [
            Put(
                "nations",
                nation.filter(F.col("id") % 2 == 0).withColumn(
                    "name", F.concat(F.col("name"), F.lit("_v2"))
                ),
            )
        ],
        tx_time="2024-01-02 00:00:01",
    )
    eng.submit_tx(
        [
            Put(
                "nations",
                nation.filter(F.col("id") % 3 == 0).withColumn(
                    "name", F.concat(F.col("name"), F.lit("_v3"))
                ),
            )
        ],
        tx_time="2024-01-04 00:00:01",
    )
    eng.vacuum("nations", older_than="2024-01-03 00:00:00")
    db = eng.db()
    cur = db.table("nations").select("id", "name")
    counts = (
        db.history("nations")
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("int").alias("n_versions"))
    )
    return cur.join(counts, "id").orderBy("id")


@query(
    "engine_concurrent_writers",
    oracle="""
    SELECT n_nationkey AS id,
           CASE WHEN n_nationkey % 2 = 0 THEN 'even-writer'
                ELSE 'odd-writer' END AS written_by
    FROM nation
    ORDER BY id
    """,
)
def engine_concurrent_writers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-6 optimistic concurrency: two Engine handles over one root
    interleave commits with writer_retries — each detects the other's
    advance, refreshes, and replays, with NO manual coordination.  The
    final state must equal the serial union (the log is a total
    order)."""
    from core2_spark.engine import Engine, Put

    nation = _nation_rows(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="engine_q_occ_")
    a = Engine(spark, root, writer_retries=5)
    b = Engine(spark, root, writer_retries=5)
    evens = nation.filter(F.col("id") % 2 == 0).select(
        "id", F.lit("even-writer").alias("written_by")
    )
    odds = nation.filter(F.col("id") % 2 == 1).select(
        "id", F.lit("odd-writer").alias("written_by")
    )
    # alternate writers: every commit staleness-trips the other handle
    a.submit_tx([Put("claims", evens.filter(F.col("id") < 10))])
    b.submit_tx([Put("claims", odds.filter(F.col("id") < 10))])
    a.submit_tx([Put("claims", evens.filter(F.col("id") >= 10))])
    b.submit_tx([Put("claims", odds.filter(F.col("id") >= 10))])
    b.refresh()
    return b.db().table("claims").select("id", "written_by").orderBy("id")


@query(
    "engine_sql_with_recursive",
    oracle="""
    WITH RECURSIVE nhier AS (
        SELECT n_nationkey AS id,
               CASE WHEN n_nationkey % 5 = 0 THEN NULL
                    ELSE n_nationkey - 1 END AS parent
        FROM nation
    ),
    anc AS (
        SELECT id AS node, parent AS ancestor
        FROM nhier WHERE parent IS NOT NULL
        UNION ALL
        SELECT a.node, h.parent
        FROM anc a JOIN nhier h ON h.id = a.ancestor
        WHERE h.parent IS NOT NULL
    )
    SELECT node, COUNT(*) AS n_ancestors, MIN(ancestor) AS root
    FROM anc GROUP BY node ORDER BY node
    """,
)
def engine_sql_with_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`WITH RECURSIVE` on the engine's SQL surface (round 7; closes
    the last frontend gap vs core2's `:fixpoint`-reachable query
    algebra, README.adoc:13-15 / SURVEY §2.7+§3.1).  The dialect
    pre-pass compiles the recursive CTE into the semi-naive fixpoint
    operator; the SAME statement text runs natively in DuckDB as the
    oracle.  The hierarchy chains nations in groups of five (parent =
    id-1 except multiples of 5), so the closure has depths 1-4 and the
    per-node ancestor count + root are exact."""
    from core2_spark.engine import Engine, Put

    nation = _nation_rows(spark, sf_dir)
    eng = Engine(spark, tempfile.mkdtemp(prefix="engine_q_rcte_"))
    eng.submit_tx([Put("nations", nation)], tx_time="2024-01-01 00:00:01")
    return eng.db().sql(
        """
        WITH RECURSIVE nhier AS (
            SELECT id, CASE WHEN id % 5 = 0 THEN CAST(NULL AS BIGINT)
                            ELSE id - 1 END AS parent
            FROM nations
        ),
        anc AS (
            SELECT id AS node, parent AS ancestor
            FROM nhier WHERE parent IS NOT NULL
            UNION ALL
            SELECT a.node, h.parent
            FROM anc a JOIN nhier h ON h.id = a.ancestor
            WHERE h.parent IS NOT NULL
        )
        SELECT node, COUNT(*) AS n_ancestors, MIN(ancestor) AS root
        FROM anc GROUP BY node ORDER BY node
        """
    )


@query(
    "engine_sql_setting_defaults",
    oracle="""
    SELECT n_nationkey AS id, n_name AS name_then,
           CASE WHEN n_nationkey % 3 = 0 THEN n_name || '_v2' ELSE n_name END
               AS name_now
    FROM nation
    ORDER BY id
    """,
)
def engine_sql_setting_defaults(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``SETTING DEFAULT SYSTEM_TIME AS OF`` (the reference's
    statement-scoped default clocks): the bare reference reads the
    pinned pre-update state while an explicit per-table FOR clause in
    the SAME statement still overrides the default — both joined and
    hash-verified against the declaratively derived versions."""
    from core2_spark.engine import Engine, Put

    nation = _nation_rows(spark, sf_dir)
    eng = Engine(spark, tempfile.mkdtemp(prefix="engine_q_setting_"))
    eng.submit_tx([Put("nations", nation)], tx_time="2024-01-01 00:00:01")
    eng.submit_tx(
        [
            Put(
                "nations",
                nation.filter(F.col("id") % 3 == 0).withColumn(
                    "name", F.concat(F.col("name"), F.lit("_v2"))
                ),
            )
        ],
        tx_time="2024-01-01 00:00:02",
    )
    return eng.db().sql(
        """
        SETTING DEFAULT SYSTEM_TIME AS OF '2024-01-01 00:00:01'
        SELECT t.id AS id, t.name AS name_then, n.name AS name_now
        FROM nations t
        JOIN nations FOR SYSTEM_TIME AS OF TIMESTAMP '2024-01-01 00:00:02' n
          ON n.id = t.id
        ORDER BY t.id
        """
    )


@query(
    "engine_tx_assert",
    oracle="""
    SELECT n_nationkey AS id, n_name AS name FROM nation
    UNION ALL
    SELECT 100 AS id, 'guarded-insert' AS name
    ORDER BY id
    """,
)
def engine_tx_assert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASSERT transaction statements (the reference's assert tx op,
    README.adoc:13-15): a failing assert aborts its whole transaction
    atomically (the co-submitted INSERT leaves zero rows), a passing
    uniqueness guard commits — the oracle derives the surviving state
    as base ∪ the one guarded insert."""
    from core2_spark.engine import Engine, Put, TxAssertionError

    nation = _nation_rows(spark, sf_dir).select("id", "name")
    eng = Engine(spark, tempfile.mkdtemp(prefix="engine_q_assert_"))
    eng.submit_tx([Put("nations", nation)], tx_time="2024-01-01 00:00:01")
    try:
        eng.sql_dml_many(
            [
                "INSERT INTO nations (id, name) VALUES (99, 'phantom')",
                "ASSERT NOT EXISTS (SELECT 1 FROM nations WHERE id = 0), "
                "'id 0 already exists'",
            ],
            tx_time="2024-01-01 00:00:02",
        )
        raise AssertionError("assert should have aborted the tx")
    except TxAssertionError:
        pass
    eng.sql_dml_many(
        [
            "ASSERT NOT EXISTS (SELECT 1 FROM nations WHERE id = 100)",
            "INSERT INTO nations (id, name) VALUES (100, 'guarded-insert')",
        ],
        tx_time="2024-01-01 00:00:03",
    )
    return eng.db().sql("SELECT id, name FROM nations ORDER BY id")


@query(
    "engine_dml_patch",
    oracle="""
    WITH base AS (
        SELECT n_nationkey AS id, n_name AS name, n_regionkey AS regionkey
        FROM nation
    ),
    p(id, name, has_name, regionkey, has_rk, note) AS (
        VALUES (3, 'patched-three', TRUE, NULL, FALSE, 'hot'),
               (7, NULL, FALSE, NULL, FALSE, 'cold'),
               (99, 'brand-new', TRUE, 1, TRUE, 'fresh')
    )
    SELECT COALESCE(b.id, p.id) AS id,
           CASE WHEN p.id IS NOT NULL AND p.has_name THEN p.name
                ELSE b.name END AS name,
           CASE WHEN p.id IS NOT NULL AND p.has_rk THEN p.regionkey
                ELSE b.regionkey END AS regionkey,
           p.note AS note
    FROM base b FULL OUTER JOIN p ON b.id = p.id
    ORDER BY id
    """,
)
def engine_dml_patch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PATCH INTO .. RECORDS through the engine log (the reference's
    ``patchDocs`` tx op, README.adoc:13-15): partial documents merge
    into the current visible versions — id 3 updates one key and gains
    a NEW column, id 7 touches only the new column (every other key
    retained), id 99 is absent so the patch inserts it.  The oracle
    replays merge semantics with an explicit per-key mentioned mask
    over plain SELECTs (DuckDB has no PATCH — an independent
    derivation), including the NULL-for-untouched-rows widened
    column."""
    from core2_spark.engine import Engine, Put

    nation = _nation_rows(spark, sf_dir)
    eng = Engine(spark, tempfile.mkdtemp(prefix="engine_q_patch_"))
    eng.submit_tx([Put("nations", nation)], tx_time="2024-01-01 00:00:01")
    eng.sql_dml(
        "PATCH INTO nations RECORDS "
        "{id: 3, name: 'patched-three', note: 'hot'}, "
        "{id: 7, note: 'cold'}, "
        "{id: 99, name: 'brand-new', regionkey: 1, note: 'fresh'}",
        tx_time="2024-01-01 00:00:02",
    )
    return eng.db().sql(
        "SELECT id, name, regionkey, note FROM nations ORDER BY id"
    )


@query(
    "engine_dml_merge",
    oracle="""
    WITH base AS (
        SELECT n_nationkey AS id, n_name AS name, n_regionkey AS regionkey
        FROM nation
    ),
    s AS (
        SELECT id + 10 AS id, lower(name) AS name, regionkey FROM base
    )
    SELECT b.id,
           CASE WHEN s.id IS NOT NULL AND s.regionkey <> 2
                THEN s.name ELSE b.name END AS name,
           b.regionkey
    FROM base b LEFT JOIN s ON b.id = s.id
    WHERE s.id IS NULL OR s.regionkey <> 2
    UNION ALL
    SELECT s.id, s.name, s.regionkey
    FROM s LEFT JOIN base b ON b.id = s.id
    WHERE b.id IS NULL AND s.regionkey <> 4
    ORDER BY id
    """,
)
def engine_dml_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO through the engine log: the source is a shifted
    projection of the target itself (read from the pre-tx snapshot),
    with a conditional DELETE, a catch-all UPDATE, and a conditional
    INSERT — all three WHEN kinds in one atomic transaction.  The
    oracle replays the same first-match-wins semantics as plain
    SELECTs over nation (DuckDB 1.0 has no MERGE, so this is a true
    independent derivation, not the same code path)."""
    from core2_spark.engine import Engine, Put

    nation = _nation_rows(spark, sf_dir)
    eng = Engine(spark, tempfile.mkdtemp(prefix="engine_q_merge_"))
    eng.submit_tx([Put("nations", nation)], tx_time="2024-01-01 00:00:01")
    eng.sql_dml(
        """
        MERGE INTO nations USING (
            SELECT id + 10 AS id, lower(name) AS name, regionkey
            FROM nations
        ) s ON nations.id = s.id
        WHEN MATCHED AND s.regionkey = 2 THEN DELETE
        WHEN MATCHED THEN UPDATE SET name = s.name
        WHEN NOT MATCHED AND s.regionkey <> 4 THEN
            INSERT (id, name, regionkey) VALUES (s.id, s.name, s.regionkey)
        """,
        tx_time="2024-01-01 00:00:02",
    )
    return eng.db().sql(
        "SELECT id, name, regionkey FROM nations ORDER BY id"
    )


@query(
    "engine_dml_records_mixed_types",
    oracle="""
    SELECT n_nationkey AS id, n_name AS name,
           CASE WHEN n_nationkey % 2 = 0 THEN CAST(n_nationkey AS DOUBLE)
                ELSE n_nationkey + 0.5 END AS x,
           CASE WHEN n_nationkey >= 10 THEN NULL
                WHEN n_nationkey % 2 = 1 THEN CAST(n_nationkey * 2 AS DOUBLE)
                ELSE n_nationkey * 2 + 0.25 END AS y
    FROM nation
    ORDER BY id
    """,
)
def engine_dml_records_mixed_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECORDS batches whose keys MIX int and float literals across
    records (x: even ids are bare ints, odd ids carry .5) must promote
    to DOUBLE with the raw ints coerced — the reference's dynamic
    typing accepts the batch; aborting the tx was a bug.  Exercised on
    both the INSERT RECORDS and PATCH RECORDS paths."""
    from core2_spark.engine import Engine

    rows = sorted(
        (r["id"], r["name"])
        for r in _nation_rows(spark, sf_dir).collect()  # 25 rows, bounded
    )
    eng = Engine(spark, tempfile.mkdtemp(prefix="engine_q_recmix_"))
    recs = ", ".join(
        f"{{id: {i}, name: '{n}', x: {i if i % 2 == 0 else i + 0.5}}}"
        for i, n in rows
    )
    eng.sql_dml(f"INSERT INTO t RECORDS {recs}", tx_time="2024-01-01 00:00:01")
    patch = ", ".join(
        f"{{id: {i}, y: {i * 2 if i % 2 == 1 else i * 2 + 0.25}}}"
        for i, _ in rows
        if i < 10
    )
    eng.sql_dml(f"PATCH INTO t RECORDS {patch}", tx_time="2024-01-01 00:00:02")
    return eng.db().sql("SELECT id, name, x, y FROM t ORDER BY id")


@query(
    "engine_tx_assert_clock_rollback",
    oracle="""
    SELECT n_nationkey AS id, n_name AS name FROM nation
    UNION ALL
    SELECT n_nationkey + 100 AS id, n_name AS name
    FROM nation WHERE n_regionkey = 2
    ORDER BY id
    """,
)
def engine_tx_assert_clock_rollback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """An aborted ASSERT must leave NO trace — including the logical
    transaction clock, which _next_tx_time advances before op
    expansion: re-submitting with the SAME explicit tx_time has to
    succeed (previously it was spuriously rejected as 'at or before
    the head')."""
    from core2_spark.engine import Engine, Put, TxAssertionError

    nation = _nation_rows(spark, sf_dir)
    eng = Engine(spark, tempfile.mkdtemp(prefix="engine_q_clock_"))
    eng.submit_tx([Put("t", nation)], tx_time="2024-01-01 00:00:01")
    try:
        eng.sql_dml_many(
            [
                "ASSERT (SELECT COUNT(*) FROM t) = 0, 'expected empty'",
                "INSERT INTO t SELECT id + 100 AS id, name, regionkey "
                "FROM t",
            ],
            tx_time="2024-01-01 00:00:02",
        )
    except TxAssertionError:
        pass  # aborted: zero rows written, clock rolled back
    eng.sql_dml_many(
        [
            "ASSERT (SELECT COUNT(*) FROM t) > 0",
            "INSERT INTO t SELECT id + 100 AS id, name, regionkey "
            "FROM t WHERE regionkey = 2",
        ],
        tx_time="2024-01-01 00:00:02",  # SAME time as the aborted tx
    )
    return eng.db().sql("SELECT id, name FROM t ORDER BY id")
