"""WatDiv-shaped graph-pattern queries (SURVEY.md §5.6).

The reference benchmarked graph workloads with WatDiv [upstream: core2
`modules/bench`] — star, linear-path, and complex join topologies over
an entity graph.  core2 answers those through Datalog triple patterns
compiled onto the same relational algebra (reference README.adoc:15);
we do the identical thing: the star and path queries below are written
in the engine's Datalog DSL (`datalog.py`) and compile to the same
broadcast/shuffle join plans Catalyst gives SQL, checked against the
DuckDB oracle like every other query.

Scale notes: star centers broadcast their small satellites; the
linear path chains shuffles on each hop key (the unavoidable shape);
the co-occurrence self-join aggregates within order groups before
pairing, so pair explosion is bounded by per-order line counts, not
table size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from core2_spark import datalog as dl
from core2_spark.catalog import load_tables
from core2_spark.queries.registry import query


@query(
    "graph_star_supplier_profile",
    oracle="""
    SELECT s.s_name, n.n_name,
           CAST(COUNT(DISTINCT l.l_partkey) AS BIGINT) AS n_parts
    FROM supplier s
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN lineitem l ON l.l_suppkey = s.s_suppkey
    WHERE s.s_acctbal > 3000.0
    GROUP BY s.s_name, n.n_name
    ORDER BY n_parts DESC, s_name
    LIMIT 20
    """,
)
def graph_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WatDiv star shape: one center entity (supplier) with edges to
    its nation and shipped parts, via Datalog triple patterns."""
    return (
        dl.q(
            spark,
            sf_dir,
            {
                "find": ["?sname", "?nname", ("count-distinct", "?part", "n_parts")],
                "where": [
                    (
                        "supplier",
                        {
                            "s_suppkey": "?s",
                            "s_name": "?sname",
                            "s_nationkey": "?nk",
                            "s_acctbal": "?bal",
                        },
                    ),
                    ("nation", {"n_nationkey": "?nk", "n_name": "?nname"}),
                    ("lineitem", {"l_suppkey": "?s", "l_partkey": "?part"}),
                    (">", "?bal", 3000.0),
                ],
            },
        )
        .select(
            F.col("sname").alias("s_name"),
            F.col("nname").alias("n_name"),
            "n_parts",
        )
        .orderBy(F.col("n_parts").desc(), F.col("s_name"))
        .limit(20)
    )


@query(
    "graph_linear_path_4hop",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_paths,
           CAST(COUNT(DISTINCT c.c_custkey) AS BIGINT) AS n_customers
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE r.r_name = 'REGION_0'
      AND l.l_quantity > 45
    """,
)
def graph_linear_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WatDiv linear shape: 4-hop path region→nation→customer→orders→
    lineitem with endpoint filters, as chained Datalog patterns."""
    return dl.q(
        spark,
        sf_dir,
        {
            "find": [("count", "?l", "n_paths"), ("count-distinct", "?c", "n_customers")],
            "where": [
                ("region", {"r_regionkey": "?r", "r_name": "REGION_0"}),
                ("nation", {"n_regionkey": "?r", "n_nationkey": "?n"}),
                ("customer", {"c_nationkey": "?n", "c_custkey": "?c"}),
                ("orders", {"o_custkey": "?c", "o_orderkey": "?o"}),
                (
                    "lineitem",
                    {"l_orderkey": "?o", "l_linenumber": "?l", "l_quantity": "?q"},
                ),
                (">", "?q", 45),
            ],
        },
    )


@query(
    "graph_copurchase_pairs",
    oracle="""
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
    JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY a.l_partkey, b.l_partkey
    HAVING COUNT(*) >= 2
    ORDER BY n_orders DESC, part_a, part_b
    LIMIT 25
    """,
)
def graph_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-occurrence join (the graph-analytics edge-building shape):
    part pairs appearing in the same order.  Dedup to distinct
    (order, part) BEFORE the self-join so pair counts are per-order
    and the join fan-out is bounded by order size; the `<` predicate
    halves the pair space.  At 100 TB the same plan holds: one shuffle
    on l_orderkey, per-order pair generation, re-aggregate on pairs."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    op = li.select("l_orderkey", "l_partkey").distinct()
    a = op.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_a"))
    b = op.select(
        F.col("l_orderkey").alias("b_orderkey"), F.col("l_partkey").alias("part_b")
    )
    return (
        a.join(
            b,
            (F.col("l_orderkey") == F.col("b_orderkey"))
            & (F.col("part_a") < F.col("part_b")),
        )
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
        .orderBy(F.col("n_orders").desc(), F.col("part_a"), F.col("part_b"))
        .limit(25)
    )


@query(
    "graph_connected_components",
    oracle="""
    WITH RECURSIVE und AS (
        SELECT doc_id AS a, doc_id + 1 AS b FROM documents
        WHERE doc_id % 5 < 4
          AND doc_id + 1 IN (SELECT doc_id FROM documents)
        UNION ALL
        SELECT doc_id + 1, doc_id FROM documents
        WHERE doc_id % 5 < 4
          AND doc_id + 1 IN (SELECT doc_id FROM documents)
    ),
    reach AS (
        SELECT DISTINCT a AS node, a AS label FROM und
        UNION
        SELECT u.b, r.label FROM reach r JOIN und u ON u.a = r.node
    )
    SELECT node, MIN(label) AS component
    FROM reach GROUP BY node ORDER BY node
    """,
)
def graph_connected_components_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components by min-label propagation
    (operators/components.py) over a deterministic chain graph
    (doc_id → doc_id+1 within groups of five — multi-hop, so
    convergence genuinely iterates).  This is the dedup-cluster
    canonicalization step: near-dup PAIRS become one component label
    per document.  Oracle: WITH RECURSIVE reachability + MIN."""
    from core2_spark.operators.components import connected_components

    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    ids = d.select("doc_id")
    edges = (
        d.filter(F.col("doc_id") % 5 < 4)
        .select(F.col("doc_id").alias("a_id"), (F.col("doc_id") + 1).alias("b_id"))
        .join(ids.select(F.col("doc_id").alias("b_id")), "b_id", "left_semi")
    )
    return connected_components(edges).orderBy("node")


def _pagerank_oracle() -> str:
    """Unrolled 8-iteration PageRank in plain SQL (recursive CTEs
    can't aggregate in the recursive term, so the oracle unrolls)."""
    head = """
    WITH edges AS (
        SELECT n_nationkey AS src, (n_nationkey * 3 + 1) % 25 AS dst FROM nation
        UNION ALL
        SELECT n_nationkey, (n_nationkey * n_nationkey + 2) % 25 FROM nation
    ),
    deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
    pr0 AS (SELECT n_nationkey AS node, 1.0 / 25 AS rank FROM nation)"""
    steps = []
    for k in range(1, 9):
        steps.append(f"""
    pr{k} AS (
        SELECT n.n_nationkey AS node,
               0.15 / 25 + 0.85 * COALESCE(SUM(p.rank / deg.d), 0) AS rank
        FROM nation n
        LEFT JOIN edges e ON e.dst = n.n_nationkey
        LEFT JOIN pr{k - 1} p ON p.node = e.src
        LEFT JOIN deg ON deg.src = e.src
        GROUP BY n.n_nationkey
    )""")
    return (
        head + "," + ",".join(steps)
        + """
    SELECT node, ROUND(rank + 1e-9, 6) AS pagerank
    FROM pr8 ORDER BY node
    """
    )


@query("graph_pagerank_fixed_iterations", oracle=_pagerank_oracle())
def graph_pagerank_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (round 6) — the canonical ITERATIVE dataflow the
    reference-class engines run via recursion: 8 damped power
    iterations over a deterministic 25-node / 50-edge graph (one bijective and one
    quadratic — hence non-uniform in-degree — edge map)
    on nation (fixed across scale factors), driver-loop composing pure
    DataFrame steps.  Scale shape: each iteration is one equi-join on
    dst + one aggregation — rank state stays distributed, edges would
    be pre-partitioned by dst on a cluster; the oracle unrolls the
    same 8 steps in SQL."""
    n = load_tables(spark, sf_dir, ("nation",))["nation"]
    nodes = n.select(F.col("n_nationkey").alias("node"))
    edges = (
        n.select(
            F.col("n_nationkey").alias("src"),
            ((F.col("n_nationkey") * 3 + 1) % 25).alias("dst"),
        )
        .unionAll(
            n.select(
                F.col("n_nationkey").alias("src"),
                ((F.col("n_nationkey") * F.col("n_nationkey") + 2) % 25).alias("dst"),
            )
        )
    )
    from core2_spark.operators.pagerank import pagerank

    ranks = pagerank(nodes, edges, iterations=8)
    return ranks.select(
        "node", F.round(F.col("rank") + F.lit(1e-9), 6).alias("pagerank")
    ).orderBy("node")


@query(
    "graph_triangle_count",
    oracle="""
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
      SELECT a.l_partkey AS a, b.l_partkey AS b
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    edges AS (SELECT a, b FROM pairs GROUP BY a, b HAVING COUNT(*) >= 2)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM edges) AS n_edges,
           CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM edges e1
    JOIN edges e2 ON e2.a = e1.b
    JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed triangle count over the support-thresholded
    co-purchase graph: edges are part pairs co-occurring in >= 2
    orders (the support prune keeps the graph sparse at ANY corpus
    size — the same discipline real co-occurrence pipelines use), and
    triangles are counted by the ordered wedge join (a<b<c once, so
    each triangle counts exactly once, no division by 6).  Two hash
    joins on edge endpoints; degree skew is bounded by the support
    threshold.  Output: one exact (n_edges, n_triangles) row."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    op = li.select("l_orderkey", "l_partkey").distinct()
    a = op.select("l_orderkey", F.col("l_partkey").alias("a"))
    b = op.select(
        F.col("l_orderkey").alias("b_orderkey"), F.col("l_partkey").alias("b")
    )
    edges = (
        a.join(
            b,
            (F.col("l_orderkey") == F.col("b_orderkey"))
            & (F.col("a") < F.col("b")),
        )
        .groupBy("a", "b")
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= 2)
        .select("a", "b")
    )
    e1 = edges
    e2 = edges.select(F.col("a").alias("e2a"), F.col("b").alias("e2b"))
    e3 = edges.select(F.col("a").alias("e3a"), F.col("b").alias("e3b"))
    tri = (
        e1.join(e2, F.col("e2a") == F.col("b"))
        .join(e3, (F.col("e3a") == F.col("a")) & (F.col("e3b") == F.col("e2b")))
        .agg(F.count("*").alias("n_triangles"))
    )
    n_edges = edges.agg(F.count("*").alias("n_edges"))
    # 1x1 scalar combine (broadcast-trivial, same pattern as the TPC-H
    # global-total queries)
    return n_edges.crossJoin(tri)
