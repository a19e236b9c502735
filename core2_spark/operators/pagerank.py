"""PageRank as a bounded-plan iterative operator (SURVEY §5.6 graph
shapes; the reference-class engines run this via recursion).

The round-6 query unrolled a FIXED 8 iterations into one Catalyst plan;
fine at 8, but plan depth — and with it analysis time — grows linearly
in the iteration count, so a parameterized iteration count would blow
up planning long before data size matters.  This operator applies the
same discipline as ``operators.recursion.fixpoint``: the rank state is
``localCheckpoint``'d every ``checkpoint_every`` iterations, truncating
lineage so the standing plan never exceeds a constant number of
iteration steps regardless of ``iterations``.

Scale shape: each iteration is one equi-join of the edge list with the
rank state plus one aggregation — rank state stays distributed end to
end; on a cluster the edge list would be pre-partitioned (bucketed) by
``src`` so the per-iteration join co-locates.  The only driver-side
value is the node count (one scalar).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    iterations: int = 8,
    damping: float = 0.85,
    checkpoint_every: int = 6,
) -> DataFrame:
    """Damped power iteration over ``nodes("node")`` and
    ``edges("src", "dst")``.  Returns ``(node, rank)``; dangling mass
    follows the teleport-only convention (rank flows only along
    edges), matching the unrolled-SQL oracle shape."""
    n = nodes.count()  # one scalar to the driver, never row data
    deg = edges.groupBy("src").agg(F.count("*").alias("d"))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for i in range(iterations):
        contrib = (
            edges.join(ranks, edges.src == ranks.node)
            .join(deg, "src")
            .select("dst", (F.col("rank") / F.col("d")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = nodes.join(contrib, nodes.node == contrib.dst, "left").select(
            "node",
            (
                F.lit((1.0 - damping) / n)
                + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))
            ).alias("rank"),
        )
        if (i + 1) % checkpoint_every == 0 and (i + 1) < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks
