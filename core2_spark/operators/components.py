"""Connected components via iterative min-label propagation
(SURVEY.md §2.7 fixpoint family; §2.12 dedup-cluster canonicalization).

Near-dup pipelines (MinHash/SimHash/cosine LSH) emit PAIRS; dedup
needs CLUSTERS — "keep one document per component of the similarity
graph".  Components is the textbook fixpoint Spark job: every node
starts labeled with itself, each iteration every node takes the min
label over itself and its neighbors, convergence in O(diameter)
rounds.  Near-dup graphs are near-cliques (tiny diameter), so a
handful of iterations closes even planet-scale corpora.

Scale shape per iteration: one equi-join (labels × edges) + one
groupBy-min — both shuffle on node id, no driver data; lineage is
checkpoint-truncated like `operators.recursion.fixpoint`.  The
convergence check is a cheap count of improved labels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_iterations: int = 50,
    checkpoint_every: int = 4,
) -> DataFrame:
    """(node, component) for every node in ``edges`` (undirected);
    component = the minimum node id reachable from the node."""
    und = edges.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    und = und.unionByName(
        und.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    labels = (
        und.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    for i in range(max_iterations):
        neighbor_min = (
            und.join(labels, und["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("component").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels["node"] == neighbor_min["src"], "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nmin"), F.col("component"))
                ).alias("component"),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint(eager=True)
        improved = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") < F.col("o.component"))
            .isEmpty()
        )
        labels = new_labels
        if improved:  # no label got smaller → fixpoint
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} iterations"
    )
