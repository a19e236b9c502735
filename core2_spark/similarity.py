"""Similarity search over embedding columns (SURVEY.md §2.12).

Two tiers, as the build contract asks:
- brute-force cosine top-k — the correctness baseline; a single
  linear scan with the (tiny) query vector folded into the plan as
  literals, then TakeOrderedAndProject.  O(N·d), no shuffle of the
  embedding table beyond the top-k reduction.
- LSH-bucketed (sign random projection) — the 100 TB path: bucket id
  computed per row in one scan; candidate search is an equi-join on
  bucket id (optionally multi-probe neighboring buckets), so pairwise
  math touches only same-bucket rows.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from core2_spark.functions.vectors import as_double, cosine, dot, l2_norm, random_projection_bits


def query_vector(df: DataFrame, id_col: str, vec_col: str, qid) -> list[float]:
    """Fetch one query embedding to the driver — a deliberate O(d)
    lookup (the query side of a kNN is a constant, broadcast into the
    plan as literals; this is not a data collect)."""
    row = df.filter(F.col(id_col) == qid).select(vec_col).head()
    if row is None:
        raise KeyError(f"no vector with {id_col}={qid}")
    return [float(x) for x in row[0]]


def brute_force_knn(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine similarity against a literal query vector."""
    q = F.array(*[F.lit(float(x)) for x in query])
    sim = cosine(as_double(F.col(vec_col)), q)
    return (
        df.select(F.col(id_col), F.round(sim, 6).alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )


def deterministic_planes(n_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    """Fixed random hyperplanes (seeded) — identical across runs and
    executors; small enough to inline as plan literals."""
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_bucketed_knn(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe_bits: int = 1,
) -> DataFrame:
    """Approximate top-k: only rows whose sign-projection bucket is
    within ``multiprobe_bits`` Hamming distance of the query's bucket
    are scored.  At scale, persist the bucket id as a partition/cluster
    column so the probe prunes files instead of scanning."""
    planes = deterministic_planes(n_planes, len(query))
    q_arr = np.array(query)
    q_bucket = 0
    for i, plane in enumerate(planes):
        if float(np.dot(q_arr, np.array(plane))) >= 0:
            q_bucket |= 1 << i
    bucketed = df.withColumn(
        "bucket", random_projection_bits(as_double(F.col(vec_col)), planes)
    )
    probe = bucketed.filter(
        F.bit_count(F.col("bucket").bitwiseXOR(F.lit(q_bucket))) <= multiprobe_bits
    )
    q = F.array(*[F.lit(float(x)) for x in query])
    sim = cosine(as_double(F.col(vec_col)), q)
    return (
        probe.select(F.col(id_col), F.round(sim, 6).alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )


def _centroids_from_seed_rows(
    df: DataFrame, n_clusters: int, id_col: str, vec_col: str
) -> list[list[float]]:
    """Deterministic coarse quantizer: the embeddings of the n lowest
    ids seed the centroids (IVF needs *stable* cell assignment more
    than optimal cells; swapping in k-means centroids is a local
    change).  O(n_clusters · d) driver memory."""
    rows = (
        df.orderBy(F.col(id_col)).limit(n_clusters).select(id_col, vec_col).collect()
    )
    return [[float(x) for x in r[1]] for r in rows]


def ivf_knn(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    n_clusters: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-flat approximate kNN: assign every row to its nearest
    centroid cell (one linear scan, centroids inlined as literals),
    then score only the ``nprobe`` cells nearest the query.

    At 100 TB the cell id is a partition/cluster column written at
    ingest, so probing reads only nprobe/n_clusters of the data —
    file-level pruning, no full scan per query."""
    import numpy as np  # local alias for clarity

    cents = _centroids_from_seed_rows(df, n_clusters, id_col, vec_col)
    cent_cols = [F.array(*[F.lit(float(x)) for x in c]) for c in cents]
    v = as_double(F.col(vec_col))
    dists = F.array(*[dot(v, c) for c in cent_cols])
    cell = (F.array_position(dists, F.array_max(dists)) - 1).cast("int")

    q_arr = np.array(query)
    q_sims = [float(np.dot(q_arr, np.array(c))) for c in cents]
    probe_cells = sorted(range(len(cents)), key=lambda i: -q_sims[i])[:nprobe]

    q = F.array(*[F.lit(float(x)) for x in query])
    sim = cosine(as_double(F.col(vec_col)), q)
    return (
        df.withColumn("cell", cell)
        .filter(F.col("cell").isin(probe_cells))
        .select(F.col(id_col), F.round(sim, 6).alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )


def embedding_cosine_near_duplicates(
    df: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space near-dup detection: LSH bucket equi-join (no
    cross join), verify cosine ≥ threshold within buckets."""
    sample = df.select(vec_col).head()
    dim = len(sample[0]) if sample else 0
    planes = deterministic_planes(n_planes, dim)
    bucketed = df.select(
        F.col(id_col),
        as_double(F.col(vec_col)).alias("v"),
        random_projection_bits(as_double(F.col(vec_col)), planes).alias("bucket"),
    )
    a = bucketed.select(
        F.col(id_col).alias("a_id"), F.col("v").alias("a_v"), "bucket"
    )
    b = bucketed.select(
        F.col(id_col).alias("b_id"), F.col("v").alias("b_v"), "bucket"
    )
    sim = dot(F.col("a_v"), F.col("b_v")) / (
        l2_norm(F.col("a_v")) * l2_norm(F.col("b_v"))
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", F.round(sim, 6).alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
        .distinct()
    )
