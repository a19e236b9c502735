"""Vector/embedding column functions (SURVEY.md §2.12 similarity
search).

Embeddings are `array<float>` columns; all math casts to double first
so results are engine-stable, then uses built-in higher-order functions
(F.aggregate / F.zip_with) — JVM-side, no Python in the loop.  At
100 TB the brute-force form is the verification baseline; the scale
path is LSH bucketing (similarity.py) which prunes the candidate set
before any pairwise math.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product via zip_with + aggregate (whole-stage codegen)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL when either side has zero norm."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def random_projection_bits(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-random-projection LSH bucket id: one bit per hyperplane
    (SimHash-style for dense vectors).  ``planes`` is a small constant
    broadcast into the plan as literals."""
    bit_cols = []
    for i, plane in enumerate(planes):
        proj = dot(vec, F.array(*[F.lit(float(p)) for p in plane]))
        bit_cols.append(F.when(proj >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    out = bit_cols[0]
    for b in bit_cols[1:]:
        out = out + b
    return out.cast("int")
