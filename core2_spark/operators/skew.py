"""Skew-aware join (SURVEY.md scale rules: "skewed keys → salting or
AQE skew-join").

AQE's skew-join split handles sort-merge skew automatically at
runtime; salting is the explicit fallback for the cases AQE can't
rewrite (e.g. aggregation hot keys, or broadcast-ineligible skewed
probe sides).  ``salted_join`` replicates the small side R times and
scatters the big side's hot keys across R salt buckets, turning one
straggler partition into R even ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on column ``on`` with salting.

    big gets a random-but-deterministic salt per row (hash of all its
    columns mod R — no RNG, so retried tasks produce identical rows);
    small is exploded to all R salts.  Join key: (on, salt).
    """
    salt = F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(salt_buckets))
    big_s = big.withColumn("_salt", salt)
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return big_s.join(small_s, [on, "_salt"], how).drop("_salt")


def salted_count_per_key(df: DataFrame, key: str, salt_buckets: int = 8) -> DataFrame:
    """Two-stage aggregation for a hot grouping key: partial count per
    (key, salt) then final per key — the map-side-combine pattern made
    explicit for pathological skew."""
    salt = F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(F.count("*").alias("_partial"))
    )
    return partial.groupBy(key).agg(F.sum("_partial").alias("n"))
