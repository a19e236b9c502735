"""Exactness pin for the composed production ANN stack: int8-quantize
→ dequantize → LSH full-probe search must equal DuckDB's independent
cosine top-k over the same dequantized vectors.  Composes the two
already-pinned parts (quantization value-exactness, LSH full-probe
exactness) through the SAME code path `knn_quantized_lsh` runs, so a
bug in the quantize→search handoff (scale application, cast order,
rounding drift) surfaces as a value mismatch.  Local-only by design:
the driver gate's 50-slot window is reserved for never-checked and
stale names (queries/registry.py), and this differential needs no new
registry slot to falsify the path.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from core2_spark import similarity
from core2_spark.catalog import load_tables
from tests.conftest import SF_DIR
from tests.parity import assert_frames_match

_ORACLE = """
WITH q0 AS (
    SELECT vec_id,
           list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) / 127.0 AS s,
           embedding::DOUBLE[] AS v
    FROM embeddings
),
dq AS (
    SELECT vec_id,
           list_transform(
               v, x -> CAST(round(x / s + 0.000000001) AS INT) * s
           ) AS dv
    FROM q0
),
qv AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
scored AS (
    SELECT vec_id,
           ROUND(list_dot_product(dv, qv) /
                 (sqrt(list_dot_product(dv, dv)) * sqrt(list_dot_product(qv, qv)))
                 + 0.000000001, 6) AS cosine_sim
    FROM dq, qv
)
SELECT vec_id, cosine_sim FROM scored
ORDER BY cosine_sim DESC, vec_id
LIMIT 10
"""


def test_quantized_lsh_full_probe_equals_duckdb_exact(spark, duck):
    e = load_tables(spark, SF_DIR, ("embeddings",))["embeddings"]
    deq = similarity.quantize_int8(e).select(
        "vec_id",
        F.transform(
            "q_vec", lambda x: x.cast("double") * F.col("q_scale")
        ).alias("embedding"),
    )
    qv = similarity.query_vector(e, "vec_id", "embedding", 0)
    got = similarity.lsh_bucketed_knn(
        deq, qv, k=10, n_planes=4, multiprobe_bits=4
    ).toPandas()
    want = duck.execute(_ORACLE).df()
    assert_frames_match(got, want, "knn_quantized_full_probe_exact")
