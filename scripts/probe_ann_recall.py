"""Measure recall@10 of every probe-pruned ANN config against exact
brute-force, per sf tier — pins the min_hits floors for the
knn_*_recall_contract gate queries (VERDICT r9 task 5; extended in
r11 with the _data sf1/sf5 tiers and the auto-scaled probe radius,
VERDICT r10 task 4: a FIXED multiprobe radius decayed 10→7 across
the ladder because a neighbor's expected bucket Hamming distance
grows linearly with the plane count; auto_multiprobe_bits scales the
radius with the planes and holds recall ≥9 at every tier)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from core2_spark import similarity
from core2_spark.catalog import load_tables
from core2_spark.session import get_spark
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    spark = get_spark()
    tiers = [
        d
        for d in (
            "/root/testdata/sf0.001",
            "/root/testdata/sf0.01",
            "/root/testdata/sf0.1",
            os.path.join(REPO, "_data", "sf1"),
            os.path.join(REPO, "_data", "sf5"),
        )
        if os.path.isdir(d)
    ]
    for sf_dir in tiers:
        e = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
        qv = similarity.query_vector(e, "vec_id", "embedding", 0)
        exact = set(
            r.vec_id for r in similarity.brute_force_knn(e, qv, k=10).collect()
        )
        deq = similarity.quantize_int8(e).select(
            "vec_id",
            F.transform(
                "q_vec", lambda x: x.cast("double") * F.col("q_scale")
            ).alias("embedding"),
        )
        configs = {
            # legacy fixed radii (kept to document the decay)
            "lsh_multiprobe2": lambda: similarity.lsh_bucketed_knn(
                e, qv, k=10, multiprobe_bits=2
            ),
            "lsh_multiprobe4": lambda: similarity.lsh_bucketed_knn(
                e, qv, k=10, multiprobe_bits=4
            ),
            # the shipped scale path: radius scales with plane count
            "lsh_auto_probe": lambda: similarity.lsh_bucketed_knn(e, qv, k=10),
            "ivf_nprobe2": lambda: similarity.ivf_knn(e, qv, k=10, nprobe=2),
            "ivf_nprobe3": lambda: similarity.ivf_knn(e, qv, k=10, nprobe=3),
            "quantized_lsh_auto_probe": lambda: similarity.lsh_bucketed_knn(
                deq, qv, k=10
            ),
        }
        out = {}
        for name, fn in configs.items():
            got = set(r.vec_id for r in fn().collect())
            out[name] = len(got & exact)
        # layout path
        import shutil
        import tempfile
        import uuid

        cents = similarity._centroids_from_seed_rows(e, 8, "vec_id", "embedding")
        path = os.path.join(
            tempfile.gettempdir(), "probe_ann_recall", uuid.uuid4().hex[:8]
        )
        shutil.rmtree(path, ignore_errors=True)
        similarity.write_ivf_partitioned(e, path, cents)
        got = set(
            r.vec_id
            for r in similarity.ivf_knn_partitioned(
                spark, path, qv, cents, k=10, nprobe=4
            ).collect()
        )
        shutil.rmtree(path, ignore_errors=True)
        out["ivf_layout_nprobe4"] = len(got & exact)
        print(sf_dir, out, flush=True)


if __name__ == "__main__":
    main()
