"""Measure recall@10 of every probe-pruned ANN config against exact
brute-force, per sf tier — pins the min_hits floors for the
knn_*_recall_contract gate queries (VERDICT r9 task 5)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from core2_spark import similarity
from core2_spark.catalog import load_tables
from core2_spark.session import get_spark
from pyspark.sql import functions as F


def main() -> None:
    spark = get_spark()
    tiers = [t for t in ("sf0.001", "sf0.01", "sf0.1", "sf1") if os.path.isdir(f"/root/testdata/{t}")]
    for tier in tiers:
        sf_dir = f"/root/testdata/{tier}"
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
            "lsh_multiprobe2": lambda: similarity.lsh_bucketed_knn(
                e, qv, k=10, multiprobe_bits=2
            ),
            "ivf_nprobe2": lambda: similarity.ivf_knn(e, qv, k=10, nprobe=2),
            "quantized_lsh": lambda: similarity.lsh_bucketed_knn(
                deq, qv, k=10, multiprobe_bits=2
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
        print(tier, out, flush=True)


if __name__ == "__main__":
    main()
