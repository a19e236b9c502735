"""Multimodal column plumbing (SURVEY.md §2.12).

Images / audio / video ride as opaque ``binary`` columns plus a typed
metadata struct — the Spark-side schema, partition discipline and
Pandas-UDF batch shapes are real and tested; the codec step itself is
STUBBED (image/audio libraries are not in this container): decoders
raise NotImplementedError unless ``fake=True`` selects a deterministic
fake decoder so the pipeline shape can be exercised end-to-end.

At 100 TB: binary payloads dominate partition size — size partitions
by bytes (maxPartitionBytes), never groupBy the payload itself, and
push metadata-only predicates before any decode.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = "media_id long, mime string, n_bytes long, feature array<double>"


def extract_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow-batched).

    Real decoders are not available in this environment; pass
    ``fake=True`` for the deterministic fake, otherwise the task raises
    NotImplementedError at execution time (clearly-marked stub).

    The decode helper is nested so cloudpickle serializes it BY VALUE:
    executors must not need `core2_spark` importable on their own
    sys.path (the driver harness may run from any cwd).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def fake_decode(payload):
            # deterministic stand-in: 8 normalized byte-histogram buckets
            if payload is None:
                return [0.0] * 8
            buckets = [0] * 8
            for byte in payload:
                buckets[byte >> 5] += 1
            total = max(sum(buckets), 1)
            return [b / total for b in buckets]

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media decode requires image/audio codecs not present in "
                    "this container; use fake=True for the deterministic stub"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": pdf["payload"].map(lambda p: 0 if p is None else len(p)),
                    "feature": pdf["payload"].map(fake_decode),
                }
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: expands metadata to frame
    timestamps (pure column algebra); the actual frame grab is the
    stubbed decode step."""
    n_frames = (F.col("meta.duration_ms") / every_ms).cast("int")
    return df.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))
        ).alias("frame_idx"),
    ).withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)
