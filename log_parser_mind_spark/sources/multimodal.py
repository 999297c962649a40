"""Multimodal columns: image/audio/video as opaque ``binary`` + typed metadata.

The Spark-side plumbing is real — schema (schemas.MEDIA_ASSETS), partitioning,
Arrow-batched ``mapInPandas`` UDF signatures, batch shapes — while the codec
step is stubbed: the container has no image/audio libraries, so ``decode``
raises ``NotImplementedError`` unless ``fake=True``, which produces a
deterministic fake feature vector from the payload bytes (hash-derived), so
the full pipeline remains testable end-to-end.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..schemas import MEDIA_ASSETS

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def synth_assets(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake assets: payload bytes derived from sha256(seed, i)."""
    rows = []
    for i in range(n):
        media = ["image", "audio", "video"][i % 3]
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (4 + i % 5)
        meta = {
            "image": (64 + i % 8, 48, None, None, None),
            "audio": (None, None, 1000 * (1 + i % 10), 16000, None),
            "video": (320, 240, 2000, None, 48 + i % 24),
        }[media]
        rows.append(
            (f"asset_{i:06d}", f"conv_{i % 7:08d}", i % 5, media, f"{media}/x-fake", payload, meta)
        )
    return spark.createDataFrame(rows, MEDIA_ASSETS)


def _fake_features(payload: bytes) -> list[float]:
    digest = hashlib.sha256(payload or b"").digest()
    arr = np.frombuffer(digest[: FEATURE_DIM * 2], dtype=np.uint16).astype(np.float32)
    return (arr / 65535.0).tolist()


def decode_and_featurize(assets: DataFrame, fake: bool = False) -> DataFrame:
    """Arrow-batched decode → feature-extract. The real decode (PIL/torchaudio/
    pyav) is NOT available in this container and raises; ``fake=True`` swaps a
    deterministic stand-in with the same schema/batch shape."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media codecs (PIL / soundfile / av) are not installed in this "
                    "container; pass fake=True for the deterministic stand-in"
                )
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b or b"")).astype("int32"),
                    "features": pdf["payload"].map(_fake_features),
                }
            )

    cols = assets.select("asset_id", "media_type", "payload")
    return cols.mapInPandas(run, schema=FEATURES_SCHEMA)


def frame_sample_plan(assets: DataFrame, every_ms: int = 500) -> DataFrame:
    """Video frame-sampling plumbing: expand each video into (asset_id,
    frame_ts_ms) rows natively (sequence+explode); the decode of each frame
    would be a second mapInPandas over this plan."""
    v = assets.filter(F.col("media_type") == "video")
    return v.select(
        "asset_id",
        F.explode(
            F.sequence(F.lit(0), F.coalesce(F.col("meta.duration_ms"), F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


def media_stats(assets: DataFrame) -> DataFrame:
    """Typed-metadata aggregates over the opaque payloads."""
    return assets.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.sum(F.octet_length("payload")).alias("total_bytes"),
        F.avg(F.coalesce(F.col("meta.duration_ms"), F.lit(0))).alias("avg_duration_ms"),
    )
