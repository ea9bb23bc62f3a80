"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with decode / feature-extract / resize / frame-sample as
Arrow-batched ``mapInPandas`` stages.

The Spark-side plumbing (schemas, batch shapes, partitioning) is real
and tested; the codec step is stubbed because no image/audio libraries
exist in this container: ``decode_assets(..., codec='real')`` raises
NotImplementedError at the exact seam where PIL/libav would plug in,
and ``codec='fake'`` produces deterministic bytes-derived values so the
downstream dataflow (feature vectors, frame sampling, joins back to
documents) is exercised end-to-end.
"""

from __future__ import annotations

import hashlib
from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

ASSETS = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("doc_id", LongType(), True),
        StructField("modality", StringType(), False),  # image | audio | video
        StructField("data", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

FEATURES_DDL = (
    "asset_id long, modality string, feature array<float>, "
    "n_bytes long, content_sha string"
)

FRAMES_DDL = "asset_id long, frame_idx int, frame_ts_ms int, frame_sha string"


def synth_assets(spark: SparkSession, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake binary assets (payload = repeated md5 bytes)."""
    base = spark.range(n).select(
        F.col("id").alias("asset_id"),
        (F.col("id") % 20).alias("doc_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.xxhash64("id", F.lit(seed)), 3) + 1).cast("int"),
        ).alias("modality"),
        F.unhex(F.repeat(F.md5(F.concat(F.lit("asset"), "id")), 4)).alias("data"),
    )
    return base.select(
        "asset_id",
        "doc_id",
        "modality",
        "data",
        F.concat(F.lit("application/x-fake-"), "modality").alias("mime"),
        F.lit(64).alias("width"),
        F.lit(64).alias("height"),
        (F.pmod(F.xxhash64("asset_id", F.lit(seed + 1)), 10000) + 1000)
        .cast("int")
        .alias("duration_ms"),
    )


def _fake_feature(data: bytes, dim: int) -> np.ndarray:
    """Deterministic unit vector from the payload bytes."""
    h = hashlib.sha256(data or b"").digest()
    rng = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    v = (rng.astype(np.float64) / np.iinfo(np.uint32).max) - 0.5
    n = np.linalg.norm(v)
    return (v / n if n else v).astype(np.float32)


def make_feature_map(dim: int = 16, codec: str = "fake"):
    """mapInPandas fn: assets -> per-asset feature rows."""

    def feature_map(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.worker import pin_worker_threads

        pin_worker_threads()
        for pdf in batches:
            if codec == "real":
                raise NotImplementedError(
                    "real decode needs PIL/torchaudio/av — not in this "
                    "container; plug the codec in here"
                )
            rows = []
            for asset_id, modality, data in zip(
                pdf["asset_id"], pdf["modality"], pdf["data"]
            ):
                blob = bytes(data) if data is not None else b""
                rows.append(
                    (
                        int(asset_id),
                        modality,
                        _fake_feature(blob, dim).tolist(),
                        len(blob),
                        hashlib.sha256(blob).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "modality", "feature", "n_bytes", "content_sha"],
            )

    return feature_map


def extract_features(assets: DataFrame, dim: int = 16, codec: str = "fake") -> DataFrame:
    cols = assets.select("asset_id", "modality", "data")
    return cols.mapInPandas(make_feature_map(dim, codec), FEATURES_DDL)


def make_frame_sample_map(every_ms: int = 1000, codec: str = "fake"):
    """mapInPandas fn: video assets -> one row per sampled frame."""

    def frame_map(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.worker import pin_worker_threads

        pin_worker_threads()
        for pdf in batches:
            if codec == "real":
                raise NotImplementedError("real frame decode needs libav/ffmpeg")
            rows = []
            for asset_id, data, duration in zip(
                pdf["asset_id"], pdf["data"], pdf["duration_ms"]
            ):
                blob = bytes(data) if data is not None else b""
                for i, ts in enumerate(range(0, int(duration), every_ms)):
                    fp = hashlib.sha256(blob + ts.to_bytes(4, "big")).hexdigest()
                    rows.append((int(asset_id), i, ts, fp))
            yield pd.DataFrame(
                rows, columns=["asset_id", "frame_idx", "frame_ts_ms", "frame_sha"]
            )

    return frame_map


def sample_frames(assets: DataFrame, every_ms: int = 1000, codec: str = "fake") -> DataFrame:
    vids = assets.filter(F.col("modality") == "video").select(
        "asset_id", "data", "duration_ms"
    )
    return vids.mapInPandas(make_frame_sample_map(every_ms, codec), FRAMES_DDL)
