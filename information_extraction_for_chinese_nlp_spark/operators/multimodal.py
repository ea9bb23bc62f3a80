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

Engine portability: every synthetic field and content fingerprint is
derived from md5/sha256 over HEX STRINGS (never raw blobs), because the
DuckDB oracle can only hash VARCHAR — so ``synth_assets`` +
``extract_features`` + ``sample_frames`` are reproducible in ANSI-ish
SQL and the driver gate hash-compares them end-to-end.
"""

from __future__ import annotations

import hashlib
from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
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

_MODALITIES = ("image", "audio", "video")


def synth_assets(spark: SparkSession, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake binary assets (payload = repeated md5 bytes).

    Every derived field is a pure function of md5 hex characters, so a
    SQL oracle reproduces the table byte-for-byte (see
    plans/queries_extraction.py multimodal entries).
    """
    payload_hex = F.repeat(F.md5(F.concat(F.lit("asset"), "id")), 4)
    # modality index: first hex digit of md5('mod#<seed>#<id>') mod 3
    mod_idx = (
        F.instr(
            F.lit("0123456789abcdef"),
            F.substring(F.md5(F.concat_ws("#", F.lit("mod"), F.lit(seed), "id")), 1, 1),
        )
        - 1
    ) % 3
    # duration: 1000 + (first byte of md5('dur#<seed>#<id>')) * 16 ms
    dur = (
        F.lit(1000)
        + F.conv(
            F.substring(F.md5(F.concat_ws("#", F.lit("dur"), F.lit(seed), "id")), 1, 2),
            16,
            10,
        ).cast("int")
        * 16
    )
    base = spark.range(n).select(
        F.col("id").alias("asset_id"),
        (F.col("id") % 20).alias("doc_id"),
        F.element_at(
            F.array(*[F.lit(m) for m in _MODALITIES]), (mod_idx + 1).cast("int")
        ).alias("modality"),
        F.unhex(payload_hex).alias("data"),
        dur.alias("duration_ms"),
    )
    return base.select(
        "asset_id",
        "doc_id",
        "modality",
        "data",
        F.concat(F.lit("application/x-fake-"), "modality").alias("mime"),
        F.lit(64).alias("width"),
        F.lit(64).alias("height"),
        F.col("duration_ms").cast("int").alias("duration_ms"),
    )


def _fake_feature(data: bytes, dim: int) -> np.ndarray:
    """Deterministic unit vector from the payload bytes."""
    h = hashlib.sha256(data or b"").digest()
    rng = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    v = (rng.astype(np.float64) / np.iinfo(np.uint32).max) - 0.5
    n = np.linalg.norm(v)
    return (v / n if n else v).astype(np.float32)


def content_fingerprint(blob: bytes) -> str:
    """sha256 over the LOWERCASE HEX encoding of the payload — the
    portable content hash (DuckDB's sha256 only accepts VARCHAR, so
    fingerprints are defined over hex text in both engines)."""
    return hashlib.sha256(blob.hex().encode("ascii")).hexdigest()


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
                        content_fingerprint(blob),
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


def feature_digest(col):
    """Stable scalar fingerprint of an array<float> column (md5 over
    6-decimal renderings) — arrays can't cross the driver's pandas
    canonicalizer, so gate projections use this instead of the raw
    vector. format_string, NOT format_number: the latter inserts comma
    thousands-separators that collide with the comma join separator
    (digest of [1234.5, 6.0] would be ambiguous) and no plain printf
    oracle could reproduce the grouping."""
    return F.md5(
        F.concat_ws(",", F.transform(col, lambda x: F.format_string("%.6f", x)))
    )


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
                if duration is None or pd.isna(duration):
                    # nullable per ASSETS schema; Arrow renders the int
                    # column as float64 NaN — int(NaN) would kill the
                    # task. No duration -> no sampled frames.
                    continue
                blob = bytes(data) if data is not None else b""
                for i, ts in enumerate(range(0, int(duration), every_ms)):
                    # frame hash keyed by payload hex + 8-hex-digit ts
                    # (portable: sha256 over text in both engines)
                    fp = hashlib.sha256(
                        (blob.hex() + format(ts, "08x")).encode("ascii")
                    ).hexdigest()
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
