"""Multimodal column plumbing: image/audio/video as opaque `binary`
columns with typed metadata, processed via Arrow-batched mapInPandas.

The decode kernels (PIL/librosa/ffmpeg) are NOT in this container, so
the decode step is STUBBED: `deterministic_fake_features` derives
features from a content hash (stable, testable), and `decode_image`
raises NotImplementedError behind an import-try.  Everything Spark-side
— schema, batch shape, partition sizing, UDF signature — is real and
tested; swapping in a real kernel changes only the inner function.

Scale notes: binary payloads dominate partition size — size partitions
by bytes (spark.sql.files.maxPartitionBytes), keep metadata in typed
columns so filters prune BEFORE the decode stage, and never collect
binaries to the driver.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id string, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int, codec:string>"
)

FEATURE_DIM = 16
FEATURES_SCHEMA = f"media_id string, kind string, n_bytes int, feature array<float>"


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table exercising the real plumbing."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (4 + i % 7)
        meta = {
            "width": 64 + i % 512 if kind != "audio" else None,
            "height": 64 + (i * 3) % 512 if kind != "audio" else None,
            "sample_rate": 16000 if kind == "audio" else None,
            "n_frames": 1 if kind == "image" else 25 * (1 + i % 10),
            "codec": {"image": "png", "audio": "pcm16", "video": "h264"}[kind],
        }
        rows.append((f"m-{i:06d}", kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_image(payload: bytes):  # pragma: no cover - real kernel absent
    """Real decode would go through PIL/turbojpeg; not in this image."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decode kernel unavailable in this container; "
            "plumbing is exercised via deterministic_fake_features"
        ) from e
    raise NotImplementedError("wire PIL decode here when available")


def deterministic_fake_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Stand-in 'feature extraction': content-hash-seeded unit vector.

    Deterministic in payload bytes -> tests can assert exact equality
    across partitionings and re-runs.
    """
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    v = (raw.astype(np.float64) / np.iinfo(np.uint32).max) - 0.5
    n = np.linalg.norm(v)
    return (v / n if n else v).astype(np.float32)


def extract_features(media: DataFrame, batch_rows: int = 256) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    The Arrow batch carries raw bytes zero-copy-ish; per batch we loop
    payloads in C-level hash calls (the real kernel would be a
    vectorized decode library call here).
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            feats = [
                deterministic_fake_features(bytes(p)).tolist()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "feature": feats,
                }
            )

    return media.mapInPandas(fn, FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 5) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per kept frame
    index — pure SQL explode of the frame index sequence; the (stubbed)
    per-frame decode would hang off the exploded rows."""
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n))
            ).alias("frame_idx"),
        )
    )


def resize_plan(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Typed resize arithmetic (scale factors) — metadata-only, prunable;
    the pixel work is the stubbed kernel."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.when(
        F.greatest(w, h) > max_side, max_side / F.greatest(w, h)
    ).otherwise(F.lit(1.0))
    return media.where(F.col("kind") == "image").select(
        "media_id", w.alias("width"), h.alias("height"),
        F.round(scale, 6).alias("scale"),
        F.ceil(w * scale).cast("int").alias("out_width"),
        F.ceil(h * scale).cast("int").alias("out_height"),
    )
