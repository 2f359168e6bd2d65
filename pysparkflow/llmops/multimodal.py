"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side contract is real and tested — schema, partitioning, UDF
signature, batch shapes. The actual media decode is STUBBED: codec
libraries (Pillow/ffmpeg/torchaudio) are not in this environment, so
``decode_fn=None`` uses a deterministic fake decoder (hash-seeded feature
vector) and a real decoder can be injected without touching the plumbing.

Schema convention for a media table:

    media(media_id BIGINT, kind STRING('image'|'audio'|'video'),
          payload BINARY, meta STRUCT<width INT, height INT,
          sample_rate INT, n_frames INT>)
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 16

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
)

FEATURES_SCHEMA = "media_id long, kind string, n_bytes long, features array<float>"


def _fake_decode(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic stand-in for a real decoder: a feature vector seeded by
    the payload content hash. Replace with a real decode+embed when codec
    libraries are available."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big") % (2**32)
    rng = np.random.default_rng(seed)
    return rng.standard_normal(FEATURE_DIM).astype(np.float32)


def real_decode(payload: bytes, kind: str) -> np.ndarray:
    """Placeholder for a real media decoder (PIL/ffmpeg). Not available in
    this environment by design — inject your own via ``decode_fn``."""
    raise NotImplementedError(
        "media codecs not available in this environment; pass decode_fn= "
        "or use the deterministic fake decoder (decode_fn=None)"
    )


def extract_features(media: DataFrame, decode_fn=None, batch_hint: int = 256) -> DataFrame:
    """Decode + feature-extract media payloads via mapInPandas.

    Arrow-batched: each pandas batch decodes payloads vectorized-per-row and
    emits (media_id, kind, n_bytes, features). Partitioning is preserved —
    repartition upstream by size if payloads are skewed."""
    fn = decode_fn or _fake_decode

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [fn(p, k).tolist() for p, k in zip(pdf["payload"], pdf["kind"])]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "features": feats,
                }
            )

    return media.mapInPandas(op, schema=FEATURES_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plan for video rows: explodes frame indices
    0, every_n, 2*every_n, ... < n_frames from metadata — the Spark-side
    plumbing (row explosion, index arithmetic) is real; decoding the
    sampled frame goes through ``extract_features``."""
    video = media.where(F.col("kind") == "video")
    return video.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("meta.n_frames") - 1, F.lit(0)),
                F.lit(every_n),
            )
        ).alias("frame_idx"),
        "payload",
    )


def resize_plan(media: DataFrame, max_side: int = 224) -> DataFrame:
    """Resize planning from metadata (scale factor per image, computed
    JVM-side); the pixel work itself is decode-side (stubbed)."""
    img = media.where(F.col("kind") == "image")
    scale = F.when(
        F.greatest("meta.width", "meta.height") > max_side,
        F.lit(max_side) / F.greatest("meta.width", "meta.height").cast("double"),
    ).otherwise(F.lit(1.0))
    return img.select(
        "media_id",
        "meta.width",
        "meta.height",
        F.round(scale, 6).alias("scale"),
        F.ceil(F.col("meta.width") * scale).cast("int").alias("out_width"),
        F.ceil(F.col("meta.height") * scale).cast("int").alias("out_height"),
    )
