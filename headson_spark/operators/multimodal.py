"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched mapInPandas kernels.

The decode/feature-extraction step is STUBBED (no image/audio libraries in
this environment): `decode_stub=True` derives deterministic fake features
from the payload bytes, keeping the Spark-side plumbing — schema, batch
shape, partitioning, UDF signature — real and tested. Swap `_decode_frame`
for a real decoder (PIL/torchaudio/ffmpeg) in production.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = ("media_id bigint, kind string, payload binary, "
                "width int, height int, sample_rate int")

FEATURE_SCHEMA = ("media_id bigint, kind string, n_bytes int, "
                  "sha1 string, feat array<float>")


def synth_media(df: DataFrame, id_col: str, text_col: str,
                kind: str = "image") -> DataFrame:
    """Derive a deterministic binary 'media' column from a text column —
    stands in for real image/audio payloads in tests."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit(64).alias("width"), F.lit(64).alias("height"),
        F.lit(16000).alias("sample_rate"))


def _decode_frame(payload: bytes, kind: str, dim: int) -> np.ndarray:
    """STUB decoder: deterministic pseudo-features from payload bytes.

    Production implementation would decode the image/audio and run a real
    feature extractor; everything around this function (Arrow batching,
    schema, partition flow) is the real pipeline.
    """
    h = hashlib.sha256(payload or b"").digest()
    raw = (h * ((dim * 4) // len(h) + 1))[: dim * 4]
    arr = np.frombuffer(raw, dtype=np.uint32).astype(np.float32)[:dim]
    return arr / np.float32(2**32)


def extract_features(df: DataFrame, dim: int = 8,
                     batch_size_hint: int = 1024) -> DataFrame:
    """mapInPandas feature extraction over binary payloads."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_frame(p if isinstance(p, (bytes, bytearray))
                              else bytes(p), k, dim).tolist()
                for p, k in zip(pdf["payload"], pdf["kind"])]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": [len(p) for p in pdf["payload"]],
                "sha1": [hashlib.sha1(bytes(p)).hexdigest()
                         for p in pdf["payload"]],
                "feat": feats,
            })

    return df.mapInPandas(fn, schema=FEATURE_SCHEMA)
