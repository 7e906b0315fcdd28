"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched mapInPandas kernels.

Image decode is REAL for PPM (P6, hand-written pure-Python parser —
`ppm_decode`), so the feature path is semantically exercised end-to-end:
payload bytes -> header parse -> pixel array -> per-channel statistics,
verified against a DuckDB oracle computing the same means from the source
bytes. Other kinds (audio/video, exotic image formats) fall back to a
deterministic STUB (no PIL/ffmpeg in this environment) — swap
`_decode_frame`'s fallback for a real decoder in production; the Arrow
batching, schema, partitioning and UDF signature are the real pipeline
either way.
"""

from __future__ import annotations

import hashlib
import re
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = ("media_id bigint, kind string, payload binary, "
                "width int, height int, sample_rate int")

FEATURE_SCHEMA = ("media_id bigint, kind string, n_bytes int, "
                  "sha256 string, feat array<float>")


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


PPM_W, PPM_H = 16, 16  # synth fixture geometry (768 RGB bytes)
_PRINTABLE = re.compile(r"[^ -~]")


def ppm_encode(pixels: np.ndarray, width: int, height: int) -> bytes:
    """Minimal binary PPM (P6) writer: pixels is (h*w*3,) uint8."""
    assert pixels.size == width * height * 3
    return b"P6\n%d %d\n255\n" % (width, height) + pixels.tobytes()


def ppm_decode(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Hand-written binary PPM (P6) parser: magic, '#' comments,
    whitespace-separated width/height/maxval, then w*h*3 sample bytes.
    Returns (width, height, pixels[h, w, 3] uint8). Raises ValueError on
    malformed input — callers fall back to the stub featureizer."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    pos, fields = 2, []
    n = len(payload)
    while len(fields) < 3:
        while pos < n and payload[pos : pos + 1].isspace():
            pos += 1
        if pos < n and payload[pos : pos + 1] == b"#":  # comment to EOL
            while pos < n and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < n and not payload[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    need = width * height * 3
    raster = payload[pos : pos + need]
    if len(raster) != need:
        raise ValueError("truncated PPM raster")
    return width, height, np.frombuffer(
        raster, dtype=np.uint8).reshape(height, width, 3)


def printable_ascii(text: str) -> str:
    """The byte source for synthesized PPM rasters: printable ASCII only,
    so the DuckDB oracle can reproduce the exact pixel bytes via
    regexp_replace + ascii()."""
    return _PRINTABLE.sub("", text or "") or "x"


def text_to_ppm(text: str) -> bytes:
    base = printable_ascii(text).encode("ascii")
    need = PPM_W * PPM_H * 3
    raster = (base * (need // len(base) + 1))[:need]
    return ppm_encode(np.frombuffer(raster, dtype=np.uint8), PPM_W, PPM_H)


def _decode_frame(payload: bytes, kind: str, dim: int) -> np.ndarray:
    """Decoder: REAL path for PPM images (hand-written P6 parser ->
    per-channel mean/std features); deterministic STUB for everything
    else (no image/audio libraries in this environment — production swaps
    the fallback for PIL/torchaudio/ffmpeg)."""
    if kind == "image" and payload[:2] == b"P6":
        _, _, px = ppm_decode(payload)
        chans = px.reshape(-1, 3).astype(np.float64)
        feat = np.concatenate([chans.mean(axis=0) / 255.0,
                               chans.std(axis=0) / 255.0])
        out = np.zeros(dim, dtype=np.float32)
        out[: min(dim, 6)] = feat[: min(dim, 6)].astype(np.float32)
        return out
    h = hashlib.sha256(payload or b"").digest()
    raw = (h * ((dim * 4) // len(h) + 1))[: dim * 4]
    arr = np.frombuffer(raw, dtype=np.uint32).astype(np.float32)[:dim]
    return arr / np.float32(2**32)


def synth_ppm_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic REAL image payloads: each row's text becomes a 16x16
    binary PPM (P6) whose raster repeats the text's printable-ASCII bytes.
    The geometry is fixed so a SQL oracle can reproduce the exact bytes."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [text_to_ppm(t) for t in pdf[text_col]]
            yield pd.DataFrame({
                "media_id": pdf[id_col],
                "kind": "image",
                "payload": payloads,
                "width": PPM_W, "height": PPM_H,
                "sample_rate": 0,
            })

    return df.select(id_col, text_col).mapInPandas(fn, schema=MEDIA_SCHEMA)


CHANNEL_STATS_SCHEMA = ("media_id bigint, n_bytes int, "
                        "mean_r double, mean_g double, mean_b double")


def image_channel_stats(df: DataFrame) -> DataFrame:
    """Per-channel mean pixel value via the REAL PPM decode path —
    DuckDB-oracle-checkable (the oracle recomputes the raster bytes from
    the source text and averages every 3rd byte)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "n_bytes": [],
                    "mean_r": [], "mean_g": [], "mean_b": []}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                p = p if isinstance(p, (bytes, bytearray)) else bytes(p)
                _, _, px = ppm_decode(p)
                # integer channel sums / power-of-two pixel count: the
                # division is EXACT in float64, so no rounding is needed
                # for cross-engine comparison
                means = px.reshape(-1, 3).astype(np.float64).mean(axis=0)
                rows["media_id"].append(mid)
                rows["n_bytes"].append(len(p))
                rows["mean_r"].append(means[0])
                rows["mean_g"].append(means[1])
                rows["mean_b"].append(means[2])
            yield pd.DataFrame(rows)

    return df.mapInPandas(fn, schema=CHANNEL_STATS_SCHEMA)


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
                "sha256": [hashlib.sha256(bytes(p)).hexdigest()
                         for p in pdf["payload"]],
                "feat": feats,
            })

    return df.mapInPandas(fn, schema=FEATURE_SCHEMA)
