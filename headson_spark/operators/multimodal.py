"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched mapInPandas kernels.

All four multimodal pipeline verbs are REAL hand-written paths in this
environment: DECODE (PPM P6 images via `ppm_decode`, RIFF/WAVE PCM16
audio via `wav_decode`), FEATURE-EXTRACT (`extract_features`,
`image_channel_stats`, `audio_stats` — the latter two DuckDB-oracled
bit-for-bit), RESIZE (`image_resize`, nearest-neighbor numpy), and
FRAME-SAMPLE (`frame_sample` over a concatenated-P6 video container).
Only exotic codecs fall back to a deterministic STUB (no PIL/ffmpeg in
this environment) — swap `_decode_frame`'s fallback for a real decoder
in production; the Arrow batching, schema, partitioning and UDF
signature are the real pipeline either way.
"""

from __future__ import annotations

import hashlib
import math
import re
import struct
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


# --- RIFF/WAVE PCM16 codec (real audio path, pure numpy) ---

WAV_SAMPLES = 1024   # synth fixture geometry: power of two -> exact means
WAV_RATE = 16000


def wav_encode(samples: np.ndarray, sample_rate: int,
               channels: int = 1) -> bytes:
    """Minimal canonical RIFF/WAVE writer: PCM, 16-bit little-endian.
    `samples` is int16, frame-major ((n,) mono or (n, channels))."""
    data = np.asarray(samples, dtype="<i2").tobytes()
    return (b"RIFF" + (36 + len(data)).to_bytes(4, "little") + b"WAVE"
            + b"fmt " + (16).to_bytes(4, "little")
            + struct.pack("<HHIIHH", 1, channels, sample_rate,
                          sample_rate * channels * 2, channels * 2, 16)
            + b"data" + len(data).to_bytes(4, "little") + data)


def wav_decode(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Hand-written RIFF/WAVE parser: walks word-aligned chunks (unknown
    chunks like LIST/INFO are skipped), requires a PCM 16-bit 'fmt ' and
    a 'data' chunk. Returns (sample_rate, channels, samples[int16],
    shaped (n, channels) when channels > 1). Raises ValueError on
    malformed input — callers fall back to the stub featureizer."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    n = len(payload)
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError("truncated WAV chunk")
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are 2-byte aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if len(fmt) < 16:
        raise ValueError("short fmt chunk")
    audio_fmt, channels, rate = struct.unpack("<HHI", fmt[:8])
    bits = struct.unpack("<H", fmt[14:16])[0]
    if audio_fmt != 1 or bits != 16:
        raise ValueError(f"only PCM16 supported (fmt={audio_fmt}, "
                         f"bits={bits})")
    if channels < 1:
        raise ValueError("zero channels")
    samples = np.frombuffer(data[: len(data) - len(data) % (2 * channels)],
                            dtype="<i2")
    if channels > 1:
        samples = samples.reshape(-1, channels)
    return rate, channels, samples


def text_to_wav(text: str) -> bytes:
    """Deterministic REAL audio payload: the text's printable-ASCII bytes
    repeated to WAV_SAMPLES samples, each byte b mapped linearly to the
    int16 sample (b - 80) * 256. Fixed geometry (1024 samples, 16 kHz,
    mono) so a SQL oracle can reproduce the exact sample values."""
    base = printable_ascii(text).encode("ascii")
    need = WAV_SAMPLES
    raw = (base * (need // len(base) + 1))[:need]
    samples = ((np.frombuffer(raw, dtype=np.uint8).astype(np.int32) - 80)
               * 256).astype(np.int16)
    return wav_encode(samples, WAV_RATE)


def _decode_frame(payload: bytes, kind: str, dim: int) -> np.ndarray:
    """Decoder: REAL paths for PPM images (hand-written P6 parser ->
    per-channel mean/std features) and RIFF/WAVE PCM16 audio (hand-
    written chunk parser -> amplitude statistics); deterministic STUB for
    everything else (no media libraries in this environment — production
    swaps the fallback for PIL/torchaudio/ffmpeg)."""
    if kind == "image" and payload[:2] == b"P6":
        _, _, px = ppm_decode(payload)
        chans = px.reshape(-1, 3).astype(np.float64)
        feat = np.concatenate([chans.mean(axis=0) / 255.0,
                               chans.std(axis=0) / 255.0])
        out = np.zeros(dim, dtype=np.float32)
        out[: min(dim, 6)] = feat[: min(dim, 6)].astype(np.float32)
        return out
    if kind == "audio" and payload[:4] == b"RIFF":
        _, _, samples = wav_decode(payload)
        flat = samples.reshape(-1).astype(np.float64)
        if flat.size == 0:
            flat = np.zeros(1)
        zcr = float(np.count_nonzero(np.signbit(flat[1:])
                                     != np.signbit(flat[:-1])))
        feat = np.array([flat.mean() / 32768.0, flat.std() / 32768.0,
                         np.abs(flat).max() / 32768.0,
                         zcr / max(flat.size - 1, 1)])
        out = np.zeros(dim, dtype=np.float32)
        out[: min(dim, 4)] = feat[: min(dim, 4)].astype(np.float32)
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


def synth_wav_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic REAL audio payloads: each row's text becomes a
    1024-sample mono PCM16 WAV via text_to_wav. The geometry is fixed so
    a SQL oracle can reproduce the exact samples."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [text_to_wav(t) for t in pdf[text_col]]
            yield pd.DataFrame({
                "media_id": pdf[id_col],
                "kind": "audio",
                "payload": payloads,
                "width": 0, "height": 0,
                "sample_rate": WAV_RATE,
            })

    return df.select(id_col, text_col).mapInPandas(fn, schema=MEDIA_SCHEMA)


AUDIO_STATS_SCHEMA = ("media_id bigint, n_bytes int, sample_rate int, "
                      "n_samples int, mean_amp double, rms_amp double, "
                      "peak_amp int")


def audio_stats(df: DataFrame) -> DataFrame:
    """Amplitude statistics via the REAL WAV decode path — DuckDB-oracle-
    checkable. Exactness: sample values and their squares are integers,
    partial float64 sums stay below 2^53, and the sample count is a power
    of two, so mean and mean-of-squares are EXACT in float64 and sqrt is
    IEEE-deterministic — the oracle computes bit-identical doubles."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "n_bytes": [], "sample_rate": [],
                    "n_samples": [], "mean_amp": [], "rms_amp": [],
                    "peak_amp": []}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                p = p if isinstance(p, (bytes, bytearray)) else bytes(p)
                rate, _, samples = wav_decode(p)
                flat = samples.reshape(-1).astype(np.float64)
                n = flat.size
                rows["media_id"].append(mid)
                rows["n_bytes"].append(len(p))
                rows["sample_rate"].append(rate)
                rows["n_samples"].append(n)
                rows["mean_amp"].append(flat.sum() / n if n else 0.0)
                rows["rms_amp"].append(
                    math.sqrt((flat * flat).sum() / n) if n else 0.0)
                rows["peak_amp"].append(
                    int(np.abs(flat).max()) if n else 0)
            yield pd.DataFrame(rows)

    return df.mapInPandas(fn, schema=AUDIO_STATS_SCHEMA)


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


# --- video (multi-frame) + resize: the remaining multimodal verbs, REAL ---
#
# Container: concatenated binary PPM (P6) frames, back-to-back — the
# in-sandbox stand-in for a video bitstream (MJPEG-like: every frame
# independently decodable). Together with ppm_decode / wav_decode /
# extract_features this makes all four multimodal pipeline verbs
# (decode, feature-extract, resize, frame-sample) REAL hand-written
# paths; only exotic codecs fall back to the stub.


def ppm_video_encode(frames: list[np.ndarray], width: int,
                     height: int) -> bytes:
    """Concatenate frames ((h*w*3,) uint8 each) as back-to-back P6."""
    return b"".join(ppm_encode(f, width, height) for f in frames)


def ppm_video_decode(payload: bytes):
    """Split a concatenated-P6 payload into frames.

    Yields (width, height, pixels) per frame; raises ValueError on a
    malformed frame (same validation as ppm_decode). Container
    contract: CANONICAL headers as written by ppm_encode
    ("P6\\n<w> <h>\\n255\\n" — exactly three newlines before the
    raster); a non-canonical frame desyncs the walk and fails the next
    frame's magic check."""
    pos, n = 0, len(payload)
    while pos < n:
        nl1 = payload.index(b"\n", pos)
        nl2 = payload.index(b"\n", nl1 + 1)
        nl3 = payload.index(b"\n", nl2 + 1)
        head_end = nl3 + 1
        w, h, px = ppm_decode(payload[pos:])
        frame_len = (head_end - pos) + w * h * 3
        yield w, h, px
        pos += frame_len


FRAME_SCHEMA = ("media_id bigint, frame_idx int, width int, height int, "
                "frame binary")


def frame_sample(df: DataFrame, every_k: int = 2) -> DataFrame:
    """Frame sampling: decode the concatenated-P6 'video' payload and
    keep every k-th frame, re-encoded as a standalone PPM — one output
    row per kept frame (media_id, frame_idx, width, height, frame).
    Arrow-batched mapInPandas; at scale the explode happens map-side
    with no shuffle."""
    if every_k < 1:
        raise ValueError(f"every_k must be >= 1, got {every_k}")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "width": [],
                    "height": [], "frame": []}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                p = p if isinstance(p, (bytes, bytearray)) else bytes(p)
                for i, (w, h, px) in enumerate(ppm_video_decode(p)):
                    if i % every_k:
                        continue
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["frame"].append(
                        ppm_encode(px.reshape(-1), w, h))
            yield pd.DataFrame(rows)

    return df.mapInPandas(fn, schema=FRAME_SCHEMA)


def resize_nearest(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize of an (h, w, 3) uint8 image — pure numpy
    index arithmetic (pixel centers, the standard NN mapping
    src_i = floor((i + 0.5) * src / dst))."""
    h, w = px.shape[0], px.shape[1]
    rows = ((np.arange(out_h) + 0.5) * h / out_h).astype(np.int64)
    cols = ((np.arange(out_w) + 0.5) * w / out_w).astype(np.int64)
    return px[np.minimum(rows, h - 1)][:, np.minimum(cols, w - 1)]


def image_resize(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Real resize over PPM payloads: decode -> nearest-neighbor ->
    re-encode. Output schema matches MEDIA_SCHEMA so resize composes
    with image_channel_stats / extract_features."""
    if out_w < 1 or out_h < 1:
        raise ValueError(f"bad target size {out_w}x{out_h}")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for p in pdf["payload"]:
                p = p if isinstance(p, (bytes, bytearray)) else bytes(p)
                _, _, px = ppm_decode(p)
                small = resize_nearest(px, out_w, out_h)
                payloads.append(ppm_encode(small.reshape(-1), out_w,
                                           out_h))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": "image",
                "payload": payloads,
                "width": out_w, "height": out_h,
                "sample_rate": 0})

    return df.mapInPandas(fn, schema=MEDIA_SCHEMA)
