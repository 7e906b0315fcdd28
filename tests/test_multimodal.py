"""PPM (P6) + RIFF/WAVE PCM16 codecs + multimodal feature path: the
decode step is REAL for PPM images and WAV audio (hand-written parsers),
stubbed only for formats with no library in this environment."""

from __future__ import annotations

import math

import numpy as np
import pytest

from headson_spark.operators.multimodal import (PPM_H, PPM_W,
                                                WAV_RATE, WAV_SAMPLES,
                                                _decode_frame,
                                                ppm_decode, ppm_encode,
                                                printable_ascii,
                                                text_to_ppm, text_to_wav,
                                                wav_decode, wav_encode)


def test_ppm_roundtrip():
    px = np.arange(PPM_W * PPM_H * 3, dtype=np.uint64) % 256
    px = px.astype(np.uint8)
    payload = ppm_encode(px, PPM_W, PPM_H)
    w, h, out = ppm_decode(payload)
    assert (w, h) == (PPM_W, PPM_H)
    assert np.array_equal(out.reshape(-1), px)


def test_ppm_decode_handles_comments_and_whitespace():
    raster = bytes(range(12))  # 2x2 RGB
    payload = b"P6\n# a comment\n 2\t2 # trailing\n255\n" + raster
    w, h, px = ppm_decode(payload)
    assert (w, h) == (2, 2)
    assert px.tobytes() == raster


@pytest.mark.parametrize("payload", [
    b"P5\n2 2\n255\n" + bytes(12),          # wrong magic
    b"P6\n2 2\n65535\n" + bytes(24),        # unsupported maxval
    b"P6\n2 2\n255\n" + bytes(5),           # truncated raster
    b"P6\n2 2",                              # truncated header
])
def test_ppm_decode_rejects_malformed(payload):
    with pytest.raises(ValueError):
        ppm_decode(payload)


def test_text_to_ppm_deterministic_raster():
    payload = text_to_ppm("abc")
    w, h, px = ppm_decode(payload)
    flat = px.reshape(-1)
    base = b"abc"
    expect = (base * (768 // 3 + 1))[:768]
    assert flat.tobytes() == expect
    assert len(payload) == 13 + 768


def test_printable_ascii_fallback():
    assert printable_ascii("") == "x"
    assert printable_ascii("é中") == "x"  # no printable ASCII
    assert printable_ascii("aéb") == "ab"


def test_decode_frame_real_path_channel_means():
    # solid color image: means must be exact channel values / 255
    px = np.tile(np.array([10, 100, 200], dtype=np.uint8), PPM_W * PPM_H)
    payload = ppm_encode(px, PPM_W, PPM_H)
    feat = _decode_frame(payload, "image", 8)
    assert feat[0] == pytest.approx(10 / 255.0)
    assert feat[1] == pytest.approx(100 / 255.0)
    assert feat[2] == pytest.approx(200 / 255.0)
    assert feat[3] == feat[4] == feat[5] == 0.0  # zero std
    assert feat[6] == feat[7] == 0.0


def test_decode_frame_stub_fallback_deterministic():
    a = _decode_frame(b"\x00\x01\x02", "audio", 8)
    b = _decode_frame(b"\x00\x01\x02", "audio", 8)
    assert np.array_equal(a, b)
    assert a.shape == (8,)


# --- WAV (RIFF PCM16) codec ---


def test_wav_roundtrip_mono():
    samples = (np.arange(100, dtype=np.int32) * 331 - 16000).astype(
        np.int16)
    payload = wav_encode(samples, 8000)
    rate, channels, out = wav_decode(payload)
    assert (rate, channels) == (8000, 1)
    assert np.array_equal(out, samples)
    assert len(payload) == 44 + 200


def test_wav_roundtrip_stereo():
    frames = np.array([[1, -1], [300, -300], [32767, -32768]],
                      dtype=np.int16)
    payload = wav_encode(frames, 44100, channels=2)
    rate, channels, out = wav_decode(payload)
    assert (rate, channels) == (44100, 2)
    assert out.shape == (3, 2)
    assert np.array_equal(out, frames)


def test_wav_decode_skips_unknown_chunks():
    samples = np.array([5, -5, 7], dtype=np.int16)
    payload = wav_encode(samples, 16000)
    # splice a LIST chunk (odd size -> exercises word-alignment padding)
    extra = b"LIST" + (5).to_bytes(4, "little") + b"INFOx" + b"\x00"
    spliced = payload[:12] + extra + payload[12:]
    rate, channels, out = wav_decode(spliced)
    assert np.array_equal(out, samples)


@pytest.mark.parametrize("payload", [
    b"RIFX" + bytes(40),                                  # wrong magic
    b"RIFF" + bytes(4) + b"AVI " + bytes(32),             # not WAVE
    b"RIFF" + bytes(4) + b"WAVE",                         # no chunks
    # truncated data chunk
    b"RIFF" + bytes(4) + b"WAVE" + b"data"
    + (100).to_bytes(4, "little") + bytes(10),
])
def test_wav_decode_rejects_malformed(payload):
    with pytest.raises(ValueError):
        wav_decode(payload)


def test_wav_decode_rejects_non_pcm16():
    # mu-law (fmt=7) and 8-bit PCM must be refused, not mis-parsed
    body = struct_pack_fmt(7, 1, 8000, 8)
    with pytest.raises(ValueError):
        wav_decode(body)
    body = struct_pack_fmt(1, 1, 8000, 8)
    with pytest.raises(ValueError):
        wav_decode(body)


def struct_pack_fmt(audio_fmt, channels, rate, bits):
    import struct
    fmt = struct.pack("<HHIIHH", audio_fmt, channels, rate,
                      rate * channels * bits // 8,
                      channels * bits // 8, bits)
    return (b"RIFF" + (36).to_bytes(4, "little") + b"WAVE"
            + b"fmt " + (16).to_bytes(4, "little") + fmt
            + b"data" + (0).to_bytes(4, "little"))


def test_text_to_wav_deterministic_samples():
    payload = text_to_wav("ab")
    rate, channels, samples = wav_decode(payload)
    assert (rate, channels) == (WAV_RATE, 1)
    assert samples.size == WAV_SAMPLES
    a, b = (ord("a") - 80) * 256, (ord("b") - 80) * 256
    assert list(samples[:4]) == [a, b, a, b]
    assert len(payload) == 44 + 2 * WAV_SAMPLES


def test_decode_frame_real_audio_path():
    # constant positive signal: mean == peak, zero std, zero crossings
    samples = np.full(WAV_SAMPLES, 4096, dtype=np.int16)
    payload = wav_encode(samples, WAV_RATE)
    feat = _decode_frame(payload, "audio", 8)
    assert feat[0] == pytest.approx(4096 / 32768.0)
    assert feat[1] == 0.0                      # std
    assert feat[2] == pytest.approx(4096 / 32768.0)  # peak
    assert feat[3] == 0.0                      # zero-crossing rate
    # alternating sign: zcr == 1
    alt = np.tile(np.array([1000, -1000], dtype=np.int16),
                  WAV_SAMPLES // 2)
    feat2 = _decode_frame(wav_encode(alt, WAV_RATE), "audio", 8)
    assert feat2[3] == pytest.approx(1.0)
    assert feat2[0] == pytest.approx(0.0)


def test_audio_stats_matches_numpy_reference():
    """audio_stats math cross-checked in pure Python on the exact
    construction the oracle reproduces."""
    from headson_spark.operators.multimodal import printable_ascii
    text = "Hello, WAV world! 123"
    payload = text_to_wav(text)
    _, _, samples = wav_decode(payload)
    base = printable_ascii(text).encode("ascii")
    raw = (base * (WAV_SAMPLES // len(base) + 1))[:WAV_SAMPLES]
    expect = [(b - 80) * 256 for b in raw]
    assert list(samples) == expect
    mean = sum(expect) / WAV_SAMPLES
    rms = math.sqrt(sum(v * v for v in expect) / WAV_SAMPLES)
    flat = samples.astype(np.float64)
    assert flat.sum() / WAV_SAMPLES == mean
    assert math.sqrt((flat * flat).sum() / WAV_SAMPLES) == rms


def test_wav_roundtrip_property():
    """Randomized roundtrip: arbitrary int16 payloads, mono + stereo,
    varied rates — encode/decode must be lossless."""
    import random
    rng = random.Random(29)
    for _ in range(50):
        n = rng.randrange(0, 400)
        channels = rng.choice([1, 2])
        rate = rng.choice([8000, 16000, 22050, 44100, 48000])
        vals = np.array([rng.randrange(-32768, 32768)
                         for _ in range(n * channels)],
                        dtype=np.int16)
        frames = vals.reshape(-1, channels) if channels > 1 else vals
        payload = wav_encode(frames, rate, channels=channels)
        r, c, out = wav_decode(payload)
        assert (r, c) == (rate, channels)
        assert np.array_equal(out.reshape(-1), vals)


# --- video container (concatenated P6) + resize ---


def _mk_frames(k, w=4, h=3):
    return [(np.arange(w * h * 3, dtype=np.int64) * (i + 1) % 256)
            .astype(np.uint8) for i in range(k)]


def test_ppm_video_roundtrip():
    from headson_spark.operators.multimodal import (ppm_video_decode,
                                                    ppm_video_encode)
    frames = _mk_frames(5)
    payload = ppm_video_encode(frames, 4, 3)
    out = list(ppm_video_decode(payload))
    assert len(out) == 5
    for f, (w, h, px) in zip(frames, out):
        assert (w, h) == (4, 3)
        assert np.array_equal(px.reshape(-1), f)


def test_ppm_video_decode_rejects_desync():
    from headson_spark.operators.multimodal import (ppm_video_decode,
                                                    ppm_video_encode)
    frames = _mk_frames(2)
    payload = ppm_video_encode(frames, 4, 3) + b"garbage"
    with pytest.raises(ValueError):
        list(ppm_video_decode(payload))


def test_resize_nearest_exact():
    from headson_spark.operators.multimodal import resize_nearest
    # 2x2 -> 4x4: each source pixel becomes a 2x2 block
    px = np.array([[[0, 0, 0], [10, 10, 10]],
                   [[20, 20, 20], [30, 30, 30]]], dtype=np.uint8)
    up = resize_nearest(px, 4, 4)
    assert up.shape == (4, 4, 3)
    assert (up[:2, :2] == 0).all() and (up[:2, 2:] == 10).all()
    assert (up[2:, :2] == 20).all() and (up[2:, 2:] == 30).all()
    # identity resize
    assert np.array_equal(resize_nearest(px, 2, 2), px)
    # downsample picks pixel centers
    down = resize_nearest(up, 2, 2)
    assert np.array_equal(down, px)


def test_frame_sample_and_resize_spark(spark):
    import pandas as pd
    from headson_spark.operators.multimodal import (frame_sample,
                                                    image_resize,
                                                    image_channel_stats,
                                                    ppm_video_encode)
    frames = _mk_frames(6, w=8, h=8)
    pdf = pd.DataFrame({
        "media_id": [1, 2],
        "kind": ["video"] * 2,
        "payload": [ppm_video_encode(frames, 8, 8),
                    ppm_video_encode(frames[:3], 8, 8)],
        "width": 8, "height": 8, "sample_rate": 0})
    df = spark.createDataFrame(pdf)
    out = frame_sample(df, every_k=2).toPandas()
    # media 1: frames 0,2,4 kept; media 2: frames 0,2
    assert sorted(zip(out.media_id, out.frame_idx)) == [
        (1, 0), (1, 2), (1, 4), (2, 0), (2, 2)]
    # each emitted frame is a standalone decodable PPM
    for f in out.frame:
        w, h, px = ppm_decode(bytes(f))
        assert (w, h) == (8, 8)
    # resize composes with the stats operator (schema-compatible):
    # build single-frame media from the first sampled frame per id
    first = out[out.frame_idx == 0]
    single = spark.createDataFrame(pd.DataFrame({
        "media_id": first.media_id,
        "kind": "image",
        "payload": [bytes(f) for f in first.frame],
        "width": 8, "height": 8, "sample_rate": 0}))
    small = image_resize(single, 4, 4)
    stats = image_channel_stats(small).toPandas()
    assert set(stats.media_id) == {1, 2}
    assert (stats.n_bytes == len(b"P6\n4 4\n255\n") + 4 * 4 * 3).all()
