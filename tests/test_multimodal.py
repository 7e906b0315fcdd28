"""PPM (P6) codec + multimodal feature path: the decode step is REAL for
PPM images (hand-written parser), stubbed only for formats with no
library in this environment."""

from __future__ import annotations

import numpy as np
import pytest

from headson_spark.operators.multimodal import (PPM_H, PPM_W,
                                                _decode_frame,
                                                ppm_decode, ppm_encode,
                                                printable_ascii,
                                                text_to_ppm)


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
