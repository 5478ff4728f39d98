"""Lossy VP8 WebP via the system-libwebp seam (llm/webp_system):
capability probe, encode→decode loop, dispatch through image_io, and
cross-format near-dup membership — the majority share of real-world
WebP joining the dedup surface."""

from __future__ import annotations

import numpy as np
import pytest

from verified_sources_spark.llm import webp_system as ws
from verified_sources_spark.llm.image_io import decode_image, probe_webp

pytestmark = pytest.mark.skipif(
    not ws.available(), reason="system libwebp not present"
)


def _img(w, h, seed=0):
    rng = np.random.default_rng(seed)
    coarse = rng.integers(0, 256, size=(6, 8))
    gray = coarse[(np.arange(h) * 6) // h][:, (np.arange(w) * 8) // w]
    return np.stack([gray] * 3, axis=2).astype(np.uint8)


def test_encode_decode_loop_high_quality_is_near_exact():
    img = _img(64, 48, seed=7)
    data = ws.encode_rgb(64, 48, img.tobytes(), quality=95)
    assert data[12:16] == b"VP8 "  # genuinely lossy bitstream
    out = ws.decode_rgb(data)
    assert (out["width"], out["height"], out["mode"]) == (64, 48, "RGB")
    got = np.frombuffer(out["pixels"], np.uint8).astype(int)
    err = np.abs(got - img.astype(int).ravel())
    assert err.max() <= 8 and err.mean() < 1.5  # lossy but close


def test_image_io_dispatch_and_probe_agree():
    img = _img(40, 24, seed=3)
    data = ws.encode_rgb(40, 24, img.tobytes(), quality=90)
    m = probe_webp(data)
    assert (m["width"], m["height"]) == (40, 24)
    assert m["variant"] == "VP8 (lossy)"
    out = decode_image(data)
    assert out["format"] == "webp" and out["mode"] == "RGB"
    assert (out["width"], out["height"]) == (40, 24)


def test_lossy_joins_png_twin_dhash_group():
    """A photo re-encoded as lossy WebP lands within a few dHash bits
    of its PNG original — the cross-format near-dup join for the
    biggest real-world WebP share."""
    from verified_sources_spark.llm.image_dedup import _dhash_of_pixels
    from verified_sources_spark.llm.png_codec import encode as png_encode

    img = _img(64, 48, seed=21)
    px = img.tobytes()

    def dh(payload):
        d = decode_image(payload)
        return _dhash_of_pixels(d["pixels"], d["width"], d["height"], 3, 8)

    a = dh(png_encode(64, 48, px, "RGB"))
    b = dh(ws.encode_rgb(64, 48, px, quality=92))
    assert bin(a ^ b).count("1") <= 6  # near-dup, joinable by banding


def test_error_paths():
    with pytest.raises(ValueError, match="does not match"):
        ws.encode_rgb(10, 10, b"\x00" * 5)
    with pytest.raises(ValueError, match="could not decode"):
        ws.decode_rgb(b"RIFF\x0c\x00\x00\x00WEBPVP8 \x00\x00\x00\x00")
    assert ws.webp_version() is not None
