"""Progressive JPEG (llm/jpeg_progressive.py): multi-scan decode
(spectral selection + successive approximation, EOB runs, correction
bits) cross-checked against the BASELINE path — same quantized
coefficients in, so decoded pixels must be byte-identical — plus scan
scripting, dispatch through image_io, cross-format dedup membership,
and error paths."""

from __future__ import annotations

import numpy as np
import pytest

from verified_sources_spark.llm.jpeg_codec import JpegError, decode, encode, probe
from verified_sources_spark.llm.jpeg_progressive import (
    DEFAULT_SCRIPT,
    decode_progressive,
    encode_progressive,
)


def _img(w, h, kind, seed=0):
    rng = np.random.default_rng(seed)
    if kind == "noise":       # dense AC: heavy correction-bit traffic
        return rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
    if kind == "flat":        # all-zero AC bands: max EOBRUN accumulation
        return np.full((h, w, 3), 77, np.uint8)
    if kind == "spikes":      # isolated deltas: long ZRL runs
        img = np.full((h, w, 3), 128, np.uint8)
        for _ in range(5):
            img[rng.integers(0, h), rng.integers(0, w)] = [255, 0, 255]
        return img
    if kind == "blocks":      # seeded coarse pattern: dHash carries signal
        coarse = rng.integers(0, 256, size=(6, 8))
        gray = coarse[(np.arange(h) * 6) // h][:, (np.arange(w) * 8) // w]
        return np.stack([gray] * 3, axis=2).astype(np.uint8)
    gx, gy = np.linspace(0, 255, w), np.linspace(0, 255, h)
    return np.stack([np.add.outer(gy, gx) / 2] * 3, axis=2).astype(np.uint8)


@pytest.mark.parametrize("kind", ["noise", "flat", "spikes", "gradient"])
@pytest.mark.parametrize("sub", ["4:4:4", "4:2:0", "4:2:2"])
def test_roundtrip_identical_to_baseline(kind, sub):
    """The progressive encoder reuses the baseline coefficient pipeline,
    so decoding its multi-scan output must land on EXACTLY the baseline
    decoder's pixels — one equality that exercises DC-first/refine,
    AC-first with EOB runs, and AC-refinement with correction bits."""
    img = _img(37, 23, kind, seed=11)
    px = img.tobytes()
    base = decode(encode(37, 23, px, quality=75, subsampling=sub))
    prog = decode(encode_progressive(37, 23, px, quality=75, subsampling=sub))
    assert prog["pixels"] == base["pixels"]
    assert prog["width"] == 37 and prog["height"] == 23


def test_grayscale_and_quality_sweep():
    img = _img(24, 17, "noise", seed=3)
    px = img.tobytes()
    for q in (30, 90, 95):
        base = decode(encode(24, 17, px, quality=q, grayscale=True))
        prog = decode(encode_progressive(24, 17, px, quality=q,
                                         grayscale=True))
        assert prog["pixels"] == base["pixels"]


def test_probe_reports_progressive_variant():
    data = encode_progressive(16, 12, _img(16, 12, "flat").tobytes())
    m = probe(data)
    assert m["variant"] == "progressive (SOF2)"
    assert (m["width"], m["height"]) == (16, 12)
    assert m["sampling"] == "4:4:4"


def test_custom_scan_script_spectral_selection_only():
    """A script with Ah=Al=0 everywhere (pure spectral selection, no
    successive approximation) — a layout the default script never
    produces — must decode identically too."""
    script = [
        ((0, 1, 2), 0, 0, 0, 0),
        ((0,), 1, 9, 0, 0),
        ((1,), 1, 63, 0, 0),
        ((2,), 1, 63, 0, 0),
        ((0,), 10, 63, 0, 0),
    ]
    img = _img(29, 31, "noise", seed=8)
    px = img.tobytes()
    base = decode(encode(29, 31, px, quality=85))
    prog = decode(encode_progressive(29, 31, px, quality=85,
                                     scan_script=script))
    assert prog["pixels"] == base["pixels"]


@pytest.mark.parametrize("sub", ["4:4:4", "4:2:0", "4:2:2"])
def test_per_component_dc_scans(sub):
    """T.81 permits non-interleaved (Ns=1) DC scans covering each
    component's OWN block grid — which differs from the padded MCU grid
    for subsampled luma, so MCU-order iteration would mis-decode.
    A script with per-component DC first + refinement scans must land
    on exactly the baseline pixels (round-10 ADVICE regression)."""
    script = [
        ((0,), 0, 0, 0, 1),
        ((1,), 0, 0, 0, 1),
        ((2,), 0, 0, 0, 1),
        ((0,), 1, 63, 0, 0),
        ((1,), 1, 63, 0, 0),
        ((2,), 1, 63, 0, 0),
        ((0,), 0, 0, 1, 0),
        ((1,), 0, 0, 1, 0),
        ((2,), 0, 0, 1, 0),
    ]
    img = _img(37, 23, "noise", seed=5)
    px = img.tobytes()
    base = decode(encode(37, 23, px, quality=80, subsampling=sub))
    prog = decode(encode_progressive(37, 23, px, quality=80,
                                     subsampling=sub, scan_script=script))
    assert prog["pixels"] == base["pixels"]


def test_dispatch_through_image_io_and_dhash_grouping():
    """decode_image routes SOF2 automatically, and a progressive
    re-encode of a photo joins its PNG/baseline-JPEG dHash group —
    the cross-format dedup surface gains the progressive member."""
    from verified_sources_spark.llm.image_dedup import _dhash_of_pixels
    from verified_sources_spark.llm.image_io import decode_image
    from verified_sources_spark.llm.png_codec import encode as png_encode

    img = _img(64, 48, "blocks", seed=21)
    px = img.tobytes()
    png = png_encode(64, 48, px, "RGB")
    base = encode(64, 48, px, quality=90)
    prog = encode_progressive(64, 48, px, quality=90, subsampling="4:2:0")

    def dh(payload):
        d = decode_image(payload)
        ch = 3 if d["mode"] == "RGB" else 4
        return _dhash_of_pixels(d["pixels"], d["width"], d["height"], ch, 8)

    out = decode_image(prog)
    assert out["format"] == "jpeg" and (out["width"], out["height"]) == (64, 48)

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(dh(png), dh(prog)) <= 4
    assert ham(dh(base), dh(prog)) <= 2
    other = png_encode(64, 48, _img(64, 48, "blocks", seed=99).tobytes(),
                       "RGB")
    assert ham(dh(other), dh(prog)) > 10


def test_error_paths():
    img = _img(16, 12, "flat").tobytes()
    data = encode_progressive(16, 12, img)
    with pytest.raises(JpegError):
        decode(data[:40])  # truncated mid-header
    with pytest.raises(JpegError, match="not a progressive"):
        decode_progressive(encode(16, 12, img))  # SOF0 into the SOF2 path
    # entropy stream cut mid-scan: typed error, not garbage pixels
    with pytest.raises(JpegError):
        decode_progressive(data[: len(data) - 30] )


def test_default_script_structure_sanity():
    """Pin the canonical script shape: starts with a coarse DC scan,
    refines DC exactly once, and every AC band reaches Al=0."""
    assert DEFAULT_SCRIPT[0][1:] == (0, 0, 0, 1)
    dc_refines = [s for s in DEFAULT_SCRIPT if s[1] == 0 and s[3] > 0]
    assert len(dc_refines) == 1 and dc_refines[0][4] == 0
    for comp in (0, 1, 2):
        final_al = min(
            s[4] for s in DEFAULT_SCRIPT if s[1] > 0 and comp in s[0]
        )
        assert final_al == 0
