"""Property-based tests (hypothesis) for the three pure-stdlib media
codecs — roundtrip and refusal invariants that must hold for ANY input,
not just fixtures.  At 100 TB the decode pass meets every width, rate,
frame count, and corruption the wild produces; these pin the codec
contracts across that space (no Spark session: codecs are plain
functions the executors call)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from verified_sources_spark.llm import avi_codec, png_codec, wav_codec

_fast = settings(max_examples=25, deadline=None)


# ---------------------------------------------------------------- PNG

@_fast
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 30),
    mode=st.sampled_from(["RGB", "RGBA"]),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_any_dims(w, h, mode, seed):
    ch = 3 if mode == "RGB" else 4
    pixels = np.random.default_rng(seed).integers(
        0, 256, size=h * w * ch
    ).astype(np.uint8).tobytes()
    im = png_codec.decode(png_codec.encode(w, h, pixels, mode))
    assert (im["width"], im["height"], im["mode"]) == (w, h, mode)
    assert im["pixels"] == pixels


@_fast
@given(junk=st.binary(min_size=0, max_size=64))
def test_png_decode_never_hangs_or_misdecodes_junk(junk):
    # anything that decodes must be a real PNG; junk raises, never loops
    if junk[:8] == b"\x89PNG\r\n\x1a\n":
        pytest.skip("strategy produced a real signature prefix")
    with pytest.raises(Exception):
        png_codec.decode(junk)


# ---------------------------------------------------------------- WAV

@_fast
@given(
    n=st.integers(1, 400),
    rate=st.sampled_from([8000, 11025, 16000, 44100]),
    channels=st.integers(1, 2),
    bits=st.sampled_from([8, 16]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_any_shape(n, rate, channels, bits, seed):
    x = np.random.default_rng(seed).uniform(-1, 1, size=(n, channels))
    m = wav_codec.decode(wav_codec.encode(x, rate, bits=bits))
    assert m["sample_rate"] == rate
    assert m["n_frames"] == n and m["channels"] == channels
    assert m["samples"].shape == (n, channels)
    # quantization error bounded by half an LSB plus the
    # spec-conventional scale asymmetry (encode x*(2^(b-1)-1), decode
    # /2^(b-1) -> inherent |x|/2^(b-1) bias): 1/2^(b-1) + 1/2^b worst case
    half = 128 if bits == 8 else 32768
    tol = 1.0 / half + 0.5 / half + 1e-9
    assert np.max(np.abs(m["samples"] - x)) <= tol


@_fast
@given(
    n=st.integers(1, 200),
    bits=st.sampled_from([8, 16]),
    cut=st.integers(0, 40),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_truncation_never_misreports(n, bits, cut, seed):
    """A truncated payload either raises or reports only FULL frames it
    can actually back with bytes — never fabricates samples."""
    x = np.random.default_rng(seed).uniform(-1, 1, size=n)
    data = wav_codec.encode(x, 8000, bits=bits)
    trunc = data[: max(0, len(data) - cut)]
    try:
        m = wav_codec.decode(trunc)
    except Exception:
        return
    assert m["n_frames"] * m["block_align"] <= len(trunc)
    assert m["samples"].shape[0] == m["n_frames"]


# ---------------------------------------------------------------- AVI

@_fast
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 18),
    n=st.integers(1, 6),
    fps=st.sampled_from([5.0, 10.0, 24.0, 30.0]),
    seed=st.integers(0, 2**31 - 1),
)
def test_avi_roundtrip_any_dims(w, h, n, fps, seed):
    frames = [
        np.random.default_rng(seed + k).integers(
            0, 256, size=(h, w, 3)
        ).astype(np.uint8)
        for k in range(n)
    ]
    data = avi_codec.encode(frames, fps=fps, width=w, height=h)
    m = avi_codec.probe(data)
    assert (m["width"], m["height"], m["n_frames"]) == (w, h, n)
    assert m["fps"] == pytest.approx(fps, rel=1e-3)
    for k in range(n):
        assert avi_codec.decode_frame(data, m, k) == frames[k].tobytes()


@_fast
@given(
    cut=st.integers(1, 200),
    seed=st.integers(0, 2**31 - 1),
)
def test_avi_truncation_raises_never_misdecodes(cut, seed):
    frames = [
        np.random.default_rng(seed).integers(0, 256, size=(8, 10, 3)).astype(np.uint8)
        for _ in range(3)
    ]
    data = avi_codec.encode(frames, fps=10.0, width=10, height=8)
    trunc = data[: max(12, len(data) - cut)]
    try:
        m = avi_codec.probe(trunc)
    except avi_codec.AviError:
        return
    # probe succeeded on a shorter payload only if every surviving frame
    # offset is still fully in-bounds — decode must then be byte-exact
    for k in range(len(m["frame_offsets"])):
        assert avi_codec.decode_frame(trunc, m, k) == frames[k].tobytes()


@_fast
@given(junk=st.binary(min_size=0, max_size=64))
def test_avi_probe_rejects_junk(junk):
    if junk[:4] == b"RIFF":
        pytest.skip("strategy produced a RIFF prefix")
    with pytest.raises(avi_codec.AviError):
        avi_codec.probe(junk)
