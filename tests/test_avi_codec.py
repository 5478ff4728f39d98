"""Pure-stdlib AVI codec (llm/avi_codec.py): RIFF structure, BI_RGB
frame decode, header-only probe, time-based frame sampling, honest
refusal on compressed fourccs."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from verified_sources_spark.llm.avi_codec import (
    AviError,
    decode_frame,
    encode,
    frame_indices_every_ms,
    probe,
)


def _frames(n, w=16, h=12, seed=0):
    """Deterministic structured frames: seeded coarse pattern drifting
    with frame index, so adjacent-cell dHash comparisons carry signal."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
    out = []
    for t in range(n):
        f = base.copy()
        f[(t * 3) % h, :, :] = 255  # moving bright row
        out.append(f)
    return out


def test_roundtrip_probe_and_decode():
    frames = _frames(5)
    data = encode(frames, fps=10.0, width=16, height=12)
    m = probe(data)
    assert (m["width"], m["height"]) == (16, 12)
    assert m["n_frames"] == 5 and m["codec"] == "BI_RGB" and m["bits"] == 24
    assert m["fps"] == pytest.approx(10.0)
    assert m["duration_ms"] == 500
    for i, f in enumerate(frames):
        assert decode_frame(data, m, i) == f.tobytes()


def test_row_padding_roundtrip():
    # width 10 -> row stride 30 pads to 32: exercises the DIB 4-byte rule
    frames = _frames(2, w=10, h=7, seed=3)
    data = encode(frames, fps=5.0, width=10, height=7)
    m = probe(data)
    assert decode_frame(data, m, 1) == frames[1].tobytes()


def test_probe_rejects_non_avi():
    with pytest.raises(AviError, match="not a RIFF/AVI"):
        probe(b"plainly not a video")
    # a WAV is RIFF but not AVI
    from verified_sources_spark.llm.wav_codec import encode as wav_encode

    with pytest.raises(AviError, match="not a RIFF/AVI"):
        probe(wav_encode(np.zeros(100), 8000))


def test_probe_rejects_truncated():
    data = encode(_frames(3), fps=10.0, width=16, height=12)
    with pytest.raises(AviError, match="truncated"):
        probe(data[: len(data) // 2])


def test_unknown_fourcc_probes_but_refuses_decode():
    data = bytearray(encode(_frames(2), fps=10.0, width=16, height=12))
    # flip strf.biCompression from 0 (BI_RGB) to 'H264'
    off = data.find(b"strf") + 8 + 16
    assert struct.unpack_from("<I", data, off)[0] == 0
    struct.pack_into("<4s", data, off, b"H264")
    m = probe(bytes(data))
    assert m["codec"] == "H264"  # probe still works: manifests need this
    with pytest.raises(AviError, match="H264"):
        decode_frame(bytes(data), m, 0)


def _coarse_frames(n, w=16, h=12, seed=0):
    """Blocky structured frames (JPEG-friendly: noise fixtures measure
    ~6 mean err at q95, which tests the codec's worst case, not the
    container plumbing this test is about)."""
    out = []
    for t in range(n):
        rng = np.random.default_rng(seed * 100 + t)
        coarse = rng.integers(0, 256, size=(3, 4))
        gray = coarse[(np.arange(h) * 3) // h][:, (np.arange(w) * 4) // w]
        out.append(np.stack([gray] * 3, axis=2).astype(np.uint8))
    return out


def test_mjpg_roundtrip_and_corrupt_frame():
    frames = _coarse_frames(3, seed=5)
    data = encode(frames, fps=10.0, width=16, height=12, codec="MJPG",
                  quality=95)
    m = probe(data)
    assert m["codec"] == "MJPG" and m["n_frames"] == 3
    for i, f in enumerate(frames):
        got = np.frombuffer(decode_frame(data, m, i), dtype=np.uint8)
        err = np.abs(got.astype(float) - f.ravel().astype(float)).mean()
        assert err < 3  # lossy but faithful
    # a non-JPEG byte blob labeled MJPG raises, never mis-decodes
    bad = bytearray(data)
    start, _size = m["frame_offsets"][0]
    bad[start : start + 2] = b"XX"
    with pytest.raises(AviError, match="MJPG frame 0"):
        decode_frame(bytes(bad), probe(bytes(bad)), 0)


def test_mjpg_omit_dht_convention():
    """OpenDML MJPG streams omit DHT segments; the decoder falls back
    to the T.81 Annex K typical tables."""
    from verified_sources_spark.llm.jpeg_codec import decode as jdec

    img = _coarse_frames(1, seed=9)[0]
    data = encode([img], fps=10.0, width=16, height=12, codec="MJPG",
                  quality=90)
    m = probe(data)
    start, size = m["frame_offsets"][0]
    jpg = bytearray(data[start : start + size])
    out = bytearray(jpg[:2])
    i = 2
    while i < len(jpg):
        if jpg[i] == 0xFF and jpg[i + 1] == 0xC4:  # strip DHT
            (ln,) = struct.unpack_from(">H", jpg, i + 2)
            i += 2 + ln
            continue
        if jpg[i] == 0xFF and jpg[i + 1] == 0xDA:
            out += jpg[i:]
            break
        (ln,) = struct.unpack_from(">H", jpg, i + 2)
        out += jpg[i : i + 2 + ln]
        i += 2 + ln
    d = jdec(bytes(out))
    got = np.frombuffer(d["pixels"], dtype=np.uint8)
    err = np.abs(got.astype(float) - img.ravel().astype(float)).mean()
    assert err < 4


def test_frame_index_out_of_range():
    data = encode(_frames(2), fps=10.0, width=16, height=12)
    m = probe(data)
    with pytest.raises(AviError, match="out of range"):
        decode_frame(data, m, 2)


def test_frame_sampling_every_ms():
    data = encode(_frames(10), fps=10.0, width=16, height=12)  # 1000 ms
    m = probe(data)
    # every 250 ms -> ts 0,250,500,750,1000 -> frames 0,2,5,7,9
    assert frame_indices_every_ms(m, 250) == [
        (0, 0), (2, 250), (5, 500), (7, 750), (9, 1000)
    ]
    # coarser than the clip -> first frame only
    assert frame_indices_every_ms(m, 5000) == [(0, 0)]
    # finer than the frame spacing never duplicates indices
    idxs = [i for i, _ in frame_indices_every_ms(m, 10)]
    assert idxs == sorted(set(idxs))
    with pytest.raises(AviError, match="positive"):
        frame_indices_every_ms(m, 0)
