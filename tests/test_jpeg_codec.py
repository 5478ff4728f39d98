"""Pure-stdlib baseline JPEG codec (llm/jpeg_codec.py): marker parsing,
Huffman entropy coding, IDCT correctness vs an independent naive
implementation, 4:4:4 / 4:2:0 / grayscale layouts, restart intervals,
honest refusal of progressive/arithmetic variants."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from verified_sources_spark.llm.jpeg_codec import (
    JpegError,
    _dct_matrix,
    decode,
    encode,
    probe,
)


def _gradient(w=32, h=24):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [xx * 255 // (w - 1), yy * 255 // (h - 1), (xx + yy) * 255 // (w + h - 2)],
        axis=2,
    ).astype(np.uint8)


def _rgb(d, w, h):
    return np.frombuffer(d["pixels"], dtype=np.uint8).reshape(h, w, 3)


def test_idct_matches_naive_formula():
    """The matrix IDCT must agree with the T.81 textbook double sum —
    an INDEPENDENT implementation, so a shared encoder/decoder bug in
    the fast path cannot hide."""
    rng = np.random.default_rng(7)
    F = rng.normal(0, 50, size=(8, 8))
    C = _dct_matrix()
    fast = C.T @ F @ C
    naive = np.zeros((8, 8))
    for x in range(8):
        for y_ in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu * cv * F[u, v]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y_ + 1) * v * np.pi / 16)
                    )
            naive[x, y_] = s / 4.0
    assert np.abs(fast - naive).max() < 1e-9


def test_uniform_color_roundtrips_exactly():
    img = np.full((16, 16, 3), [120, 64, 200], dtype=np.uint8)
    d = decode(encode(16, 16, img.tobytes(), quality=90))
    assert (d["width"], d["height"], d["mode"]) == (16, 16, "RGB")
    assert np.array_equal(_rgb(d, 16, 16), img)


@pytest.mark.parametrize("sub", ["4:4:4", "4:2:2", "4:2:0"])
def test_gradient_roundtrip_within_lossy_tolerance(sub):
    img = _gradient()
    d = decode(encode(32, 24, img.tobytes(), quality=95, subsampling=sub))
    err = np.abs(_rgb(d, 32, 24).astype(float) - img.astype(float))
    assert err.mean() < (1.0 if sub == "4:4:4" else 4.0)
    assert probe(encode(32, 24, img.tobytes(), subsampling=sub))["sampling"] == sub


def test_non_multiple_of_8_dims():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(17, 19, 3)).astype(np.uint8)
    d = decode(encode(19, 17, img.tobytes(), quality=90))
    assert (d["width"], d["height"]) == (19, 17)
    # lossy but strongly correlated, never garbage
    err = np.abs(_rgb(d, 19, 17).astype(float) - img.astype(float)).mean()
    assert err < 20


def test_grayscale_single_component():
    img = _gradient(16, 16)
    data = encode(16, 16, img.tobytes(), grayscale=True)
    m = probe(data)
    assert m["n_components"] == 1 and m["sampling"] == "gray"
    d = decode(data)
    luma = 0.299 * img[:, :, 0] + 0.587 * img[:, :, 1] + 0.114 * img[:, :, 2]
    got = _rgb(d, 16, 16)
    assert np.array_equal(got[:, :, 0], got[:, :, 1])  # Y replicated
    assert np.abs(got[:, :, 0].astype(float) - luma).max() < 3


@pytest.mark.parametrize("sub,ri", [("4:4:4", 2), ("4:2:0", 1), ("4:2:2", 2), ("4:4:4", 3)])
def test_restart_intervals_roundtrip(sub, ri):
    """DRI/RSTn: predictor reset + byte-align must reproduce the exact
    same pixels as the unsegmented stream."""
    img = _gradient(40, 24)
    plain = decode(encode(40, 24, img.tobytes(), quality=95, subsampling=sub))
    rst = decode(
        encode(40, 24, img.tobytes(), quality=95, subsampling=sub,
               restart_interval=ri)
    )
    assert plain["pixels"] == rst["pixels"]


def test_probe_refuses_nothing_decode_refuses_progressive():
    img = _gradient(16, 16)
    data = bytearray(encode(16, 16, img.tobytes()))
    # patch SOF0 (0xFFC0) to SOF2 (progressive)
    i = bytes(data).index(b"\xff\xc0")
    data[i + 1] = 0xC2
    m = probe(bytes(data))
    assert m["variant"] == "progressive (SOF2)"  # manifests still see it
    with pytest.raises(JpegError, match="progressive"):
        decode(bytes(data))


def test_sof1_extended_sequential_decodes_as_baseline():
    """8-bit extended sequential (SOF1) is bit-identical to SOF0
    decode — its only deltas are 12-bit precision and Huffman table
    ids 2-3, both handled generically; 12-bit still refuses."""
    img = _gradient(32, 24)
    data = encode(32, 24, img.tobytes(), quality=90)
    base = decode(data)
    i = data.index(b"\xff\xc0")
    sof1 = data[:i] + b"\xff\xc1" + data[i + 2:]
    assert probe(sof1)["variant"] == "extended sequential (SOF1)"
    got = decode(sof1)
    assert got["pixels"] == base["pixels"]
    twelve = bytearray(sof1)
    twelve[i + 4] = 12  # precision byte inside the SOF payload
    with pytest.raises(JpegError, match="12-bit"):
        decode(bytes(twelve))


def test_rejects_non_jpeg_and_truncation():
    with pytest.raises(JpegError, match="SOI"):
        probe(b"not a jpeg")
    img = _gradient(16, 16)
    data = encode(16, 16, img.tobytes())
    with pytest.raises(JpegError):
        decode(data[: len(data) // 3])
    # truncation INSIDE the entropy stream (headers intact)
    with pytest.raises(JpegError, match="truncated|Huffman"):
        decode(data[: len(data) - 40])


def test_byte_stuffing_roundtrip():
    """Content tuned to produce 0xFF bytes in the entropy stream — the
    stuffed 0xFF00 must be transparent."""
    rng = np.random.default_rng(11)
    for seed in range(4):
        img = rng.integers(0, 256, size=(8, 8, 3)).astype(np.uint8)
        data = encode(8, 8, img.tobytes(), quality=99)
        d = decode(data)  # would desync on any stuffing bug
        assert (d["width"], d["height"]) == (8, 8)


def test_decoder_handles_16bit_quant_tables():
    """DQT precision=1 (16-bit entries) parses — craft by patching an
    8-bit table into a 16-bit one."""
    img = np.full((8, 8, 3), 99, dtype=np.uint8)
    data = encode(8, 8, img.tobytes())
    i = bytes(data).index(b"\xff\xdb")
    (ln,) = struct.unpack_from(">H", data, i + 2)
    assert ln == 67  # 2 + 1 + 64
    pq_tid = data[i + 4]
    body = data[i + 5 : i + 5 + 64]
    wide = b"".join(struct.pack(">H", v) for v in body)
    patched = (
        data[:i]
        + b"\xff\xdb" + struct.pack(">H", 2 + 1 + 128)
        + bytes([0x10 | (pq_tid & 0xF)]) + wide
        + data[i + 2 + ln:]
    )
    d = decode(patched)
    assert np.array_equal(_rgb(d, 8, 8), img)


def test_extract_features_image_decoder_mixed_formats(spark):
    """decoder='image' sniffs PNG vs JPEG per asset in one pass — the
    manifest-building mode for a mixed-format corpus."""
    from verified_sources_spark.llm.multimodal import extract_features
    from verified_sources_spark.llm.png_codec import encode as png_encode

    img = _gradient(16, 16)
    rows = [
        (1, bytearray(png_encode(16, 16, img.tobytes(), "RGB"))),
        (2, bytearray(encode(16, 16, img.tobytes(), quality=90))),
        (3, bytearray(encode(16, 16, img.tobytes(), grayscale=True))),
        (4, bytearray(b"not an image")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, asset binary")
    got = {r.doc_id: r for r in extract_features(df, decoder="image").collect()}
    assert got[1].format == "PNG" and got[1].width == 16
    assert got[2].format == "JPEG" and got[2].mode == "RGB"
    assert got[3].format == "JPEG" and got[3].mode == "L"
    assert not got[4].decoded_ok
