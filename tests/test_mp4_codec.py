"""Pure-stdlib ISO-BMFF probe (llm/mp4_codec.py): box-tree walk over
files the fixture encoder did NOT emit byte-for-byte (reordered boxes,
version-1 64-bit fields, largesize, audio tracks, size-0 boxes, legacy
no-ftyp MOV layouts), bounds-checked error paths, and the video_io
sniff/probe/decoder= integration that makes MP4s first-class probed
manifests while pixel decode refuses with the codec named."""

from __future__ import annotations

import struct

import pytest

from verified_sources_spark.llm.mp4_codec import (
    Mp4Error,
    encode_stub,
    probe,
)


def _box(fourcc: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + fourcc + body


def _fullb(fourcc: bytes, ver: int, body: bytes) -> bytes:
    return _box(fourcc, bytes([ver, 0, 0, 0]) + body)


def _largebox(fourcc: bytes, body: bytes) -> bytes:
    """64-bit largesize form: size==1, then 8-byte size after fourcc."""
    return (
        struct.pack(">I", 1) + fourcc + struct.pack(">Q", 16 + len(body)) + body
    )


def _video_trak(w=32, h=24, n=10, timescale=600, delta=60, codec=b"avc1",
                ver=0, stts_first=False):
    """Hand-rolled video trak — box ORDER differs from encode_stub
    (mdhd after hdlr, stsz before stsd when stts_first)."""
    if ver == 1:
        mdhd = _fullb(b"mdhd", 1,
                      struct.pack(">QQIQ", 0, 0, timescale, n * delta)
                      + b"\x00" * 4)
    else:
        mdhd = _fullb(b"mdhd", 0,
                      struct.pack(">IIII", 0, 0, timescale, n * delta)
                      + b"\x00" * 4)
    tkhd = _fullb(b"tkhd", 0,
                  struct.pack(">IIIII", 0, 0, 1, 0, n * delta) + b"\x00" * 52
                  + struct.pack(">II", w << 16, h << 16))
    hdlr = _fullb(b"hdlr", 0, b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"x\x00")
    entry = _box(codec, b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 16
                 + struct.pack(">HH", w, h) + b"\x00" * 50)
    stsd = _fullb(b"stsd", 0, struct.pack(">I", 1) + entry)
    stts = _fullb(b"stts", 0, struct.pack(">III", 1, n, delta))
    stsz = _fullb(b"stsz", 0, struct.pack(">II", 0, n)
                  + b"\x00\x00\x00\x01" * n)
    stbl_children = (stts + stsz + stsd) if stts_first else (stsd + stts + stsz)
    stbl = _box(b"stbl", stbl_children)
    minf = _box(b"minf", _box(b"vmhd", b"\x00" * 12) + stbl)
    # hdlr BEFORE mdhd — legal, encode_stub never emits this order
    mdia = _box(b"mdia", hdlr + mdhd + minf)
    return _box(b"trak", tkhd + mdia)


def _audio_trak(channels=2, rate=44100, n=100, timescale=44100):
    mdhd = _fullb(b"mdhd", 0,
                  struct.pack(">IIII", 0, 0, timescale, n * 441) + b"\x00" * 4)
    tkhd = _fullb(b"tkhd", 0, struct.pack(">IIIII", 0, 0, 2, 0, n * 441)
                  + b"\x00" * 52 + struct.pack(">II", 0, 0))
    hdlr = _fullb(b"hdlr", 0, b"\x00" * 4 + b"soun" + b"\x00" * 12 + b"a\x00")
    # AudioSampleEntry: 6 reserved + dref(2) + ver/rev/vendor(8) +
    # channelcount(2) + samplesize(2) + pre_defined(2) + reserved(2) +
    # samplerate 16.16(4)
    entry = _box(b"mp4a", b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 8
                 + struct.pack(">HH", channels, 16) + b"\x00" * 4
                 + struct.pack(">I", rate << 16))
    stsd = _fullb(b"stsd", 0, struct.pack(">I", 1) + entry)
    stsz = _fullb(b"stsz", 0, struct.pack(">II", 0, n) + b"\x00\x00\x00\x02" * n)
    stbl = _box(b"stbl", stsd + stsz)
    minf = _box(b"minf", _box(b"smhd", b"\x00" * 8) + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    return _box(b"trak", tkhd + mdia)


def _ftyp(brand=b"isom"):
    return _box(b"ftyp", brand + struct.pack(">I", 512) + b"mp41")


# ------------------------------------------------------------- fixtures
def test_stub_roundtrip_v0_and_v1():
    for ver in (0, 1):
        m = probe(encode_stub(width=64, height=48, n_frames=30, fps=15.0,
                              version=ver))
        assert (m["width"], m["height"]) == (64, 48)
        assert m["n_frames"] == 30
        assert m["fps"] == pytest.approx(15.0)
        assert m["duration_ms"] == 2000
        assert m["codec"] == "avc1" and m["brand"] == "isom"
        assert m["has_audio"] is False


# -------------------------------------------- files the stub never emits
def test_reordered_boxes_and_v1_mdhd():
    """hdlr before mdhd, stts/stsz before stsd, moov AFTER mdat,
    version-1 mvhd/mdhd — all layouts encode_stub cannot produce."""
    trak = _video_trak(w=320, h=240, n=24, timescale=2400, delta=100,
                       codec=b"hev1", ver=1, stts_first=True)
    mvhd = _fullb(b"mvhd", 1,
                  struct.pack(">QQIQ", 0, 0, 2400, 2400) + b"\x00" * 80)
    moov = _box(b"moov", mvhd + trak)
    data = _ftyp(b"mp42") + _box(b"mdat", b"\x00" * 32) + moov
    m = probe(data)
    assert (m["width"], m["height"]) == (320, 240)
    assert m["n_frames"] == 24
    assert m["fps"] == pytest.approx(24.0)
    assert m["duration_ms"] == 1000
    assert m["codec"] == "hev1" and m["brand"] == "mp42"


def test_largesize_and_size0_boxes():
    """moov carried in a 64-bit largesize box; trailing size-0
    (to-end-of-file) mdat."""
    trak = _video_trak(n=5, timescale=1000, delta=200)
    mvhd = _fullb(b"mvhd", 0, struct.pack(">IIII", 0, 0, 1000, 1000)
                  + b"\x00" * 80)
    moov_large = _largebox(b"moov", mvhd + trak)
    mdat0 = struct.pack(">I", 0) + b"mdat" + b"\xff" * 40  # size 0 = to EOF
    m = probe(_ftyp() + moov_large + mdat0)
    assert m["n_frames"] == 5 and m["fps"] == pytest.approx(5.0)
    assert m["duration_ms"] == 1000


def test_audio_track_and_multitrack():
    data = _ftyp() + _box(
        b"moov",
        _fullb(b"mvhd", 0, struct.pack(">IIII", 0, 0, 600, 1200) + b"\x00" * 80)
        + _video_trak(n=8, timescale=600, delta=150)
        + _audio_trak(channels=2, rate=44100),
    )
    m = probe(data)
    assert m["has_audio"] is True
    assert m["audio_channels"] == 2 and m["audio_sample_rate"] == 44100
    assert m["n_frames"] == 8  # video track facts unaffected by audio
    assert len(m["tracks"]) == 2
    assert {t["handler"] for t in m["tracks"]} == {"vide", "soun"}
    assert m["duration_ms"] == 2000


def test_legacy_mov_without_ftyp():
    """QuickTime legacy: wide/skip prelude, no ftyp — probes with
    brand=None (ADVICE: ftyp-first must not be required)."""
    trak = _video_trak(n=4, timescale=400, delta=100)
    mvhd = _fullb(b"mvhd", 0, struct.pack(">IIII", 0, 0, 400, 400)
                  + b"\x00" * 80)
    data = _box(b"wide", b"") + _box(b"skip", b"\x00" * 4) + _box(
        b"moov", mvhd + trak
    )
    m = probe(data)
    assert m["brand"] is None
    assert m["n_frames"] == 4 and m["fps"] == pytest.approx(4.0)


# ------------------------------------------------------------- fragmented
def test_fragmented_media_segment_probes():
    """styp + sidx + moof/mdat (a DASH/CMAF media segment, no moov):
    sample counts from trun, duration from sidx subsegment math."""
    from verified_sources_spark.llm.mp4_codec import encode_fragmented_stub

    m = probe(encode_fragmented_stub(n_fragments=4, samples_per_fragment=12,
                                     sample_duration=50, timescale=600))
    assert m["fragmented"] is True and m["n_fragments"] == 4
    assert m["brand"] == "msdh"
    assert m["n_frames"] == 48
    assert m["duration_ms"] == 4 * 12 * 50 * 1000 // 600


def test_fragmented_per_sample_trun_durations():
    from verified_sources_spark.llm.mp4_codec import encode_fragmented_stub

    m = probe(encode_fragmented_stub(n_fragments=2, samples_per_fragment=7,
                                     with_sidx=False,
                                     per_sample_durations=True))
    assert m["fragmented"] and m["n_frames"] == 14
    # no sidx and no moov: the segment has no timescale, duration stays 0
    assert m["duration_ms"] == 0


def test_fragmented_init_moov_trex_defaults():
    """ftyp + moov(empty stbl + mvex/trex) + moof runs: durations
    resolve through the trex default, dims/codec come from moov."""
    from verified_sources_spark.llm.mp4_codec import encode_fragmented_stub

    m = probe(encode_fragmented_stub(n_fragments=3, samples_per_fragment=10,
                                     sample_duration=100, timescale=1000,
                                     init_moov=True, with_sidx=False))
    assert m["fragmented"] and m["n_fragments"] == 3
    assert m["n_frames"] == 30 and m["duration_ms"] == 3000
    assert m["codec"] == "avc1" and (m["width"], m["height"]) == (64, 48)
    assert m["fps"] == pytest.approx(10.0)


# ------------------------------------------------------------ error paths
def test_error_not_isobmff():
    with pytest.raises(Mp4Error, match="not an ISO-BMFF"):
        probe(b"\x00" * 64)
    with pytest.raises(Mp4Error):
        probe(encode_stub()[:10])  # shorter than any box header


def test_error_truncated_box():
    data = encode_stub()
    with pytest.raises(Mp4Error, match="truncated"):
        probe(data[:60])  # cuts inside moov


def test_error_no_moov():
    with pytest.raises(Mp4Error, match="no moov"):
        probe(_ftyp() + _box(b"mdat", b"\x00" * 16))


def test_error_truncated_mvhd_is_mp4error_not_struct_error():
    """ADVICE: a short-but-in-buffer mvhd must raise Mp4Error, not a
    bare struct.error, and must not read adjacent boxes' bytes."""
    short_mvhd = _fullb(b"mvhd", 0, b"\x00" * 4)  # far too short
    data = _ftyp() + _box(b"moov", short_mvhd + _box(b"free", b"\xaa" * 64))
    with pytest.raises(Mp4Error, match="mvhd"):
        probe(data)


def test_error_truncated_stts_inside_buffer():
    """stts declaring more entries than its box holds must refuse, not
    read the neighbouring box as entry data."""
    stts_bad = _fullb(b"stts", 0, struct.pack(">I", 100))  # claims 100 entries
    stbl = _box(b"stbl", stts_bad)
    minf = _box(b"minf", stbl)
    mdhd = _fullb(b"mdhd", 0, struct.pack(">IIII", 0, 0, 600, 600) + b"\x00" * 4)
    hdlr = _fullb(b"hdlr", 0, b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"x\x00")
    trak = _box(b"trak", _box(b"mdia", mdhd + hdlr + minf))
    data = _ftyp() + _box(
        b"moov",
        _fullb(b"mvhd", 0, struct.pack(">IIII", 0, 0, 600, 600) + b"\x00" * 80)
        + trak,
    )
    with pytest.raises(Mp4Error, match="stts"):
        probe(data)


# --------------------------------------------------- video_io integration
def test_video_io_sniff_and_probe():
    from verified_sources_spark.llm.video_io import (
        probe_video,
        sniff_video_format,
    )

    data = encode_stub(width=64, height=48, n_frames=12, fps=12.0)
    assert sniff_video_format(data) == "mp4"
    m = probe_video(data)
    assert m["container"] == "mp4" and m["codec"] == "avc1"
    assert (m["width"], m["height"], m["n_frames"]) == (64, 48, 12)
    assert m["fps"] == pytest.approx(12.0)
    assert m["duration_ms"] == 1000
    assert m["raw"]["brand"] == "isom"


def test_video_io_refusal_names_codec():
    from verified_sources_spark.llm.video_io import (
        VideoDecodeRefusal,
        probe_video,
        sample_frames,
    )

    data = encode_stub(codec=b"hev1")
    meta = probe_video(data)
    with pytest.raises(VideoDecodeRefusal, match="hev1"):
        sample_frames(data, meta, every_ms=500)


def test_video_io_decoder_seam():
    """A registered decoder lights up sampling without touching the
    probe path; an unknown decoder name fails loudly."""
    from verified_sources_spark.llm.video_io import (
        probe_video,
        register_mp4_decoder,
        sample_frames,
    )

    data = encode_stub(width=8, height=6, n_frames=4, fps=4.0)
    meta = probe_video(data)

    def fake_decoder(payload, m, every_ms):
        rgb = bytes([7]) * (m["width"] * m["height"] * 3)
        return [(i, i * every_ms, rgb) for i in range(2)]

    register_mp4_decoder("fake", fake_decoder)
    try:
        out = sample_frames(data, meta, every_ms=250, decoder="fake")
        assert [(i, t) for i, t, _ in out] == [(0, 0), (1, 250)]
        assert all(len(rgb) == 8 * 6 * 3 for _, _, rgb in out)
        with pytest.raises(ValueError, match="decoder registered"):
            sample_frames(data, meta, every_ms=250, decoder="pyav")
    finally:
        from verified_sources_spark.llm import video_io

        video_io._MP4_DECODERS.pop("fake", None)


def test_media_ingest_mp4_is_exact_only():
    """perceptual_fingerprint must refuse MP4s (codec named) so the
    ledger ingests them exact-dedup-only — with the probe still
    available for manifests."""
    from verified_sources_spark.streaming.media_ingest import (
        perceptual_fingerprint,
    )

    data = encode_stub()
    with pytest.raises(NotImplementedError, match="avc1"):
        perceptual_fingerprint(data)
