"""Pure-stdlib Ogg container probe (Opus + Vorbis identification).

Ogg/Opus is the standard for voice datasets (podcast/ASR corpora ship
as .opus), Ogg/Vorbis for legacy web audio.  The container is a walk
of "OggS" pages — 27-byte header + lacing table + payload — and the
first packet of the first (BOS) page identifies the codec: ``OpusHead``
(channels, pre-skip, input rate; granules always tick at 48 kHz) or
``\\x01vorbis`` (channels, rate).  Duration comes from the LAST page's
granule position, so ``probe`` walks every page header (bounds-checked;
truncation raises ``OggError``) without touching packet payloads.
Page CRCs are not verified (header-only manifests; a corrupt payload
shows up as a truncated/desynced page walk, which raises).

Sample decode refuses WITH THE CODEC NAMED — Opus (CELT/SILK) and
Vorbis (MDCT) synthesis are out of pure-stdlib scope; media ingestion
treats Ogg exact-dedup-only with probed manifests, like MP3/FLAC.

``encode_stub`` emits structurally valid streams (BOS id page, comment
page, EOS data page with a chosen granule) for fixtures.
"""

from __future__ import annotations

import struct

__all__ = ["OggError", "probe", "encode_stub", "decode_samples"]


class OggError(ValueError):
    pass


def _pages(data: bytes):
    """Yield (header_type, granule, serial, payload) per Ogg page."""
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos : pos + 4] != b"OggS":
            raise OggError(f"page sync lost at offset {pos}")
        if pos + 27 > n:
            raise OggError(f"truncated page header at {pos}")
        version = data[pos + 4]
        if version != 0:
            raise OggError(f"unknown Ogg version {version}")
        htype = data[pos + 5]
        (granule,) = struct.unpack_from("<q", data, pos + 6)
        (serial,) = struct.unpack_from("<I", data, pos + 14)
        nsegs = data[pos + 26]
        lace_end = pos + 27 + nsegs
        if lace_end > n:
            raise OggError(f"truncated lacing table at {pos}")
        size = sum(data[pos + 27 : lace_end])
        if lace_end + size > n:
            raise OggError(
                f"truncated page payload at {pos}: "
                f"{n - lace_end} bytes < {size}"
            )
        yield htype, granule, serial, data[lace_end : lace_end + size]
        pos = lace_end + size


def probe(data: bytes) -> dict:
    """Header-only manifest: codec ('opus'/'vorbis'), channels,
    sample_rate, pre_skip (Opus), n_samples (from the final granule),
    duration_ms, n_pages."""
    if data[:4] != b"OggS":
        raise OggError("not an Ogg payload (no OggS magic)")
    codec = None
    channels = None
    rate = None
    pre_skip = 0
    last_granule = 0
    n_pages = 0
    saw_bos = False
    for htype, granule, _serial, payload in _pages(data):
        n_pages += 1
        if htype & 0x2:  # BOS: identification packet
            saw_bos = True
            if payload[:8] == b"OpusHead":
                if len(payload) < 19:
                    raise OggError("truncated OpusHead packet")
                codec = "opus"
                channels = payload[9]
                (pre_skip,) = struct.unpack_from("<H", payload, 10)
                (rate,) = struct.unpack_from("<I", payload, 12)
            elif payload[:7] == b"\x01vorbis":
                if len(payload) < 30:
                    raise OggError("truncated Vorbis id packet")
                codec = "vorbis"
                channels = payload[11]
                (rate,) = struct.unpack_from("<I", payload, 12)
            else:
                raise OggError(
                    f"unrecognized BOS packet {payload[:8]!r} "
                    f"(not Opus or Vorbis)"
                )
        if granule > 0:
            last_granule = granule
    if not saw_bos:
        raise OggError("no BOS page")
    if codec == "opus":
        # Opus granules always tick at 48 kHz, regardless of input rate
        n_samples = max(0, last_granule - pre_skip)
        duration_ms = n_samples * 1000 // 48000
    else:
        n_samples = last_granule
        duration_ms = n_samples * 1000 // rate if rate else 0
    return {
        "codec": codec,
        "channels": channels,
        "sample_rate": rate,
        "pre_skip": pre_skip,
        "n_samples": n_samples,
        "duration_ms": duration_ms,
        "n_pages": n_pages,
    }


def decode_samples(data: bytes):
    """Honest refusal: Opus (CELT/SILK) and Vorbis (MDCT) synthesis are
    out of pure-stdlib scope.  ``probe`` serves manifests; exact dedup
    still applies to the bytes."""
    m = probe(data)  # broken payloads say "broken", not "refused"
    raise NotImplementedError(
        f"cannot decode Ogg {m['codec']} to PCM here "
        f"({'CELT/SILK' if m['codec'] == 'opus' else 'MDCT'} synthesis); "
        f"probe() serves manifests"
    )


# --------------------------------------------------------------- fixtures
def _page(htype: int, granule: int, payload: bytes, seq: int,
          serial: int = 1) -> bytes:
    laces = []
    rest = len(payload)
    while rest >= 255:
        laces.append(255)
        rest -= 255
    laces.append(rest)
    head = (b"OggS" + b"\x00" + bytes([htype])
            + struct.pack("<q", granule) + struct.pack("<I", serial)
            + struct.pack("<I", seq) + b"\x00\x00\x00\x00"
            + bytes([len(laces)]) + bytes(laces))
    return head + payload


def encode_stub(
    codec: str = "opus",
    channels: int = 1,
    sample_rate: int = 48000,
    granule: int = 48000,
    pre_skip: int = 0,
    frame_bytes: bytes = b"\x00" * 40,
) -> bytes:
    """Structurally valid minimal Ogg stream: BOS id page + comment
    page + EOS data page carrying ``granule`` (CRCs zero — the probe is
    header-only by design)."""
    if codec == "opus":
        ident = (b"OpusHead" + bytes([1, channels])
                 + struct.pack("<H", pre_skip)
                 + struct.pack("<I", sample_rate)
                 + struct.pack("<h", 0) + b"\x00")
        comment = b"OpusTags" + struct.pack("<I", 4) + b"stub" + struct.pack("<I", 0)
    elif codec == "vorbis":
        ident = (b"\x01vorbis" + struct.pack("<I", 0) + bytes([channels])
                 + struct.pack("<I", sample_rate)
                 + struct.pack("<iii", 0, 0, 0) + bytes([0xB8, 0x01]))
        comment = (b"\x03vorbis" + struct.pack("<I", 4) + b"stub"
                   + struct.pack("<I", 0) + b"\x01")
    else:
        raise OggError(f"unsupported stub codec {codec!r}")
    return (_page(0x2, 0, ident, 0)
            + _page(0x0, 0, comment, 1)
            + _page(0x4, granule, frame_bytes, 2))
