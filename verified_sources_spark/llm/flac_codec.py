"""Pure-stdlib FLAC metadata probe (STREAMINFO + block walk).

FLAC is the dominant lossless audio container in archival/music
corpora.  Its metadata layer is trivially stdlib-readable: a "fLaC"
magic, then a chain of (is_last | type, 24-bit length) blocks, the
first of which MUST be STREAMINFO — 34 bytes carrying everything a
100 TB curation manifest needs: sample rate, channels, bit depth,
total samples (→ exact duration), min/max block and frame sizes, and
the unencoded-audio MD5.  ``probe`` walks every block (bounds-checked;
truncation raises ``FlacError``, never a bare struct.error), also
surfacing Vorbis-comment counts and seektable/picture presence.

``decode_samples`` refuses loudly WITH THE CODEC NAMED (FLAC subframe
decode = LPC prediction + Rice-coded residuals — out of scope here),
so media ingestion treats FLAC exact-dedup-only while manifests stay
first-class: the same posture as MP3 and MP4.

``encode_stub`` emits structurally valid files (STREAMINFO + optional
PADDING / VORBIS_COMMENT / SEEKTABLE blocks + an opaque frame section)
for fixtures; tests probe layouts the stub does not emit plus every
error path.
"""

from __future__ import annotations

import struct

__all__ = ["FlacError", "probe", "encode_stub", "decode_samples"]

_BLOCK_NAMES = {0: "STREAMINFO", 1: "PADDING", 2: "APPLICATION",
                3: "SEEKTABLE", 4: "VORBIS_COMMENT", 5: "CUESHEET",
                6: "PICTURE"}


class FlacError(ValueError):
    pass


def probe(data: bytes) -> dict:
    """Header-only manifest: sample_rate, channels, bits_per_sample,
    total_samples, duration_ms, md5 (hex), block inventory, Vorbis
    comment count.  Audio frames are never touched."""
    if data[:4] != b"fLaC":
        raise FlacError("not a FLAC payload (no fLaC magic)")
    pos = 4
    streaminfo = None
    blocks: list[str] = []
    n_comments = None
    last = False
    while not last:
        if pos + 4 > len(data):
            raise FlacError(f"truncated metadata block header at {pos}")
        hdr = data[pos]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        if btype == 127:
            raise FlacError("invalid metadata block type 127")
        length = int.from_bytes(data[pos + 1 : pos + 4], "big")
        body_start = pos + 4
        if body_start + length > len(data):
            raise FlacError(
                f"truncated {_BLOCK_NAMES.get(btype, btype)} block: "
                f"{len(data) - body_start} bytes < {length}"
            )
        blocks.append(_BLOCK_NAMES.get(btype, f"RESERVED_{btype}"))
        if btype == 0:  # STREAMINFO
            if streaminfo is not None:
                raise FlacError("duplicate STREAMINFO block")
            if length < 34:
                raise FlacError(f"STREAMINFO too short ({length} < 34)")
            b = data[body_start : body_start + 34]
            min_bs, max_bs = struct.unpack_from(">HH", b, 0)
            min_fs = int.from_bytes(b[4:7], "big")
            max_fs = int.from_bytes(b[7:10], "big")
            packed = int.from_bytes(b[10:18], "big")
            rate = packed >> 44
            channels = ((packed >> 41) & 0x7) + 1
            bits = ((packed >> 36) & 0x1F) + 1
            total = packed & ((1 << 36) - 1)
            if rate == 0:
                raise FlacError("STREAMINFO sample rate 0")
            streaminfo = {
                "min_blocksize": min_bs,
                "max_blocksize": max_bs,
                "min_framesize": min_fs,
                "max_framesize": max_fs,
                "sample_rate": rate,
                "channels": channels,
                "bits_per_sample": bits,
                "total_samples": total,
                "md5": b[18:34].hex(),
            }
        elif btype == 4:  # VORBIS_COMMENT: vendor + count (little-endian)
            if length >= 4:
                (vlen,) = struct.unpack_from("<I", data, body_start)
                if body_start + 4 + vlen + 4 <= body_start + length:
                    (n_comments,) = struct.unpack_from(
                        "<I", data, body_start + 4 + vlen
                    )
        pos = body_start + length
    if streaminfo is None:
        raise FlacError("no STREAMINFO block (must be first)")
    if blocks[0] != "STREAMINFO":
        raise FlacError("STREAMINFO is not the first metadata block")
    out = dict(streaminfo)
    out["duration_ms"] = (
        streaminfo["total_samples"] * 1000 // streaminfo["sample_rate"]
    )
    out["blocks"] = blocks
    out["n_comments"] = n_comments
    out["frames_offset"] = pos
    return out


def decode_samples(data: bytes):
    """Honest refusal: FLAC audio frames are LPC prediction + Rice-coded
    residuals — not implemented here.  ``probe`` serves manifests; exact
    dedup still applies to the bytes."""
    m = probe(data)  # broken payloads say "broken", not "refused"
    raise NotImplementedError(
        f"cannot decode FLAC subframes to PCM here (LPC + Rice coding); "
        f"probe() serves manifests ({m['channels']}ch "
        f"{m['sample_rate']}Hz {m['bits_per_sample']}-bit)"
    )


# --------------------------------------------------------------- fixtures
def _block(btype: int, body: bytes, last: bool = False) -> bytes:
    return bytes([btype | (0x80 if last else 0)]) + len(body).to_bytes(
        3, "big"
    ) + body


def encode_stub(
    sample_rate: int = 44100,
    channels: int = 2,
    bits: int = 16,
    total_samples: int = 44100,
    vorbis_comments: list[str] | None = None,
    padding: int = 0,
    seektable_points: int = 0,
    frame_bytes: bytes = b"\xff\xf8" + b"\x00" * 14,
) -> bytes:
    """Structurally valid FLAC metadata chain + opaque frame section.
    The probe never interprets frames, so fixtures carry a fixed stub
    frame region (uniqueness for exact-dedup tests comes from the
    STREAMINFO fields and comments)."""
    if not 1 <= channels <= 8:
        raise FlacError("channels must be 1..8")
    if not 4 <= bits <= 32:
        raise FlacError("bits must be 4..32")
    packed = (sample_rate << 44) | ((channels - 1) << 41) | ((bits - 1) << 36)
    packed |= total_samples & ((1 << 36) - 1)
    si = (struct.pack(">HH", 4096, 4096)
          + (0).to_bytes(3, "big") + (0).to_bytes(3, "big")
          + packed.to_bytes(8, "big") + bytes(16))
    blocks = []
    if seektable_points:
        blocks.append(_block(3, b"\x00" * (18 * seektable_points)))
    if vorbis_comments is not None:
        vendor = b"probe-stub"
        body = struct.pack("<I", len(vendor)) + vendor
        body += struct.pack("<I", len(vorbis_comments))
        for c in vorbis_comments:
            enc = c.encode()
            body += struct.pack("<I", len(enc)) + enc
        blocks.append(_block(4, body))
    if padding:
        blocks.append(_block(1, b"\x00" * padding))
    out = b"fLaC" + _block(0, si, last=not blocks)
    for i, blk in enumerate(blocks):
        if i == len(blocks) - 1:
            blk = bytes([blk[0] | 0x80]) + blk[1:]
        out += blk
    return out + frame_bytes
