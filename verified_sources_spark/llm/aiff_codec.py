"""Pure-stdlib AIFF codec — the big-endian cousin of WAV.

Speech archives and older datasets ship AIFF; the container is an IFF
FORM walk (COMM + SSND chunks) with one quirk worth implementing
correctly: the sample rate is an 80-bit IEEE extended float.  PCM
frames decode fully (big-endian 8/16/24/32-bit, the SSND
offset/blocksize prefix honored); AIFC compression types other than
'NONE'/'sowt' refuse WITH THE NAME ('sowt' is little-endian PCM — the
Mac OS X convention — and decodes too).

``probe``/``decode`` return the same dict shapes as llm/wav_codec so
the audio surface treats the two interchangeably via llm/audio_io.
"""

from __future__ import annotations

import struct

__all__ = ["AiffError", "probe", "decode", "encode"]


class AiffError(ValueError):
    pass


def _read_extended(b: bytes) -> int:
    """80-bit IEEE 754 extended float → int sample rate."""
    if len(b) < 10:
        raise AiffError("truncated 80-bit extended float")
    (se,) = struct.unpack_from(">H", b, 0)
    (mant,) = struct.unpack_from(">Q", b, 2)
    exp = se & 0x7FFF
    if exp == 0 and mant == 0:
        return 0
    if exp == 0x7FFF:
        raise AiffError("non-finite sample rate")
    val = mant * 2.0 ** (exp - 16383 - 63)
    if se & 0x8000:
        val = -val
    return int(round(val))


def _write_extended(v: int) -> bytes:
    if v == 0:
        return bytes(10)
    exp = 16383 + 63
    mant = v
    while mant < (1 << 63):
        mant <<= 1
        exp -= 1
    while mant >= (1 << 64):
        mant >>= 1
        exp += 1
    return struct.pack(">H", exp) + struct.pack(">Q", mant)


def _chunks(data: bytes):
    if len(data) < 12 or data[:4] != b"FORM" or data[8:12] not in (
            b"AIFF", b"AIFC"):
        raise AiffError("not an AIFF payload (no FORM/AIFF)")
    (form_size,) = struct.unpack_from(">I", data, 4)
    end = min(len(data), 8 + form_size)
    pos = 12
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from(">I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise AiffError(f"truncated {cid!r} chunk")
        yield cid, body
        pos += 8 + size + (size & 1)  # chunks pad to even


def probe(data: bytes) -> dict:
    """Header-only: channels, sample_rate, n_frames, bits_per_sample,
    duration_ms, compression (AIFC type, 'NONE' for plain AIFF)."""
    comm = None
    is_aifc = data[8:12] == b"AIFC"
    for cid, body in _chunks(data):
        if cid == b"COMM":
            if len(body) < 18:
                raise AiffError("COMM chunk too short")
            channels, n_frames, bits = struct.unpack_from(">hIh", body, 0)
            rate = _read_extended(body[8:18])
            comp = "NONE"
            if is_aifc and len(body) >= 22:
                comp = body[18:22].decode("ascii", errors="replace")
            comm = {"channels": channels, "n_frames": n_frames,
                    "bits_per_sample": bits, "sample_rate": rate,
                    "compression": comp}
    if comm is None:
        raise AiffError("missing COMM chunk")
    if comm["sample_rate"] <= 0 or comm["channels"] <= 0:
        raise AiffError("degenerate COMM chunk")
    comm["duration_ms"] = comm["n_frames"] * 1000 // comm["sample_rate"]
    return comm


def decode(data: bytes) -> dict:
    """probe fields + ``samples``: float64 array (n_frames, channels)
    in [-1, 1] — the llm/wav_codec contract.  Non-PCM AIFC compression
    types refuse with the name."""
    import numpy as np

    meta = probe(data)
    comp = meta["compression"]
    if comp not in ("NONE", "sowt"):
        raise AiffError(
            f"cannot decode AIFC compression {comp!r} (PCM NONE/sowt only)"
        )
    bits, ch = meta["bits_per_sample"], meta["channels"]
    if bits not in (8, 16, 24, 32):
        raise AiffError(f"unsupported PCM depth {bits}")
    ssnd = next((b for cid, b in _chunks(data) if cid == b"SSND"), None)
    if ssnd is None:
        raise AiffError("missing SSND chunk")
    offset, _blocksize = struct.unpack_from(">II", ssnd, 0)
    frames_raw = ssnd[8 + offset :]
    need = meta["n_frames"] * ch * (bits // 8)
    if len(frames_raw) < need:
        raise AiffError(f"truncated SSND data: {len(frames_raw)} < {need}")
    frames_raw = frames_raw[:need]
    endian = "<" if comp == "sowt" else ">"
    if bits == 24:
        raw = np.frombuffer(frames_raw, dtype=np.uint8).reshape(-1, 3)
        if endian == ">":
            x = ((raw[:, 0].astype(np.int32) << 16)
                 | (raw[:, 1].astype(np.int32) << 8) | raw[:, 2])
        else:
            x = ((raw[:, 2].astype(np.int32) << 16)
                 | (raw[:, 1].astype(np.int32) << 8) | raw[:, 0])
        x = np.where(x >= 1 << 23, x - (1 << 24), x).astype(np.float64)
        x /= 1 << 23
    else:
        dt = {8: "i1", 16: "i2", 32: "i4"}[bits]
        x = np.frombuffer(frames_raw, dtype=endian + dt).astype(np.float64)
        x /= 1 << (bits - 1)
    out = dict(meta)
    out["samples"] = x.reshape(-1, ch)
    return out


def encode(samples, sample_rate: int, bits: int = 16,
           sowt: bool = False) -> bytes:
    """Real AIFF (or AIFC/sowt) from a float array in [-1, 1]."""
    import numpy as np

    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    n, ch = x.shape
    if bits != 16:
        raise AiffError("the fixture encoder writes 16-bit PCM only")
    pcm = np.clip(np.round(x * 32767), -32768, 32767).astype(
        "<i2" if sowt else ">i2").tobytes()
    if sowt:
        comm_body = (struct.pack(">hIh", ch, n, bits)
                     + _write_extended(sample_rate) + b"sowt")
        form_type = b"AIFC"
    else:
        comm_body = (struct.pack(">hIh", ch, n, bits)
                     + _write_extended(sample_rate))
        form_type = b"AIFF"
    comm = b"COMM" + struct.pack(">I", len(comm_body)) + comm_body
    if len(comm_body) & 1:
        comm += b"\x00"
    ssnd_body = struct.pack(">II", 0, 0) + pcm
    ssnd = b"SSND" + struct.pack(">I", len(ssnd_body)) + ssnd_body
    if len(ssnd_body) & 1:
        ssnd += b"\x00"
    body = form_type + comm + ssnd
    return b"FORM" + struct.pack(">I", len(body)) + body
