"""Pure-stdlib FLAC codec: metadata probe + FULL sample decode
(RFC 9639) + an independent fixture encoder.

FLAC is the dominant lossless audio container in archival/music
corpora.  Its metadata layer is trivially stdlib-readable: a "fLaC"
magic, then a chain of (is_last | type, 24-bit length) blocks, the
first of which MUST be STREAMINFO — 34 bytes carrying everything a
100 TB curation manifest needs: sample rate, channels, bit depth,
total samples (→ exact duration), min/max block and frame sizes, and
the unencoded-audio MD5.  ``probe`` walks every block (bounds-checked;
truncation raises ``FlacError``, never a bare struct.error), also
surfacing Vorbis-comment counts and seektable/picture presence.

``decode`` walks the audio frames themselves: sync + CRC-8-checked
headers (UTF-8-style coded numbers, all block-size/sample-rate/sample-
size code forms), CONSTANT / VERBATIM / FIXED(0-4) / LPC subframes with
wasted-bits shifts, Rice / Rice2 partitioned residuals (escape
partitions included), left/right/mid-side stereo decorrelation, CRC-16
frame footers, and the STREAMINFO MD5 cross-check over the
reconstructed PCM — a wrong sample anywhere changes the MD5, so decode
is self-verifying.  Output matches llm/wav_codec.decode: probe fields
plus ``samples`` float64 (n_frames, channels) normalized to [-1, 1] —
lossless audio joins the same cross-format spectral-fingerprint dedup
path as WAV/AIFF.

``encode`` is an INDEPENDENT encoder (the two-sided fixture method the
progressive-JPEG work proved out): fixed/constant/verbatim subframe
selection, per-frame Rice parameter fitting, optional stereo
decorrelation modes and wasted-bits emission, correct CRCs and PCM
MD5 — so decoder tests don't share layout assumptions with the
decoder.  ``encode_stub`` (metadata chain + opaque frame bytes)
remains for manifest-only fixtures.
"""

from __future__ import annotations

import hashlib
import struct

__all__ = ["FlacError", "probe", "encode_stub", "decode",
           "decode_samples", "encode"]

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


# ---------------------------------------------------------------- bits/CRC

def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


class _BitReader:
    """MSB-first bit reader over the frame section."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos          # next byte index
        self.bitbuf = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise FlacError("truncated FLAC frame data")
            self.bitbuf = (self.bitbuf << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8
        self.nbits -= n
        v = (self.bitbuf >> self.nbits) & ((1 << n) - 1)
        self.bitbuf &= (1 << self.nbits) - 1
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > 1 << 24:
                raise FlacError("runaway unary code (corrupt Rice stream)")
        return q

    def align(self):
        self.nbits = 0
        self.bitbuf = 0

    def byte_aligned(self) -> bool:
        return self.nbits == 0


def _read_coded_number(br: _BitReader) -> int:
    """The UTF-8-style frame/sample number (up to 7 bytes, 36 bits)."""
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    while b0 & (0x80 >> n):
        n += 1
    if n < 2 or n > 7:
        raise FlacError(f"malformed coded number lead byte {b0:#x}")
    v = b0 & (0x7F >> n)
    for _ in range(n - 1):
        c = br.read(8)
        if c & 0xC0 != 0x80:
            raise FlacError("malformed coded number continuation byte")
        v = (v << 6) | (c & 0x3F)
    return v


_SR_CODES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
             7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000}
_SS_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _decode_residual(br: _BitReader, blocksize: int, order: int) -> list[int]:
    method = br.read(2)
    if method > 1:
        raise FlacError(f"reserved residual coding method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = br.read(4)
    nparts = 1 << po
    if blocksize % nparts or (blocksize >> po) <= order:
        raise FlacError(f"invalid partition order {po} for blocksize "
                        f"{blocksize}, predictor order {order}")
    out: list[int] = []
    for p in range(nparts):
        count = (blocksize >> po) - (order if p == 0 else 0)
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            if raw == 0:
                out.extend(0 for _ in range(count))
            else:
                out.extend(br.read_signed(raw) for _ in range(count))
        else:
            for _ in range(count):
                q = br.read_unary()
                r = br.read(param) if param else 0
                v = (q << param) | r
                out.append((v >> 1) ^ -(v & 1))  # zigzag
    return out


def _decode_subframe(br: _BitReader, blocksize: int, bps: int) -> list[int]:
    if br.read(1):
        raise FlacError("subframe header padding bit set")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
    ebps = bps - wasted
    if ebps <= 0:
        raise FlacError("wasted bits exceed sample size")
    if stype == 0:  # CONSTANT
        v = br.read_signed(ebps)
        samples = [v] * blocksize
    elif stype == 1:  # VERBATIM
        samples = [br.read_signed(ebps) for _ in range(blocksize)]
    elif 8 <= stype <= 12:  # FIXED, order 0-4
        order = stype & 7
        samples = [br.read_signed(ebps) for _ in range(order)]
        resid = _decode_residual(br, blocksize, order)
        coefs = _FIXED_COEFS[order]
        for r in resid:
            pred = sum(c * samples[-1 - j] for j, c in enumerate(coefs))
            samples.append(pred + r)
    elif stype >= 32:  # LPC, order 1-32
        order = (stype & 31) + 1
        samples = [br.read_signed(ebps) for _ in range(order)]
        prec = br.read(4)
        if prec == 15:
            raise FlacError("invalid LPC coefficient precision code 15")
        prec += 1
        shift = br.read_signed(5)
        if shift < 0:
            raise FlacError("negative LPC shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        resid = _decode_residual(br, blocksize, order)
        for r in resid:
            acc = sum(c * samples[-1 - j] for j, c in enumerate(coefs))
            samples.append((acc >> shift) + r)
    else:
        raise FlacError(f"reserved subframe type {stype}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def _decode_frame(br: _BitReader, info: dict) -> tuple[list[list[int]], int]:
    """One frame → (per-channel sample lists, blocksize).  The reader
    must sit byte-aligned on the sync code."""
    hdr_start = br.pos
    sync = br.read(14)
    if sync != 0x3FFE:
        raise FlacError(f"bad frame sync at byte {hdr_start}")
    if br.read(1):
        raise FlacError("frame header reserved bit set")
    br.read(1)  # blocking strategy (coded number disambiguates)
    bs_code = br.read(4)
    sr_code = br.read(4)
    ch_code = br.read(4)
    ss_code = br.read(3)
    if br.read(1):
        raise FlacError("frame header reserved bit set")
    _read_coded_number(br)
    if bs_code == 0:
        raise FlacError("reserved block size code 0")
    elif bs_code == 1:
        blocksize = 192
    elif bs_code <= 5:
        blocksize = 576 << (bs_code - 2)
    elif bs_code == 6:
        blocksize = br.read(8) + 1
    elif bs_code == 7:
        blocksize = br.read(16) + 1
    else:
        blocksize = 256 << (bs_code - 8)
    if sr_code == 0:
        pass  # streaminfo rate
    elif sr_code in _SR_CODES:
        pass
    elif sr_code == 12:
        br.read(8)
    elif sr_code in (13, 14):
        br.read(16)
    else:
        raise FlacError("invalid sample rate code 15")
    if ss_code == 0:
        bps = info["bits_per_sample"]
    elif ss_code in _SS_CODES:
        bps = _SS_CODES[ss_code]
    else:
        raise FlacError(f"reserved sample size code {ss_code}")
    if not br.byte_aligned():
        raise FlacError("frame header not byte aligned")  # pragma: no cover
    crc8 = _crc8(br.data[hdr_start : br.pos])
    if br.read(8) != crc8:
        raise FlacError(f"frame header CRC-8 mismatch at byte {hdr_start}")

    if ch_code <= 7:
        chans = [_decode_subframe(br, blocksize, bps)
                 for _ in range(ch_code + 1)]
    elif ch_code == 8:  # left/side
        left = _decode_subframe(br, blocksize, bps)
        side = _decode_subframe(br, blocksize, bps + 1)
        chans = [left, [l - s for l, s in zip(left, side)]]
    elif ch_code == 9:  # right/side
        side = _decode_subframe(br, blocksize, bps + 1)
        right = _decode_subframe(br, blocksize, bps)
        chans = [[r + s for r, s in zip(right, side)], right]
    elif ch_code == 10:  # mid/side
        mid = _decode_subframe(br, blocksize, bps)
        side = _decode_subframe(br, blocksize, bps + 1)
        chans = [
            [(((m << 1) | (s & 1)) + s) >> 1 for m, s in zip(mid, side)],
            [(((m << 1) | (s & 1)) - s) >> 1 for m, s in zip(mid, side)],
        ]
    else:
        raise FlacError(f"reserved channel assignment {ch_code}")
    br.align()
    crc16 = _crc16(br.data[hdr_start : br.pos])
    footer = br.read(16)
    if footer != crc16:
        raise FlacError(f"frame CRC-16 mismatch at byte {hdr_start}")
    return chans, blocksize


def decode(data: bytes) -> dict:
    """Full FLAC decode → probe fields plus ``samples``: float64 numpy
    array (n_frames, channels) normalized to [-1, 1] — the wav/aiff
    decode interface, so FLAC feeds the same spectral-fingerprint
    cross-format dedup path.  Every frame's CRC-8/CRC-16 is checked,
    and the reconstructed PCM is verified against the STREAMINFO MD5
    when present (byte-aligned depths) — a wrong sample anywhere fails
    loudly instead of fingerprinting garble."""
    import numpy as np

    info = probe(data)
    ch = info["channels"]
    total = info["total_samples"]
    br = _BitReader(data, info["frames_offset"])
    cols: list[list[int]] = [[] for _ in range(ch)]
    got = 0
    while got < total:
        chans, blocksize = _decode_frame(br, info)
        if len(chans) != ch:
            raise FlacError(
                f"frame channel count {len(chans)} != STREAMINFO {ch}")
        for c in range(ch):
            cols[c].extend(chans[c])
        got += blocksize
    arr = np.array(cols, dtype=np.int64).T  # n x ch
    arr = arr[:total]
    bits = info["bits_per_sample"]
    md5 = info["md5"]
    if md5 != "0" * 32 and bits % 8 == 0:
        width = bits // 8
        pcm = bytearray()
        for frame in arr.tolist():
            for s in frame:
                pcm += int(s).to_bytes(width, "little", signed=True)
        if hashlib.md5(bytes(pcm)).hexdigest() != md5:
            raise FlacError("decoded PCM does not match STREAMINFO MD5")
    out = dict(info)
    out["samples"] = arr.astype(np.float64) / float(1 << (bits - 1))
    return out


def decode_samples(data: bytes) -> dict:
    """Alias for ``decode`` (kept for the audio_io dispatch seam, which
    refused by name here until the frame decoder landed)."""
    return decode(data)


# ----------------------------------------------------------------- encoder

class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int):
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, v: int, n: int):
        self.write(v & ((1 << n) - 1), n)

    def write_unary(self, q: int):
        for _ in range(q):
            self.write(0, 1)
        self.write(1, 1)

    def pad_to_byte(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


def _coded_number(v: int) -> bytes:
    """UTF-8-style frame number (encoder side)."""
    if v < 0x80:
        return bytes([v])
    out = []
    nbytes = 2
    while v >= (1 << (1 + 5 * nbytes)) and nbytes < 7:
        nbytes += 1
    for _ in range(nbytes - 1):
        out.append(0x80 | (v & 0x3F))
        v >>= 6
    lead_mask = (0xFF00 >> nbytes) & 0xFF
    out.append(lead_mask | v)
    return bytes(reversed(out))


def _best_rice_param(resid: list[int], pbits: int) -> int:
    """Smallest total-bit Rice parameter for one partition (zigzag)."""
    zz = [((-r << 1) - 1) if r < 0 else (r << 1) for r in resid]
    best_p, best_cost = 0, None
    for p in range((1 << pbits) - 1):
        cost = sum((z >> p) + 1 + p for z in zz)
        if best_cost is None or cost < best_cost:
            best_p, best_cost = p, cost
        if cost > 8 * len(resid) * 8:  # hopeless and growing
            break
    return best_p


def _write_residual(w: _BitWriter, resid: list[int], escape_raw: int = 0):
    """Single-partition (order 0) residual; ``escape_raw`` > 0 forces
    the escape-to-raw path with that bit width (decoder coverage)."""
    w.write(0, 2)   # method 0: 4-bit Rice
    w.write(0, 4)   # partition order 0
    if escape_raw:
        w.write(0xF, 4)
        w.write(escape_raw, 5)
        for r in resid:
            w.write_signed(r, escape_raw)
        return
    p = _best_rice_param(resid, 4)
    w.write(p, 4)
    for r in resid:
        z = ((-r << 1) - 1) if r < 0 else (r << 1)
        w.write_unary(z >> p)
        if p:
            w.write(z & ((1 << p) - 1), p)


def _fixed_residual(samples: list[int], order: int) -> list[int]:
    coefs = _FIXED_COEFS[order]
    return [
        samples[i] - sum(c * samples[i - 1 - j] for j, c in enumerate(coefs))
        for i in range(order, len(samples))
    ]


def _write_subframe(w: _BitWriter, samples: list[int], bps: int,
                    wasted: int = 0, escape_raw: int = 0):
    """Choose CONSTANT, best FIXED(0-2) or VERBATIM; optionally declare
    ``wasted`` trailing-zero bits (samples must actually carry them)."""
    if wasted:
        if any(s & ((1 << wasted) - 1) for s in samples):
            raise FlacError("wasted bits declared but samples carry them")
        samples = [s >> wasted for s in samples]
        bps -= wasted

    def header(stype: int):
        w.write(0, 1)
        w.write(stype, 6)
        if wasted:
            w.write(1, 1)
            w.write_unary(wasted - 1)
        else:
            w.write(0, 1)

    if all(s == samples[0] for s in samples):
        header(0)
        w.write_signed(samples[0], bps)
        return
    best_order, best_cost = None, None
    for order in (0, 1, 2):
        if len(samples) <= order:
            continue
        resid = _fixed_residual(samples, order)
        if max(abs(r) for r in resid) >= 1 << 30:
            continue
        p = _best_rice_param(resid, 4)
        zz = [((-r << 1) - 1) if r < 0 else (r << 1) for r in resid]
        cost = order * bps + sum((z >> p) + 1 + p for z in zz)
        if best_cost is None or cost < best_cost:
            best_order, best_cost = order, cost
    if best_order is None or best_cost >= len(samples) * bps:
        header(1)  # VERBATIM
        for s in samples:
            w.write_signed(s, bps)
        return
    header(8 | best_order)
    for s in samples[:best_order]:
        w.write_signed(s, bps)
    _write_residual(w, _fixed_residual(samples, best_order),
                    escape_raw=escape_raw)


def encode(
    samples,
    sample_rate: int = 44100,
    bits: int = 16,
    blocksize: int = 1024,
    stereo_mode: str = "independent",
    wasted_bits: int = 0,
    escape_raw: int = 0,
) -> bytes:
    """Independent FLAC encoder for fixtures: ``samples`` is an int list
    (mono) or list of per-channel int lists, signed values in
    [-2^(bits-1), 2^(bits-1)).  Subframes pick constant/fixed/verbatim
    per channel; ``stereo_mode`` in {'independent', 'left_side',
    'right_side', 'mid_side'} exercises the decoder's decorrelation
    paths; ``wasted_bits``/``escape_raw`` force those layouts.  Writes
    real CRC-8/CRC-16 and the PCM MD5 into STREAMINFO."""
    if samples and isinstance(samples[0], (list, tuple)):
        chans = [list(c) for c in samples]
    else:
        chans = [list(samples)]
    ch = len(chans)
    n = len(chans[0])
    if any(len(c) != n for c in chans):
        raise FlacError("channel length mismatch")
    if stereo_mode != "independent" and ch != 2:
        raise FlacError("stereo_mode requires exactly 2 channels")
    lim = 1 << (bits - 1)
    if any(not (-lim <= s < lim) for c in chans for s in c):
        raise FlacError(f"sample out of range for {bits}-bit")

    width = bits // 8
    pcm = bytearray()
    for i in range(n):
        for c in range(ch):
            pcm += int(chans[c][i]).to_bytes(width, "little", signed=True)
    md5 = hashlib.md5(bytes(pcm)).digest()

    packed = (sample_rate << 44) | ((ch - 1) << 41) | ((bits - 1) << 36)
    packed |= n & ((1 << 36) - 1)
    si = (struct.pack(">HH", blocksize, blocksize)
          + (0).to_bytes(3, "big") + (0).to_bytes(3, "big")
          + packed.to_bytes(8, "big") + md5)
    out = bytearray(b"fLaC" + _block(0, si, last=True))

    ch_code = {"independent": ch - 1, "left_side": 8,
               "right_side": 9, "mid_side": 10}[stereo_mode]
    frame_no = 0
    for start in range(0, n, blocksize):
        blk = [c[start : start + blocksize] for c in chans]
        bs = len(blk[0])
        w = _BitWriter()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)   # fixed blocksize strategy
        w.write(7, 4)   # block size: 16-bit at end of header
        sr_code = {88200: 1, 176400: 2, 192000: 3, 8000: 4, 16000: 5,
                   22050: 6, 24000: 7, 32000: 8, 44100: 9, 48000: 10,
                   96000: 11}.get(sample_rate, 0)
        w.write(sr_code, 4)
        w.write(ch_code, 4)
        ss_code = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}.get(bits, 0)
        w.write(ss_code, 3)
        w.write(0, 1)
        for b in _coded_number(frame_no):
            w.write(b, 8)
        w.write(bs - 1, 16)
        w.pad_to_byte()
        hdr = w.bytes()
        w = _BitWriter()
        for b in hdr:
            w.write(b, 8)
        w.write(_crc8(hdr), 8)

        if stereo_mode == "independent":
            subs = [(blk[c], bits) for c in range(ch)]
        elif stereo_mode == "left_side":
            side = [l - r for l, r in zip(blk[0], blk[1])]
            subs = [(blk[0], bits), (side, bits + 1)]
        elif stereo_mode == "right_side":
            side = [l - r for l, r in zip(blk[0], blk[1])]
            subs = [(side, bits + 1), (blk[1], bits)]
        else:  # mid_side
            mid = [(l + r) >> 1 for l, r in zip(blk[0], blk[1])]
            side = [l - r for l, r in zip(blk[0], blk[1])]
            subs = [(mid, bits), (side, bits + 1)]
        for s, b in subs:
            _write_subframe(w, s, b, wasted=wasted_bits,
                            escape_raw=escape_raw)
        w.pad_to_byte()
        body = w.bytes()
        out += body + _crc16(body).to_bytes(2, "big")
        frame_no += 1
    return bytes(out)


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
