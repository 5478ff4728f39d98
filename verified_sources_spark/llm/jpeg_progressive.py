"""Progressive JPEG (ITU-T T.81 SOF2) — pure-stdlib decode + encode.

A large share of web JPEGs are progressive: the image arrives as a
SERIES of scans, each carrying a spectral band (Ss..Se) at a
successive-approximation precision (Ah, Al), and the coefficients
accumulate across scans before one final IDCT.  This module implements
both directions:

- ``decode_progressive``: full multi-scan decode — interleaved DC-first
  and DC-refinement scans, non-interleaved AC-first scans with EOB-run
  coding, AC-refinement scans with correction bits, per-scan DHT
  redefinition, restart intervals.  ``jpeg_codec.decode`` delegates
  here when the frame is SOF2, so every image operator (dHash,
  cross-format dedup, mixed-corpus probes) gains progressive decode
  with no caller changes.
- ``encode_progressive``: a real progressive encoder (scan scripting,
  per-scan OPTIMIZED Huffman tables built with the T.81 K.2 algorithm,
  EOB-run accumulation, correction-bit buffering) used as the fixture
  generator.  Because encode and decode are independent
  implementations of the two halves of Annex G, the roundtrip test
  against the BASELINE decoder's output of the SAME quantized
  coefficients is a strong cross-check: both paths must land on
  byte-identical pixels.

Arithmetic-coded, hierarchical, lossless and 12-bit variants still
refuse by name in jpeg_codec (tests/test_codec_refusals.py).

Reference analogue: the filetype-sniffing ingestion in
sources/filesystem/helpers.py routes JPEGs by extension only — this
engine decodes them; progressive was the largest undecodable share.
"""

from __future__ import annotations

import struct

from verified_sources_spark.llm.jpeg_codec import (
    JpegError,
    _BitReader,
    _BitWriter,
    _dct_matrix,
    _encode_codes,
    _extend,
    _huff,
    _magnitude,
    _Q_CHROMA,
    _Q_LUMA,
    _quality_scale,
    _ZIGZAG,
)

__all__ = ["decode_progressive", "encode_progressive"]


# ------------------------------------------------------------------ decode

def _parse_dht(seg: bytes, htables: dict) -> None:
    p = 0
    while p < len(seg):
        cls, tid = seg[p] >> 4, seg[p] & 0xF
        bits = list(seg[p + 1 : p + 17])
        n = sum(bits)
        htables[(cls, tid)] = _huff(bits, list(seg[p + 17 : p + 17 + n]))
        p += 17 + n


def _parse_dqt(seg: bytes, qtables: dict) -> None:
    import numpy as np

    p = 0
    while p < len(seg):
        prec, tid = seg[p] >> 4, seg[p] & 0xF
        p += 1
        if prec == 0:
            q = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(np.int32)
            p += 64
        else:
            q = np.frombuffer(seg[p : p + 128], dtype=">u2").astype(np.int32)
            p += 128
        tbl = np.zeros(64, dtype=np.int32)
        tbl[_ZIGZAG] = q
        qtables[tid] = tbl.reshape(8, 8)


def decode_progressive(data: bytes) -> dict:
    """Multi-scan progressive decode → the same ``{width, height, ...,
    pixels, mode}`` contract as jpeg_codec.decode.  Coefficients
    accumulate in per-component (blocks_y, blocks_x, 64) grids across
    scans; the single batched IDCT runs once at EOI."""
    import numpy as np

    if data[:2] != b"\xff\xd8":
        raise JpegError("not a JPEG payload (missing SOI)")
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], object] = {}
    frame = None
    restart_interval = 0
    coefs: list[np.ndarray] = []
    geom: list[dict] = []
    hmax = vmax = mcux = mcuy = 0

    pos = 2
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise JpegError(f"marker sync lost at offset {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if pos + 4 > len(data):
            raise JpegError("truncated marker segment")
        (ln,) = struct.unpack_from(">H", data, pos + 2)
        if ln < 2 or pos + 2 + ln > len(data):
            raise JpegError(f"truncated segment 0xFF{marker:02X}")
        seg = data[pos + 4 : pos + 2 + ln]
        pos += 2 + ln
        if marker == 0xDB:
            _parse_dqt(seg, qtables)
        elif marker == 0xC4:
            _parse_dht(seg, htables)
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xC2:  # SOF2
            bits, h, w, ncomp = struct.unpack_from(">BHHB", seg, 0)
            if bits != 8:
                raise JpegError(f"cannot decode {bits}-bit JPEG")
            comps = []
            for c in range(ncomp):
                cid = seg[6 + 3 * c]
                hv = seg[7 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "q": seg[8 + 3 * c]}
                )
            frame = {"w": w, "h": h, "comps": comps}
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            for c in comps:
                bw, bh = mcux * c["h"], mcuy * c["v"]
                # non-interleaved scans cover only the true block grid
                cw = (w * c["h"] + 8 * hmax - 1) // (8 * hmax)
                ch = (h * c["v"] + 8 * vmax - 1) // (8 * vmax)
                coefs.append(np.zeros((bh, bw, 64), dtype=np.int32))
                geom.append({"bw": bw, "bh": bh, "nw": cw, "nh": ch})
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegError("not a progressive (SOF2) frame")
        elif marker == 0xDA:  # SOS: decode one scan, resume at next marker
            if frame is None:
                raise JpegError("SOS before SOF2")
            pos = _decode_scan(
                data, pos, seg, frame, coefs, geom, htables,
                restart_interval, mcux, mcuy,
            )
        # APPn / COM: skipped
    if frame is None:
        raise JpegError("no SOF2 frame header found")

    # dequantize + batched IDCT + upsample + color convert
    C = _dct_matrix()
    full = []
    w, h = frame["w"], frame["h"]
    for ci, c in enumerate(frame["comps"]):
        q = qtables.get(c["q"])
        if q is None:
            raise JpegError("scan references undefined DQT table")
        g = geom[ci]
        zz = coefs[ci].reshape(-1, 64).astype(np.float64)
        nat = np.zeros_like(zz)
        nat[:, _ZIGZAG] = zz
        blocks = nat.reshape(-1, 8, 8) * q
        pix = np.matmul(np.matmul(C.T, blocks), C) + 128.0
        plane = (
            pix.reshape(g["bh"], g["bw"], 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(g["bh"] * 8, g["bw"] * 8)
        )
        if c["h"] != hmax or c["v"] != vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
            )
        full.append(plane[:h, :w])
    if len(full) == 3:
        y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
        r = y + 1.402 * cr
        g2 = y - 0.344136 * cb - 0.714136 * cr
        b = y + 1.772 * cb
        rgb = np.stack([r, g2, b], axis=2)
    elif len(full) == 1:
        rgb = np.stack([full[0]] * 3, axis=2)
    else:
        raise JpegError(f"unsupported component count {len(full)}")
    from verified_sources_spark.llm.jpeg_codec import probe

    meta = dict(probe(data))
    meta["pixels"] = np.clip(np.round(rgb), 0, 255).astype(np.uint8).tobytes()
    meta["mode"] = "RGB"
    return meta


def _decode_scan(
    data, sos_end, seg, frame, coefs, geom, htables, restart_interval,
    mcux, mcuy,
):
    """Decode one scan's entropy data; returns the offset of the next
    marker after it."""
    ns = seg[0]
    scomps = []
    for c in range(ns):
        cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
        ci = next(
            (i for i, fc in enumerate(frame["comps"]) if fc["id"] == cid), None
        )
        if ci is None:
            raise JpegError(f"scan references unknown component {cid}")
        scomps.append((ci, tt >> 4, tt & 0xF))
    ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
    ahal = seg[3 + 2 * ns]
    ah, al = ahal >> 4, ahal & 0xF
    if ss > se or se > 63:
        raise JpegError(f"bad spectral band {ss}..{se}")
    if ss == 0 and se != 0:
        raise JpegError("progressive scan mixes DC and AC bands")
    if ss > 0 and ns != 1:
        raise JpegError("progressive AC scan must be non-interleaved")

    reader = _BitReader(data, sos_end)
    state = {"eobrun": 0}
    p1 = 1 << al

    def refine_nonzero(block, k):
        if reader.read_bit() and not (block[k] & p1):
            block[k] += p1 if block[k] > 0 else -p1

    def block_ac_first(block, ac_tbl):
        if state["eobrun"]:
            state["eobrun"] -= 1
            return
        k = ss
        while k <= se:
            rs = reader.decode_symbol(ac_tbl)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r < 15:
                    state["eobrun"] = (1 << r) - 1
                    if r:
                        state["eobrun"] += reader.read_bits(r)
                    break
                k += 16  # ZRL
            else:
                k += r
                if k > se:
                    raise JpegError("AC run past band end")
                block[k] = _extend(reader.read_bits(s), s) << al
                k += 1

    def block_ac_refine(block, ac_tbl):
        if state["eobrun"]:
            state["eobrun"] -= 1
            for k in range(ss, se + 1):
                if block[k]:
                    refine_nonzero(block, k)
            return
        k = ss
        while k <= se:
            rs = reader.decode_symbol(ac_tbl)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r < 15:
                    state["eobrun"] = (1 << r) - 1
                    if r:
                        state["eobrun"] += reader.read_bits(r)
                    while k <= se:
                        if block[k]:
                            refine_nonzero(block, k)
                        k += 1
                    return
                newval = 0  # ZRL: 16 zero-history positions
            elif s == 1:
                newval = p1 if reader.read_bit() else -p1
            else:
                raise JpegError("AC refinement magnitude must be 1")
            while k <= se:
                if block[k] != 0:
                    refine_nonzero(block, k)
                else:
                    if r == 0:
                        if newval:
                            block[k] = newval
                        k += 1
                        break
                    r -= 1
                k += 1

    def check_restart(unit):
        if restart_interval and unit and unit % restart_interval == 0:
            m = reader.align_to_marker()
            if m is None or not 0xD0 <= m <= 0xD7:
                raise JpegError("expected restart marker")
            state["eobrun"] = 0
            for i in range(len(preds)):
                preds[i] = 0

    preds = [0] * len(frame["comps"])
    if ss == 0 and len(scomps) > 1:
        # interleaved DC scan over the scan comps, padded MCU order
        dc_tbls = {}
        for ci, dc_t, _ac_t in scomps:
            if ah == 0:
                t = htables.get((0, dc_t))
                if t is None:
                    raise JpegError("scan references undefined DC table")
                dc_tbls[ci] = t
        unit = 0
        for my in range(mcuy):
            for mx in range(mcux):
                check_restart(unit)
                for ci, _dc_t, _ac_t in scomps:
                    c = frame["comps"][ci]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            blk = coefs[ci][my * c["v"] + by, mx * c["h"] + bx]
                            if ah == 0:
                                t = reader.decode_symbol(dc_tbls[ci])
                                diff = _extend(reader.read_bits(t), t)
                                preds[ci] += diff
                                blk[0] = preds[ci] << al
                            else:
                                if reader.read_bit():
                                    blk[0] |= p1
                unit += 1
    elif ss == 0:
        # T.81 permits a non-interleaved (Ns=1) DC scan: it covers the
        # component's OWN block grid (nw*nh) row-major, which differs
        # from the padded MCU grid for a subsampled component — MCU
        # iteration here would mis-decode real per-component DC scans.
        ci, dc_t, _ac_t = scomps[0]
        tbl = None
        if ah == 0:
            tbl = htables.get((0, dc_t))
            if tbl is None:
                raise JpegError("scan references undefined DC table")
        g = geom[ci]
        unit = 0
        for by in range(g["nh"]):
            for bx in range(g["nw"]):
                check_restart(unit)
                blk = coefs[ci][by, bx]
                if ah == 0:
                    t = reader.decode_symbol(tbl)
                    diff = _extend(reader.read_bits(t), t)
                    preds[ci] += diff
                    blk[0] = preds[ci] << al
                else:
                    if reader.read_bit():
                        blk[0] |= p1
                unit += 1
    else:  # AC scan: single component, its own block grid
        ci, _dc_t, ac_t = scomps[0]
        ac_tbl = htables.get((1, ac_t))
        if ac_tbl is None:
            raise JpegError("scan references undefined AC table")
        g = geom[ci]
        # hot path (profiled): per-coefficient numpy scalar indexing is
        # ~10x a list access and dominated decode time — pull the block
        # grid into plain Python lists for the entropy walk, write back
        # once at scan end
        grid = coefs[ci][: g["nh"], : g["nw"]].tolist()
        fn = block_ac_first if ah == 0 else block_ac_refine
        unit = 0
        for row in grid:
            for block in row:
                check_restart(unit)
                fn(block, ac_tbl)
                unit += 1
        coefs[ci][: g["nh"], : g["nw"]] = grid

    # resume the marker walk after this scan's entropy data
    if reader.marker is None:
        reader.align_to_marker()
    if reader.marker is None:
        raise JpegError("entropy stream ran past end of file")
    return reader.pos


# ------------------------------------------------------------------ encode

class _FreqSink:
    """Pass-1 sink: count Huffman symbol frequencies, ignore raw bits."""

    def __init__(self):
        self.freq = [0] * 257
        self.freq[256] = 1  # reserved: keeps the all-ones code unused

    def symbol(self, sym):
        self.freq[sym] += 1

    def bits(self, _v, _n):
        pass


class _CodeSink:
    """Pass-2 sink: emit Huffman codes + raw bits through a _BitWriter."""

    def __init__(self, codes, writer):
        self.codes = codes
        self.w = writer

    def symbol(self, sym):
        code, ln = self.codes[sym]
        self.w.write(code, ln)

    def bits(self, v, n):
        if n:
            self.w.write(v, n)


def _optimal_table(freq):
    """T.81 Annex K.2 optimal Huffman sizing (the libjpeg
    jpeg_gen_optimal_table algorithm, reimplemented): merge the two
    least-frequent symbols repeatedly, tracking chain depths, then fold
    code lengths above 16 back down.  Returns (bits[16], values)."""
    freq = list(freq)
    codesize = [0] * 257
    others = [-1] * 257
    while True:
        v1 = v2 = -1
        m1 = m2 = None
        for i in range(257):
            f = freq[i]
            if f <= 0:
                continue
            if m1 is None or f < m1 or (f == m1 and i > v1):
                v2, m2 = v1, m1
                v1, m1 = i, f
            elif m2 is None or f < m2 or (f == m2 and i > v2):
                v2, m2 = i, f
        if v2 < 0:
            break
        freq[v1] += freq[v2]
        freq[v2] = 0
        codesize[v1] += 1
        while others[v1] >= 0:
            v1 = others[v1]
            codesize[v1] += 1
        others[v1] = v2
        codesize[v2] += 1
        while others[v2] >= 0:
            v2 = others[v2]
            codesize[v2] += 1
    bits = [0] * 33
    for i in range(257):
        if codesize[i]:
            bits[codesize[i]] += 1
    for ln in range(32, 16, -1):  # length-limit to 16 (K.2 fold-down)
        while bits[ln] > 0:
            j = ln - 2
            while bits[j] == 0:
                j -= 1
            bits[ln] -= 2
            bits[ln - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
    ln = 16
    while ln > 0 and bits[ln] == 0:
        ln -= 1
    if ln > 0:
        bits[ln] -= 1  # drop the reserved symbol's slot
    values = []
    for size in range(1, 17):
        for sym in range(256):
            if codesize[sym] == size:
                values.append(sym)
    return bits[1:17], values


DEFAULT_SCRIPT = [
    # (component indices, Ss, Se, Ah, Al) — the classic libjpeg shape:
    # coarse DC, split luma AC bands, then refinement passes
    ((0, 1, 2), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((2,), 1, 63, 0, 1),
    ((1,), 1, 63, 0, 1),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0, 1, 2), 0, 0, 1, 0),
    ((2,), 1, 63, 1, 0),
    ((1,), 1, 63, 1, 0),
    ((0,), 1, 63, 1, 0),
]
GRAY_SCRIPT = [
    ((0,), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0,), 0, 0, 1, 0),
    ((0,), 1, 63, 1, 0),
]


def encode_progressive(
    width: int,
    height: int,
    pixels: bytes,
    quality: int = 90,
    subsampling: str = "4:4:4",
    grayscale: bool = False,
    scan_script=None,
) -> bytes:
    """Progressive JPEG from top-down RGB bytes: the SAME color
    transform / padding / forward-DCT / quantization as the baseline
    encoder (identical coefficients by construction — the roundtrip
    test leans on this), emitted as an Annex-G scan series with
    per-scan optimized Huffman tables, EOB-run coding, and
    successive-approximation correction bits."""
    import numpy as np

    if len(pixels) != width * height * 3:
        raise JpegError("pixel buffer does not match width*height*3")
    if subsampling not in ("4:4:4", "4:2:2", "4:2:0"):
        raise JpegError(f"unsupported subsampling {subsampling!r}")
    rgb = (
        np.frombuffer(pixels, dtype=np.uint8)
        .reshape(height, width, 3)
        .astype(np.float64)
    )
    r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    qy = _quality_scale(_Q_LUMA, quality)
    qc = _quality_scale(_Q_CHROMA, quality)
    qy_tbl = np.zeros(64, dtype=np.int32)
    qy_tbl[_ZIGZAG] = qy
    qc_tbl = np.zeros(64, dtype=np.int32)
    qc_tbl[_ZIGZAG] = qc
    qy2d, qc2d = qy_tbl.reshape(8, 8), qc_tbl.reshape(8, 8)

    if grayscale:
        hv_y = (1, 1)
    elif subsampling == "4:2:0":
        hv_y = (2, 2)
    elif subsampling == "4:2:2":
        hv_y = (2, 1)
    else:
        hv_y = (1, 1)
    hmax, vmax = hv_y
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)

    def pad_to(plane, pw, ph):
        h0, w0 = plane.shape
        out = np.empty((ph, pw), dtype=np.float64)
        out[:h0, :w0] = plane
        out[h0:, :w0] = plane[-1:, :]
        out[:, w0:] = out[:, w0 - 1 : w0]
        return out

    if hv_y != (1, 1):
        sh, sv = hv_y
        pw, ph = mcux * 8 * sh, mcuy * 8 * sv
        ye = pad_to(y, pw, ph)
        down = lambda p: p.reshape(
            p.shape[0] // sv, sv, p.shape[1] // sh, sh
        ).mean(axis=(1, 3))
        planes = [
            (ye, qy2d, sh, sv),
            (down(pad_to(cb, pw, ph)), qc2d, 1, 1),
            (down(pad_to(cr, pw, ph)), qc2d, 1, 1),
        ]
    elif grayscale:
        planes = [(pad_to(y, mcux * 8, mcuy * 8), qy2d, 1, 1)]
    else:
        planes = [
            (pad_to(y, mcux * 8, mcuy * 8), qy2d, 1, 1),
            (pad_to(cb, mcux * 8, mcuy * 8), qc2d, 1, 1),
            (pad_to(cr, mcux * 8, mcuy * 8), qc2d, 1, 1),
        ]

    # quantized zigzag coefficient grids, one per component
    C = _dct_matrix()
    coefs = []
    geom = []
    for plane, q, ch, cv in planes:
        bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
        blocks = (
            plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3) - 128.0
        )
        co = np.matmul(np.matmul(C, blocks), C.T)
        quant = np.round(co / q).astype(np.int32).reshape(bh, bw, 64)
        coefs.append(quant[:, :, _ZIGZAG])
        # non-interleaved scans cover only the true component block grid
        nw = (width * ch + 8 * hmax - 1) // (8 * hmax)
        nh = (height * cv + 8 * vmax - 1) // (8 * vmax)
        geom.append({"bw": bw, "bh": bh, "nw": nw, "nh": nh, "h": ch, "v": cv})

    if scan_script is None:
        scan_script = GRAY_SCRIPT if grayscale else DEFAULT_SCRIPT

    def run_scan(comp_ids, ss, se, ah, al, sink):
        if ss == 0:  # DC scan
            preds = [0] * len(coefs)

            def emit_dc(ci, by, bx):
                zz0 = int(coefs[ci][by, bx, 0])
                if ah == 0:
                    v = zz0 >> al  # arithmetic shift (T.81 DC)
                    diff = v - preds[ci]
                    preds[ci] = v
                    t, mag = _magnitude(diff)
                    sink.symbol(t)
                    sink.bits(mag, t)
                else:
                    sink.bits((zz0 >> al) & 1, 1)

            if len(comp_ids) == 1:
                # non-interleaved DC scan: the component's own grid
                (ci,) = comp_ids
                g = geom[ci]
                for by in range(g["nh"]):
                    for bx in range(g["nw"]):
                        emit_dc(ci, by, bx)
                return
            for my in range(mcuy):
                for mx in range(mcux):
                    for ci in comp_ids:
                        g = geom[ci]
                        for by in range(g["v"]):
                            for bx in range(g["h"]):
                                emit_dc(ci, my * g["v"] + by,
                                        mx * g["h"] + bx)
            return
        # AC scan: one component, non-interleaved
        (ci,) = comp_ids
        g = geom[ci]
        state = {"eobrun": 0, "pend": []}

        def emit_eobrun():
            if state["eobrun"] > 0:
                nbits = state["eobrun"].bit_length() - 1
                sink.symbol(nbits << 4)
                if nbits:
                    sink.bits(state["eobrun"] & ((1 << nbits) - 1), nbits)
                for bit in state["pend"]:
                    sink.bits(bit, 1)
                state["pend"] = []
            state["eobrun"] = 0

        for by in range(g["nh"]):
            for bx in range(g["nw"]):
                blk = coefs[ci][by, bx]
                if ah == 0:  # AC first: point transform toward zero
                    band = []
                    for k in range(ss, se + 1):
                        v = int(blk[k])
                        band.append(v >> al if v >= 0 else -((-v) >> al))
                    last = max(
                        (i for i, v in enumerate(band) if v), default=-1
                    )
                    if last < 0:
                        state["eobrun"] += 1
                        if state["eobrun"] == 0x7FFF:
                            emit_eobrun()
                        continue
                    emit_eobrun()
                    run = 0
                    for i in range(last + 1):
                        v = band[i]
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            sink.symbol(0xF0)
                            run -= 16
                        t, mag = _magnitude(v)
                        sink.symbol((run << 4) | t)
                        sink.bits(mag, t)
                        run = 0
                    if last < se - ss:
                        state["eobrun"] += 1
                        if state["eobrun"] == 0x7FFF:
                            emit_eobrun()
                else:  # AC refinement (libjpeg encode_mcu_AC_refine shape)
                    absvals = []
                    for k in range(ss, se + 1):
                        v = int(blk[k])
                        absvals.append((v if v >= 0 else -v) >> al)
                    eob = max(
                        (i for i, v in enumerate(absvals) if v == 1),
                        default=-1,
                    )
                    run = 0
                    br = []
                    for i in range(se - ss + 1):
                        v = absvals[i]
                        if v == 0:
                            run += 1
                            continue
                        # ZRLs that can't fold into the EOB must flush
                        # HERE (at any nonzero), so the decoder's 16-zero
                        # walk consumes exactly the buffered corrections
                        while run > 15 and i <= eob:
                            emit_eobrun()
                            sink.symbol(0xF0)
                            run -= 16
                            for bit in br:
                                sink.bits(bit, 1)
                            br = []
                        if v > 1:  # history coefficient: correction bit
                            br.append(v & 1)
                            continue
                        # newly significant (abs>>al == 1)
                        emit_eobrun()
                        sink.symbol((run << 4) | 1)
                        sink.bits(1 if int(blk[ss + i]) > 0 else 0, 1)
                        for bit in br:
                            sink.bits(bit, 1)
                        br = []
                        run = 0
                    if run > 0 or br:
                        state["eobrun"] += 1
                        state["pend"].extend(br)
                        if state["eobrun"] == 0x7FFF or len(state["pend"]) > 900:
                            emit_eobrun()
        emit_eobrun()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    parts = [b"\xff\xd8"]
    zzy = qy2d.ravel()[_ZIGZAG].astype(np.uint8).tobytes()
    parts.append(seg(0xDB, bytes([0]) + zzy))
    if not grayscale:
        zzc = qc2d.ravel()[_ZIGZAG].astype(np.uint8).tobytes()
        parts.append(seg(0xDB, bytes([1]) + zzc))
    ncomp = 1 if grayscale else 3
    sof = struct.pack(">BHHB", 8, height, width, ncomp)
    for ci in range(ncomp):
        g = geom[ci]
        sof += bytes([ci + 1, (g["h"] << 4) | g["v"], 0 if ci == 0 else 1])
    parts.append(seg(0xC2, sof))

    for comp_ids, ss, se, ah, al in scan_script:
        comp_ids = tuple(c for c in comp_ids if c < ncomp)
        if not comp_ids:
            continue
        is_dc_refine = ss == 0 and ah > 0
        codes = None
        if not is_dc_refine:  # DC-refine scans carry raw bits only
            fs = _FreqSink()
            run_scan(comp_ids, ss, se, ah, al, fs)
            bits, values = _optimal_table(fs.freq)
            cls = 0 if ss == 0 else 1
            parts.append(
                seg(0xC4, bytes([(cls << 4) | 0]) + bytes(bits) + bytes(values))
            )
            codes = _encode_codes(bits, values)
        sos = bytes([len(comp_ids)])
        for ci in comp_ids:
            sos += bytes([ci + 1, 0x00])  # table 0 for both classes
        sos += bytes([ss, se, (ah << 4) | al])
        parts.append(seg(0xDA, sos))
        w = _BitWriter()
        sink = _CodeSink(codes, w) if codes is not None else _RawSink(w)
        run_scan(comp_ids, ss, se, ah, al, sink)
        w.flush()
        parts.append(bytes(w.out))
    parts.append(b"\xff\xd9")
    return b"".join(parts)


class _RawSink:
    """DC-refinement scans have no Huffman symbols — raw bits only."""

    def __init__(self, writer):
        self.w = writer

    def symbol(self, sym):  # pragma: no cover - DC refine never emits
        raise JpegError("raw scan cannot emit Huffman symbols")

    def bits(self, v, n):
        if n:
            self.w.write(v, n)
