"""Pure-stdlib WebP-lossless (VP8L) codec — pixel decode + fixture encode.

VP8L is the lossless half of WebP: LSB-first bitstream, canonical
Huffman codes (declared via the code-length-code machinery), LZ77
backward references with a 2D neighbor-distance map, an optional color
cache, and four invertible transforms (predictor, cross-color,
subtract-green, color-indexing/palette with pixel bundling).  Unlike
VP8 *lossy* (arithmetic boolean coder + DCT — still refused by name),
every piece of VP8L is plain prefix coding and integer math, so the
whole format is stdlib-decodable.

``decode`` implements the full bitstream: all four transforms, meta-
Huffman entropy images, color cache, LZ77 with both neighbor and plain
distance codes, simple and normal Huffman declarations.  ``encode``
emits real VP8L (normal length-limited canonical Huffman built from
symbol stats, optional fixed-mode predictor / subtract-green /
palette-with-bundling / color cache / distance-1 LZ77 runs) so the
decoder is exercised by streams this module did not hand it back
byte-for-byte — and `image_io.decode_image` dispatches WebP-VP8L
automatically, so a VP8L re-encode of a photo joins its PNG twin's
dHash group (the cross-format dedup contract).

Spec: "WebP Lossless Bitstream Specification" (public).  The
120-entry neighbor-distance map is generated from its ordering rule
(distance², row-major tie-breaks) and pinned by test vectors.
"""

from __future__ import annotations

import struct

__all__ = ["Vp8lError", "decode", "encode"]


class Vp8lError(ValueError):
    pass


# code-length symbols arrive in this fixed order (spec section 6.2.2)
_CLC_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]


def _distance_map():
    """The spec's 120 nearest (dx, dy) neighbor offsets, ordered by
    squared distance, then lower row first, then positive dx before
    negative, then |dx|."""
    cands = []
    for dy in range(0, 9):
        for dx in range(-8, 9):
            if dy == 0 and dx <= 0:
                continue
            cands.append((dx, dy))
    cands.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1],
                              abs(p[0]) * 2 + (1 if p[0] < 0 else 0)))
    return cands[:120]


_DIST_MAP = _distance_map()


# ------------------------------------------------------------------ bit IO

class _Bits:
    """LSB-first bit reader (VP8L convention)."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            if self.pos >= len(self.data):
                raise Vp8lError("VP8L bitstream truncated")
            v |= ((self.data[self.pos] >> self.bit) & 1) << i
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return v


class _BitsW:
    """LSB-first bit writer."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, n: int):
        self.acc |= (v & ((1 << n) - 1)) << self.n
        self.n += n
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def flush(self) -> bytes:
        if self.n:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.n = 0
        return bytes(self.out)


# --------------------------------------------------------- canonical huffman

class _Canon:
    """Canonical prefix code from per-symbol lengths; MSB-first bitwise
    decode (codes are at most 15 bits — fixtures and probes are small,
    clarity beats a lookup table here).  A single-symbol code has
    length 0: decoding consumes no bits."""

    def __init__(self, lengths: list[int]):
        self.single = None
        nz = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
        if not nz:
            raise Vp8lError("prefix code with no symbols")
        if len(nz) == 1:
            self.single = nz[0][1]
            return
        nz.sort()
        # first code of each length + symbol list in canonical order
        self.count = {}
        for ln, _s in nz:
            self.count[ln] = self.count.get(ln, 0) + 1
        self.symbols = [s for _ln, s in nz]
        self.first_code = {}
        self.first_index = {}
        code = 0
        idx = 0
        prev_len = 0
        for ln in sorted(self.count):
            code <<= ln - prev_len
            self.first_code[ln] = code
            self.first_index[ln] = idx
            code += self.count[ln]
            idx += self.count[ln]
            prev_len = ln
        # over-subscribed / incomplete codes are malformed
        if code != (1 << max(self.count)):
            raise Vp8lError("invalid prefix code (Kraft violation)")

    def read(self, br: _Bits) -> int:
        if self.single is not None:
            return self.single
        code = 0
        ln = 0
        for _ in range(16):
            code = (code << 1) | br.read(1)
            ln += 1
            fc = self.first_code.get(ln)
            if fc is not None and fc <= code < fc + self.count[ln]:
                return self.symbols[self.first_index[ln] + code - fc]
        raise Vp8lError("prefix code read ran past 15 bits")

    @staticmethod
    def codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
        """symbol -> (code, length) for the encoder side."""
        nz = sorted((ln, sym) for sym, ln in enumerate(lengths) if ln > 0)
        out = {}
        code = 0
        prev_len = 0
        for ln, sym in nz:
            code <<= ln - prev_len
            out[sym] = (code, ln)
            code += 1
            prev_len = ln
        return out


def _huff_lengths(freqs: list[int], max_len: int) -> list[int]:
    """Length-limited Huffman code lengths (merge algorithm + fold-down,
    the same public T.81 K.2 shape used by the JPEG encoder here)."""
    n = len(freqs)
    nz = [i for i, f in enumerate(freqs) if f > 0]
    if len(nz) == 1:  # single-symbol code: by convention length 1
        out = [0] * n
        out[nz[0]] = 1
        return out
    freq = list(freqs)
    codesize = [0] * n
    others = [-1] * n
    while True:
        v1 = v2 = -1
        m1 = m2 = None
        for i in range(n):
            f = freq[i]
            if f <= 0:
                continue
            if m1 is None or f < m1:
                v2, m2 = v1, m1
                v1, m1 = i, f
            elif m2 is None or f < m2:
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
    bits = [0] * 64
    for c in codesize:
        if c:
            bits[c] += 1
    for ln in range(63, max_len, -1):
        while bits[ln] > 0:
            j = ln - 2
            while bits[j] == 0:
                j -= 1
            bits[ln] -= 2
            bits[ln - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
    # reassign lengths canonically: shortest lengths to most frequent
    order = sorted((i for i in range(n) if codesize[i]),
                   key=lambda i: (-freqs[i], i))
    lengths = [0] * n
    k = 0
    for ln in range(1, max_len + 1):
        for _ in range(bits[ln]):
            lengths[order[k]] = ln
            k += 1
    return lengths


# ------------------------------------------------------------------ decode

def _read_code(br: _Bits, alphabet: int) -> _Canon:
    """One Huffman code declaration: simple (1-2 symbols) or normal
    (code-length-code + RLE-coded lengths)."""
    if br.read(1):  # simple
        num = br.read(1) + 1
        if br.read(1):
            sym0 = br.read(8)
        else:
            sym0 = br.read(1)
        lengths = [0] * alphabet
        if sym0 >= alphabet:
            raise Vp8lError("simple code symbol out of range")
        if num == 2:
            sym1 = br.read(8)
            if sym1 >= alphabet:
                raise Vp8lError("simple code symbol out of range")
            lengths[sym0] = lengths[sym1] = 1
        else:
            lengths[sym0] = 1
        c = _Canon.__new__(_Canon)
        if num == 1:
            c.single = sym0
            return c
        return _Canon(lengths)
    num_codes = br.read(4) + 4
    if num_codes > 19:
        raise Vp8lError("too many code-length codes")
    clc_lengths = [0] * 19
    for i in range(num_codes):
        clc_lengths[_CLC_ORDER[i]] = br.read(3)
    clc = _Canon(clc_lengths)
    max_symbol = alphabet
    if br.read(1):  # use length
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
        if max_symbol > alphabet:
            raise Vp8lError("max_symbol exceeds alphabet")
    lengths = [0] * alphabet
    prev = 8
    sym = 0
    while sym < alphabet:
        if max_symbol == 0:
            break
        max_symbol -= 1
        s = clc.read(br)
        if s < 16:
            lengths[sym] = s
            sym += 1
            if s:
                prev = s
        elif s == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if sym >= alphabet:
                    raise Vp8lError("code-length repeat overruns alphabet")
                lengths[sym] = prev
                sym += 1
        elif s == 17:
            sym += 3 + br.read(3)
        else:  # 18
            sym += 11 + br.read(7)
        if sym > alphabet:
            raise Vp8lError("code-length run overruns alphabet")
    return _Canon(lengths)


def _prefix_value(code: int, br: _Bits) -> int:
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _decode_pixels(br: _Bits, w: int, h: int, level0: bool):
    """The spec's decode_image_stream for one (sub-)image: optional
    color cache, optional meta-Huffman (level0 only), 5 codes per
    group, LZ77-coded ARGB pixels.  Returns a flat list of packed
    ARGB ints."""
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise Vp8lError(f"bad color-cache size {cache_bits}")
    meta = None
    meta_bits = 0
    n_groups = 1
    if level0 and br.read(1):
        meta_bits = br.read(3) + 2
        ew = (w + (1 << meta_bits) - 1) >> meta_bits
        eh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta = _decode_pixels(br, ew, eh, False)
        n_groups = max(((p >> 8) & 0xFFFF) for p in meta) + 1
    cache_size = (1 << cache_bits) if cache_bits else 0
    groups = []
    for _ in range(n_groups):
        green = _read_code(br, 256 + 24 + cache_size)
        red = _read_code(br, 256)
        blue = _read_code(br, 256)
        alpha = _read_code(br, 256)
        dist = _read_code(br, 40)
        groups.append((green, red, blue, alpha, dist))
    cache = [0] * cache_size
    out: list[int] = []
    npx = w * h
    while len(out) < npx:
        if meta is not None:
            x, y = len(out) % w, len(out) // w
            mp = meta[(y >> meta_bits) * ((w + (1 << meta_bits) - 1)
                                          >> meta_bits) + (x >> meta_bits)]
            g = groups[(mp >> 8) & 0xFFFF]
        else:
            g = groups[0]
        s = g[0].read(br)
        if s < 256:
            r = g[1].read(br)
            b = g[2].read(br)
            a = g[3].read(br)
            px = (a << 24) | (r << 16) | (s << 8) | b
            out.append(px)
            if cache_size:
                cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)] = px
        elif s < 280:
            length = _prefix_value(s - 256, br)
            dcode = _prefix_value(g[4].read(br), br)
            if dcode <= 120:
                dx, dy = _DIST_MAP[dcode - 1]
                d = dx + dy * w
                if d < 1:
                    d = 1
            else:
                d = dcode - 120
            if d > len(out):
                raise Vp8lError("LZ77 distance reaches before image start")
            if len(out) + length > npx:
                raise Vp8lError("LZ77 copy runs past image end")
            base = len(out) - d
            for i in range(length):
                px = out[base + i]
                out.append(px)
                if cache_size:
                    cache[(0x1E35A7BD * px & 0xFFFFFFFF)
                          >> (32 - cache_bits)] = px
        else:
            idx = s - 280
            if idx >= cache_size:
                raise Vp8lError("color-cache index out of range")
            out.append(cache[idx])
    return out


def _ctd(t: int, c: int) -> int:
    """ColorTransformDelta: signed-int8 product >> 5."""
    t = t - 256 if t >= 128 else t
    c = c - 256 if c >= 128 else c
    return (t * c) >> 5


def _avg2(a: int, b: int) -> int:
    return (a + b) >> 1


def _predict(mode: int, l: int, t: int, tl: int, tr: int) -> int:
    """The 14 VP8L spatial predictors over packed ARGB."""
    def ch(p):
        return ((p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF)

    def pack(c):
        return (c[0] << 24) | (c[1] << 16) | (c[2] << 8) | c[3]

    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return l
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    la, ta, tla, tra = ch(l), ch(t), ch(tl), ch(tr)
    if mode == 5:
        return pack([_avg2(_avg2(la[i], tra[i]), ta[i]) for i in range(4)])
    if mode == 6:
        return pack([_avg2(la[i], tla[i]) for i in range(4)])
    if mode == 7:
        return pack([_avg2(la[i], ta[i]) for i in range(4)])
    if mode == 8:
        return pack([_avg2(tla[i], ta[i]) for i in range(4)])
    if mode == 9:
        return pack([_avg2(ta[i], tra[i]) for i in range(4)])
    if mode == 10:
        return pack([_avg2(_avg2(la[i], tla[i]), _avg2(ta[i], tra[i]))
                     for i in range(4)])
    if mode == 11:  # Select
        p = [la[i] + ta[i] - tla[i] for i in range(4)]
        pl = sum(abs(p[i] - la[i]) for i in range(4))
        pt = sum(abs(p[i] - ta[i]) for i in range(4))
        return l if pl < pt else t
    if mode == 12:  # ClampAddSubtractFull
        return pack([min(255, max(0, la[i] + ta[i] - tla[i]))
                     for i in range(4)])
    if mode == 13:  # ClampAddSubtractHalf
        out = []
        for i in range(4):
            a = _avg2(la[i], ta[i])
            d = a - tla[i]
            # C truncation toward zero
            out.append(min(255, max(0, a + (abs(d) >> 1) * (1 if d >= 0 else -1))))
        return pack(out)
    raise Vp8lError(f"predictor mode {mode} out of range")


def _apply_inverse_transforms(pixels, transforms, w, h):
    for kind, *args in reversed(transforms):
        if kind == "palette":
            width_bits, pal, out_w = args
            if width_bits:
                bpi = 8 >> width_bits
                mask = (1 << bpi) - 1
                per = 1 << width_bits
                packed_w = (out_w + per - 1) >> width_bits
                unb = []
                for y in range(h):
                    for x in range(out_w):
                        gp = pixels[y * packed_w + (x >> width_bits)]
                        idx = ((gp >> 8) & 0xFF) >> ((x & (per - 1)) * bpi) & mask
                        unb.append(idx)
                idxs = unb
            else:
                idxs = [((p >> 8) & 0xFF) for p in pixels]
            for i in idxs:
                if i >= len(pal):
                    raise Vp8lError("palette index out of range")
            pixels = [pal[i] for i in idxs]
            w = out_w
        elif kind == "subgreen":
            nxt = []
            for p in pixels:
                g = (p >> 8) & 0xFF
                r = ((p >> 16) + g) & 0xFF
                b = (p + g) & 0xFF
                nxt.append((p & 0xFF000000) | (r << 16) | (g << 8) | b)
            pixels = nxt
        elif kind == "color":
            bits, tiles = args
            tw = (w + (1 << bits) - 1) >> bits
            nxt = []
            for y in range(h):
                for x in range(w):
                    p = pixels[y * w + x]
                    tp = tiles[(y >> bits) * tw + (x >> bits)]
                    g2r, g2b, r2b = tp & 0xFF, (tp >> 8) & 0xFF, (tp >> 16) & 0xFF
                    g = (p >> 8) & 0xFF
                    r = ((p >> 16) & 0xFF) + _ctd(g2r, g)
                    r &= 0xFF
                    b = (p & 0xFF) + _ctd(g2b, g) + _ctd(r2b, r)
                    b &= 0xFF
                    nxt.append((p & 0xFF00FF00) | (r << 16) | b)
            pixels = nxt
        elif kind == "pred":
            bits, tiles = args
            tw = (w + (1 << bits) - 1) >> bits
            out = []
            for y in range(h):
                for x in range(w):
                    i = y * w + x
                    if x == 0 and y == 0:
                        pred = 0xFF000000
                    elif y == 0:
                        pred = out[i - 1]
                    elif x == 0:
                        pred = out[i - w]
                    else:
                        mode = (tiles[(y >> bits) * tw + (x >> bits)] >> 8) & 0xFF
                        pred = _predict(
                            mode, out[i - 1], out[i - w], out[i - w - 1],
                            out[i - w + 1],
                        )
                    res = pixels[i]
                    out.append(
                        (((res >> 24) + (pred >> 24)) & 0xFF) << 24
                        | ((((res >> 16) & 0xFF) + ((pred >> 16) & 0xFF)) & 0xFF) << 16
                        | ((((res >> 8) & 0xFF) + ((pred >> 8) & 0xFF)) & 0xFF) << 8
                        | (((res & 0xFF) + (pred & 0xFF)) & 0xFF)
                    )
            pixels = out
        else:
            raise Vp8lError(f"unknown transform {kind}")
    return pixels, w


def _vp8l_chunk(data: bytes) -> bytes:
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise Vp8lError("not a WebP payload")
    pos = 12
    while pos + 8 <= len(data):
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if fourcc == b"VP8L":
            if len(body) < size:
                raise Vp8lError("truncated VP8L chunk")
            return body
        if fourcc == b"VP8 ":
            raise Vp8lError(
                "cannot pixel-decode lossy WebP VP8 (boolean arithmetic "
                "coder + DCT) — probe_webp serves header metadata"
            )
        if fourcc == b"VP8X":
            pos += 8 + size + (size & 1)
            continue
        pos += 8 + size + (size & 1)
    raise Vp8lError("no VP8L chunk found")


def decode(data: bytes) -> dict:
    """Full VP8L pixel decode → ``{width, height, mode, pixels}``
    (top-down RGB or RGBA bytes), the common image-codec contract."""
    body = _vp8l_chunk(data)
    if not body or body[0] != 0x2F:
        raise Vp8lError("bad VP8L signature byte")
    br = _Bits(body)
    br.read(8)
    w = br.read(14) + 1
    h = br.read(14) + 1
    alpha_used = br.read(1)
    version = br.read(3)
    if version != 0:
        raise Vp8lError(f"unknown VP8L version {version}")

    transforms = []
    cur_w = w
    seen = set()
    while br.read(1):
        t = br.read(2)
        if t in seen:
            raise Vp8lError(f"transform {t} declared twice")
        seen.add(t)
        if t == 2:
            transforms.append(("subgreen",))
        elif t in (0, 1):
            bits = br.read(3) + 2
            tw = (cur_w + (1 << bits) - 1) >> bits
            th = (h + (1 << bits) - 1) >> bits
            tiles = _decode_pixels(br, tw, th, False)
            transforms.append(("pred" if t == 0 else "color", bits, tiles))
        else:  # color indexing
            psize = br.read(8) + 1
            pal = _decode_pixels(br, psize, 1, False)
            for i in range(1, len(pal)):  # entries are delta-coded
                a = (pal[i] >> 24) + (pal[i - 1] >> 24) & 0xFF
                r = ((pal[i] >> 16) & 0xFF) + ((pal[i - 1] >> 16) & 0xFF) & 0xFF
                g = ((pal[i] >> 8) & 0xFF) + ((pal[i - 1] >> 8) & 0xFF) & 0xFF
                b = (pal[i] & 0xFF) + (pal[i - 1] & 0xFF) & 0xFF
                pal[i] = (a << 24) | (r << 16) | (g << 8) | b
            width_bits = (3 if psize <= 2 else 2 if psize <= 4
                          else 1 if psize <= 16 else 0)
            transforms.append(("palette", width_bits, pal, cur_w))
            cur_w = (cur_w + (1 << width_bits) - 1) >> width_bits
    pixels = _decode_pixels(br, cur_w, h, True)
    pixels, _w = _apply_inverse_transforms(pixels, transforms, cur_w, h)
    if len(pixels) != w * h:
        raise Vp8lError("decoded pixel count mismatch")
    if alpha_used:
        out = bytearray(w * h * 4)
        for i, p in enumerate(pixels):
            out[4 * i] = (p >> 16) & 0xFF
            out[4 * i + 1] = (p >> 8) & 0xFF
            out[4 * i + 2] = p & 0xFF
            out[4 * i + 3] = (p >> 24) & 0xFF
        return {"width": w, "height": h, "mode": "RGBA", "pixels": bytes(out)}
    out = bytearray(w * h * 3)
    for i, p in enumerate(pixels):
        out[3 * i] = (p >> 16) & 0xFF
        out[3 * i + 1] = (p >> 8) & 0xFF
        out[3 * i + 2] = p & 0xFF
    return {"width": w, "height": h, "mode": "RGB", "pixels": bytes(out)}


# ------------------------------------------------------------------ encode

def _emit_code(bw: _BitsW, lengths: list[int]):
    """Declare one Huffman code: simple form for ≤2 symbols, else the
    code-length-code machinery with literal lengths (no RLE — fixtures
    favor simplicity; the DECODER handles RLE from real files)."""
    nz = [s for s, ln in enumerate(lengths) if ln > 0]
    if len(nz) <= 2 and all(s < 256 for s in nz):
        bw.write(1, 1)  # simple
        bw.write(len(nz) - 1, 1)
        if nz[0] > 1:
            bw.write(1, 1)
            bw.write(nz[0], 8)
        else:
            bw.write(0, 1)
            bw.write(nz[0], 1)
        if len(nz) == 2:
            bw.write(nz[1], 8)
        return
    bw.write(0, 1)  # normal
    # code over the code-length alphabet (literal symbols 0..15 only)
    clc_freq = [0] * 19
    for ln in lengths:
        clc_freq[ln] += 1
    clc_lengths = _huff_lengths(clc_freq, 7)
    bw.write(19 - 4, 4)
    for sym in _CLC_ORDER:
        bw.write(clc_lengths[sym], 3)
    bw.write(0, 1)  # no max_symbol shortcut
    codes = _Canon.codes(clc_lengths)
    for ln in lengths:
        code, n = codes[ln]
        # canonical codes are MSB-first even in this LSB-first stream
        for i in range(n - 1, -1, -1):
            bw.write((code >> i) & 1, 1)


class _SymWriter:
    """Writes Huffman symbols MSB-first through the LSB-first writer."""

    def __init__(self, bw: _BitsW, lengths: list[int]):
        self.bw = bw
        self.codes = _Canon.codes(lengths)
        self.trivial = sum(1 for ln in lengths if ln) == 1

    def write(self, sym: int):
        if self.trivial:
            return  # single-symbol code: zero bits on the wire
        code, n = self.codes[sym]
        for i in range(n - 1, -1, -1):
            self.bw.write((code >> i) & 1, 1)


def _tokenize(pixels: list[int], cache_bits: int, lz77: bool):
    """(tokens, freqs): LZ77 distance-1 run detection + color cache."""
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [None] * cache_size
    toks = []
    fg = [0] * (256 + 24 + cache_size)
    fr, fb, fa = [0] * 256, [0] * 256, [0] * 256
    fd = [0] * 40

    def prefix_code(v):
        if v < 5:
            return v - 1, 0, 0
        # derive (code, extra bits) by inverting _prefix_value
        for code in range(4, 40):
            extra = (code - 2) >> 1
            offset = (2 + (code & 1)) << extra
            if offset + 1 <= v <= offset + (1 << extra):
                return code, v - offset - 1, extra
        raise Vp8lError(f"prefix value {v} out of range")

    i = 0
    n = len(pixels)
    while i < n:
        if lz77 and i > 0 and pixels[i] == pixels[i - 1]:
            run = 1
            while i + run < n and pixels[i + run] == pixels[i + run - 1]:
                run += 1
            if run >= 3:
                run = min(run, 4096)
                lcode, lextra, lebits = prefix_code(run)
                dcode, dextra, debits = prefix_code(1 + 120)
                toks.append(("ref", 256 + lcode, lextra, lebits,
                             dcode, dextra, debits))
                fg[256 + lcode] += 1
                fd[dcode] += 1
                if cache_size:
                    for j in range(run):
                        px = pixels[i + j]
                        cache[(0x1E35A7BD * px & 0xFFFFFFFF)
                              >> (32 - cache_bits)] = px
                i += run
                continue
        px = pixels[i]
        if cache_size:
            slot = (0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)
            if cache[slot] == px:
                toks.append(("cache", 280 + slot))
                fg[280 + slot] += 1
                i += 1
                continue
            cache[slot] = px
        toks.append(("lit", (px >> 8) & 0xFF, (px >> 16) & 0xFF,
                     px & 0xFF, (px >> 24) & 0xFF))
        fg[(px >> 8) & 0xFF] += 1
        fr[(px >> 16) & 0xFF] += 1
        fb[px & 0xFF] += 1
        fa[(px >> 24) & 0xFF] += 1
        i += 1
    return toks, (fg, fr, fb, fa, fd)


def _emit_pixels(bw: _BitsW, pixels: list[int], cache_bits: int, lz77: bool):
    toks, (fg, fr, fb, fa, fd) = _tokenize(pixels, cache_bits, lz77)
    # every code needs >=1 symbol even if unused
    for f in (fg, fr, fb, fa, fd):
        if not any(f):
            f[0] = 1
    bw.write(1 if cache_bits else 0, 1)
    if cache_bits:
        bw.write(cache_bits, 4)
    lg = _huff_lengths(fg, 15)
    lr = _huff_lengths(fr, 15)
    lb = _huff_lengths(fb, 15)
    la = _huff_lengths(fa, 15)
    ld = _huff_lengths(fd, 15)
    for ln in (lg, lr, lb, la, ld):
        _emit_code(bw, ln)
    wg, wr, wb, wa, wd = (_SymWriter(bw, ln) for ln in (lg, lr, lb, la, ld))
    for t in toks:
        if t[0] == "lit":
            _k, g, r, b, a = t
            wg.write(g)
            wr.write(r)
            wb.write(b)
            wa.write(a)
        elif t[0] == "cache":
            wg.write(t[1])
        else:
            _k, gsym, lextra, lebits, dcode, dextra, debits = t
            wg.write(gsym)
            if lebits:
                bw.write(lextra, lebits)
            wd.write(dcode)
            if debits:
                bw.write(dextra, debits)


def encode(
    width: int,
    height: int,
    pixels: bytes,
    mode: str = "RGB",
    subtract_green: bool = True,
    predictor: int | None = None,
    color_transform: tuple[int, int, int] | None = None,
    palette: bool = False,
    cache_bits: int = 0,
    lz77: bool = True,
) -> bytes:
    """Real VP8L inside a RIFF/WEBP wrapper from top-down RGB/RGBA
    bytes.  ``predictor`` applies the fixed spatial mode (0-13) as a
    predictor transform; ``color_transform`` applies the cross-color
    transform with fixed (green_to_red, green_to_blue, red_to_blue)
    int8 multipliers; ``palette`` uses color-indexing (with pixel
    bundling when ≤16 colors); the spatial transforms compose with
    ``subtract_green``, the color cache and distance-1 LZ77 runs —
    enough surface to exercise every decoder path with streams the
    decoder's own tests did not synthesize."""
    ch = 4 if mode == "RGBA" else 3
    if len(pixels) != width * height * ch:
        raise Vp8lError("pixel buffer does not match dimensions")
    argb = []
    for i in range(width * height):
        r, g, b = pixels[ch * i], pixels[ch * i + 1], pixels[ch * i + 2]
        a = pixels[ch * i + 3] if ch == 4 else 255
        argb.append((a << 24) | (r << 16) | (g << 8) | b)
    alpha_used = any((p >> 24) != 0xFF for p in argb)

    bw = _BitsW()
    bw.write(0x2F, 8)
    bw.write(width - 1, 14)
    bw.write(height - 1, 14)
    bw.write(1 if alpha_used else 0, 1)
    bw.write(0, 3)

    cur_w = width
    data = argb
    if palette:
        if predictor is not None or subtract_green or color_transform:
            raise Vp8lError("palette composes with no other transform "
                            "in this encoder")
        colors = []
        index = {}
        for p in data:
            if p not in index:
                index[p] = len(colors)
                colors.append(p)
        if len(colors) > 256:
            raise Vp8lError("palette encode supports at most 256 colors")
        psize = len(colors)
        width_bits = (3 if psize <= 2 else 2 if psize <= 4
                      else 1 if psize <= 16 else 0)
        bw.write(1, 1)
        bw.write(3, 2)
        bw.write(psize - 1, 8)
        # palette entries delta-coded, as their own pixel stream
        deltas = []
        prev = 0
        for p in colors:
            a = ((p >> 24) - (prev >> 24)) & 0xFF
            r = (((p >> 16) & 0xFF) - ((prev >> 16) & 0xFF)) & 0xFF
            g = (((p >> 8) & 0xFF) - ((prev >> 8) & 0xFF)) & 0xFF
            b = ((p & 0xFF) - (prev & 0xFF)) & 0xFF
            deltas.append((a << 24) | (r << 16) | (g << 8) | b)
            prev = p
        _emit_pixels(bw, deltas, 0, False)
        # bundle indices into green bytes
        if width_bits:
            per = 1 << width_bits
            bpi = 8 >> width_bits
            packed_w = (width + per - 1) >> width_bits
            packed = []
            for y in range(height):
                for px_ in range(packed_w):
                    gv = 0
                    for k in range(per):
                        x = px_ * per + k
                        if x < width:
                            gv |= index[data[y * width + x]] << (k * bpi)
                    packed.append(0xFF000000 | (gv << 8))
            data = packed
            cur_w = packed_w
        else:
            data = [0xFF000000 | (index[p] << 8) for p in data]
    else:
        if predictor is not None:
            if not 0 <= predictor <= 13:
                raise Vp8lError("predictor mode must be 0-13")
            bits = 4
            bw.write(1, 1)
            bw.write(0, 2)
            bw.write(bits - 2, 3)
            tw = (cur_w + (1 << bits) - 1) >> bits
            th = (height + (1 << bits) - 1) >> bits
            tiles = [0xFF000000 | (predictor << 8)] * (tw * th)
            _emit_pixels(bw, tiles, 0, False)
            res = []
            for y in range(height):
                for x in range(cur_w):
                    i = y * cur_w + x
                    if x == 0 and y == 0:
                        pred = 0xFF000000
                    elif y == 0:
                        pred = data[i - 1]
                    elif x == 0:
                        pred = data[i - cur_w]
                    else:
                        pred = _predict(predictor, data[i - 1],
                                        data[i - cur_w], data[i - cur_w - 1],
                                        data[i - cur_w + 1])
                    res.append(
                        (((data[i] >> 24) - (pred >> 24)) & 0xFF) << 24
                        | ((((data[i] >> 16) & 0xFF)
                            - ((pred >> 16) & 0xFF)) & 0xFF) << 16
                        | ((((data[i] >> 8) & 0xFF)
                            - ((pred >> 8) & 0xFF)) & 0xFF) << 8
                        | (((data[i] & 0xFF) - (pred & 0xFF)) & 0xFF)
                    )
            data = res
        if color_transform is not None:
            g2r, g2b, r2b = (m & 0xFF for m in color_transform)
            bits = 4
            bw.write(1, 1)
            bw.write(1, 2)
            bw.write(bits - 2, 3)
            tw = (cur_w + (1 << bits) - 1) >> bits
            th = (height + (1 << bits) - 1) >> bits
            tile_px = 0xFF000000 | (r2b << 16) | (g2b << 8) | g2r
            _emit_pixels(bw, [tile_px] * (tw * th), 0, False)
            nxt = []
            for p in data:
                g = (p >> 8) & 0xFF
                r0 = (p >> 16) & 0xFF
                r = (r0 - _ctd(g2r, g)) & 0xFF
                # the inverse reconstructs blue from the RECONSTRUCTED
                # red, so the forward delta uses the original red
                b = ((p & 0xFF) - _ctd(g2b, g) - _ctd(r2b, r0)) & 0xFF
                nxt.append((p & 0xFF00FF00) | (r << 16) | b)
            data = nxt
        if subtract_green:
            bw.write(1, 1)
            bw.write(2, 2)
            nxt = []
            for p in data:
                g = (p >> 8) & 0xFF
                r = (((p >> 16) & 0xFF) - g) & 0xFF
                b = ((p & 0xFF) - g) & 0xFF
                nxt.append((p & 0xFF00FF00) | (r << 16) | b)
            data = nxt
    bw.write(0, 1)  # end of transforms

    # main image, spec order: cache bit -> meta-huffman bit -> codes
    bw.write(1 if cache_bits else 0, 1)
    if cache_bits:
        bw.write(cache_bits, 4)
    bw.write(0, 1)  # no meta-huffman
    toks, (fg, fr, fb, fa, fd) = _tokenize(data, cache_bits, lz77)
    for f in (fg, fr, fb, fa, fd):
        if not any(f):
            f[0] = 1
    lens = [_huff_lengths(f, 15) for f in (fg, fr, fb, fa, fd)]
    for ln in lens:
        _emit_code(bw, ln)
    wg, wr, wb, wa, wd = (_SymWriter(bw, ln) for ln in lens)
    for t in toks:
        if t[0] == "lit":
            _k, g, r, b, a = t
            wg.write(g)
            wr.write(r)
            wb.write(b)
            wa.write(a)
        elif t[0] == "cache":
            wg.write(t[1])
        else:
            _k, gsym, lextra, lebits, dcode, dextra, debits = t
            wg.write(gsym)
            if lebits:
                bw.write(lextra, lebits)
            wd.write(dcode)
            if debits:
                bw.write(dextra, debits)

    payload = bw.flush()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
