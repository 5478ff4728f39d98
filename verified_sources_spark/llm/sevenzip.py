"""Pure-stdlib 7-Zip (.7z) archive member extraction + fixture
encoder.

Data dumps ship as .7z constantly (forum exports, wiki dumps, mirror
bundles) and Python has no stdlib container support — but it DOES
ship raw LZMA1/LZMA2 decoders (``lzma`` FORMAT_RAW), so the only
missing piece is the container: signature header → (possibly
LZMA-compressed) metadata header → PackInfo / UnpackInfo(folders) /
SubStreamsInfo / FilesInfo property tree, all sizes in 7z's
variable-length NUMBER encoding, CRC-gated.

Scope (refusals name what they hit): single-coder folders with
Copy (0x00), LZMA1 (0x030101) or LZMA2 (0x21) — the overwhelming
default writers emit; multi-coder chains (BCJ/delta filters) and
AES-encrypted archives (coder 0x06F10701) refuse by name.  Encoded
(kEncodedHeader) metadata decompresses through the same folder
machinery.  Every unpack is expansion-capped (the bomb gate), every
declared CRC is verified — a corrupt member raises, never silently
truncates.

``encode_7z`` writes real archives (one folder per member, LZMA2 or
LZMA1 or Copy coders, optional compressed header) with stdlib
``lzma`` as the compressor — a genuinely independent encode path for
the container walk.
"""

from __future__ import annotations

import lzma
import struct
import zlib

__all__ = ["SevenZipError", "iter_7z_members", "encode_7z"]

_MAGIC = b"7z\xbc\xaf\x27\x1c"

_K_END = 0x00
_K_HEADER = 0x01
_K_MAIN_STREAMS = 0x04
_K_FILES_INFO = 0x05
_K_PACK_INFO = 0x06
_K_UNPACK_INFO = 0x07
_K_SUBSTREAMS = 0x08
_K_SIZE = 0x09
_K_CRC = 0x0A
_K_FOLDER = 0x0B
_K_UNPACK_SIZE = 0x0C
_K_NUM_UNPACK = 0x0D
_K_EMPTY_STREAM = 0x0E
_K_EMPTY_FILE = 0x0F
_K_NAMES = 0x11
_K_ENCODED_HEADER = 0x17

_COPY = b"\x00"
_LZMA1 = b"\x03\x01\x01"
_LZMA2 = b"\x21"
_AES = b"\x06\xf1\x07\x01"


class SevenZipError(ValueError):
    """Named refusal: not a 7z this extractor can serve honestly."""


class _Rd:
    __slots__ = ("d", "p")

    def __init__(self, d: bytes, p: int = 0):
        self.d = d
        self.p = p

    def byte(self) -> int:
        if self.p >= len(self.d):
            raise SevenZipError("truncated 7z header")
        v = self.d[self.p]
        self.p += 1
        return v

    def take(self, n: int) -> bytes:
        if self.p + n > len(self.d):
            raise SevenZipError("truncated 7z header")
        v = self.d[self.p : self.p + n]
        self.p += n
        return v

    def number(self) -> int:
        first = self.byte()
        mask = 0x80
        value = 0
        for i in range(8):
            if first & mask == 0:
                value |= (first & (mask - 1)) << (8 * i)
                return value
            value |= self.byte() << (8 * i)
            mask >>= 1
        return value

    def bits(self, n: int) -> list[bool]:
        out = []
        b = 0
        avail = 0
        for _ in range(n):
            if avail == 0:
                b = self.byte()
                avail = 8
            out.append(bool(b & 0x80))
            b = (b << 1) & 0xFF
            avail -= 1
        return out

    def bools_with_allflag(self, n: int) -> list[bool]:
        return [True] * n if self.byte() else self.bits(n)


def _decode_folder(coder_id: bytes, props: bytes, packed: bytes,
                   out_size: int, max_out: int) -> bytes:
    if out_size > max_out:
        raise SevenZipError(
            f"7z member declares {out_size} bytes > cap {max_out} "
            f"— decompression-bomb gate")
    if coder_id == _COPY:
        if len(packed) < out_size:
            raise SevenZipError("truncated Copy stream")
        return packed[:out_size]
    try:
        if coder_id == _LZMA2:
            if len(props) != 1:
                raise SevenZipError("malformed LZMA2 properties")
            p = props[0]
            dict_size = (0xFFFFFFFF if p > 40
                         else (2 | (p & 1)) << (p // 2 + 11))
            dec = lzma.LZMADecompressor(
                format=lzma.FORMAT_RAW,
                filters=[{"id": lzma.FILTER_LZMA2,
                          "dict_size": dict_size}])
        elif coder_id == _LZMA1:
            if len(props) != 5:
                raise SevenZipError("malformed LZMA1 properties")
            pb, rem = divmod(props[0], 45)
            lp, lc = divmod(rem, 9)
            (dict_size,) = struct.unpack("<I", props[1:5])
            dec = lzma.LZMADecompressor(
                format=lzma.FORMAT_RAW,
                filters=[{"id": lzma.FILTER_LZMA1, "lc": lc, "lp": lp,
                          "pb": pb, "dict_size": max(dict_size, 4096)}])
        elif coder_id == _AES:
            raise SevenZipError("AES-encrypted 7z — refusing by name")
        else:
            raise SevenZipError(
                f"7z coder {coder_id.hex()} — refusing by name "
                f"(Copy/LZMA1/LZMA2 only)")
        out = dec.decompress(packed, max_length=out_size)
        if len(out) < out_size:
            raise SevenZipError(
                f"7z stream short: {len(out)} < {out_size}")
        return out
    except lzma.LZMAError as e:
        raise SevenZipError(f"corrupt LZMA stream: {e}") from None


def _parse_streams_info(r: _Rd, data: bytes, base: int,
                        max_out: int) -> tuple[list[bytes], list[int]]:
    """Parse kPackInfo/kUnpackInfo/kSubStreamsInfo; return (folder
    outputs decoded, substream sizes — one list entry per unpack
    stream, folder-major)."""
    pack_pos = 0
    pack_sizes: list[int] = []
    folders: list[dict] = []
    num_unpack: list[int] = []
    sub_sizes: list[int] | None = None
    while True:
        t = r.byte()
        if t == _K_END:
            break
        if t == _K_PACK_INFO:
            pack_pos = r.number()
            n = r.number()
            while True:
                t2 = r.byte()
                if t2 == _K_END:
                    break
                if t2 == _K_SIZE:
                    pack_sizes = [r.number() for _ in range(n)]
                elif t2 == _K_CRC:
                    defined = r.bools_with_allflag(n)
                    r.take(4 * sum(defined))
                else:
                    raise SevenZipError(f"unexpected PackInfo prop {t2}")
        elif t == _K_UNPACK_INFO:
            if r.byte() != _K_FOLDER:
                raise SevenZipError("UnpackInfo without kFolder")
            nf = r.number()
            if r.byte() != 0:
                raise SevenZipError("external folder data — refusing")
            for _ in range(nf):
                ncoders = r.number()
                if ncoders != 1:
                    raise SevenZipError(
                        f"multi-coder 7z folder ({ncoders} coders: "
                        f"BCJ/delta chains) — refusing by name")
                flags = r.byte()
                id_size = flags & 0x0F
                coder_id = r.take(id_size)
                if flags & 0x10:  # complex: multiple in/out streams
                    raise SevenZipError(
                        "complex 7z coder — refusing by name")
                props = b""
                if flags & 0x20:
                    props = r.take(r.number())
                folders.append({"id": coder_id, "props": props})
            if r.byte() != _K_UNPACK_SIZE:
                raise SevenZipError("UnpackInfo without kCodersUnpackSize")
            for f in folders:
                f["out_size"] = r.number()
            while True:
                t2 = r.byte()
                if t2 == _K_END:
                    break
                if t2 == _K_CRC:
                    defined = r.bools_with_allflag(len(folders))
                    crcs = struct.unpack(
                        f"<{sum(defined)}I", r.take(4 * sum(defined)))
                    it = iter(crcs)
                    for f, dfn in zip(folders, defined):
                        f["crc"] = next(it) if dfn else None
                else:
                    raise SevenZipError(f"unexpected UnpackInfo prop {t2}")
        elif t == _K_SUBSTREAMS:
            num_unpack = [1] * len(folders)
            sub_sizes = None
            while True:
                t2 = r.byte()
                if t2 == _K_END:
                    break
                if t2 == _K_NUM_UNPACK:
                    num_unpack = [r.number() for _ in folders]
                elif t2 == _K_SIZE:
                    sub_sizes = []
                    for fi, f in enumerate(folders):
                        total = 0
                        for _ in range(num_unpack[fi] - 1):
                            s = r.number()
                            sub_sizes.append(s)
                            total += s
                        sub_sizes.append(f["out_size"] - total)
                elif t2 == _K_CRC:
                    ndig = sum(
                        0 if (n == 1 and f.get("crc") is not None) else n
                        for n, f in zip(num_unpack, folders))
                    defined = r.bools_with_allflag(ndig)
                    r.take(4 * sum(defined))
                else:
                    raise SevenZipError(
                        f"unexpected SubStreamsInfo prop {t2}")
        else:
            raise SevenZipError(f"unexpected StreamsInfo prop {t}")

    # decode folders (one pack stream per folder in the supported set)
    if len(pack_sizes) != len(folders):
        raise SevenZipError(
            f"{len(pack_sizes)} pack streams for {len(folders)} folders "
            f"— unsupported layout")
    outputs: list[bytes] = []
    off = base + pack_pos
    for f, psize in zip(folders, pack_sizes):
        packed = data[off : off + psize]
        if len(packed) < psize:
            raise SevenZipError("truncated 7z pack stream")
        off += psize
        out = _decode_folder(f["id"], f["props"], packed,
                             f["out_size"], max_out)
        if f.get("crc") is not None and zlib.crc32(out) != f["crc"]:
            raise SevenZipError("7z folder CRC mismatch")
        outputs.append(out)
    if not num_unpack:
        num_unpack = [1] * len(folders)
    if sub_sizes is None:
        sub_sizes = [f["out_size"] for f in folders]
    # split folder outputs into substreams, folder-major
    streams: list[bytes] = []
    si = 0
    for fi, out in enumerate(outputs):
        pos = 0
        for _ in range(num_unpack[fi]):
            s = sub_sizes[si]
            si += 1
            streams.append(out[pos : pos + s])
            pos += s
    return streams, sub_sizes


def iter_7z_members(data: bytes, max_member_bytes: int = 1 << 30):
    """Yield (name, payload) per archive member in order."""
    if data[:6] != _MAGIC:
        raise SevenZipError(f"not a 7z archive (magic {data[:6]!r})")
    if len(data) < 32:
        raise SevenZipError("truncated 7z signature header")
    nh_off, nh_size = struct.unpack_from("<QQ", data, 12)
    (nh_crc,) = struct.unpack_from("<I", data, 28)
    start = 32 + nh_off
    header = data[start : start + nh_size]
    if len(header) < nh_size:
        raise SevenZipError("truncated 7z metadata header")
    if zlib.crc32(header) != nh_crc:
        raise SevenZipError("7z header CRC mismatch")
    r = _Rd(header)
    t = r.byte()
    if t == _K_ENCODED_HEADER:
        streams, _ = _parse_streams_info(r, data, 32, max_member_bytes)
        if len(streams) != 1:
            raise SevenZipError("encoded header is not one stream")
        r = _Rd(streams[0])
        t = r.byte()
    if t != _K_HEADER:
        raise SevenZipError(f"unexpected 7z header type 0x{t:02X}")

    streams: list[bytes] = []
    names: list[str] = []
    empty_stream: list[bool] = []
    empty_file: list[bool] | None = None
    while True:
        t = r.byte()
        if t == _K_END:
            break
        if t == _K_MAIN_STREAMS:
            streams, _ = _parse_streams_info(r, data, 32,
                                             max_member_bytes)
        elif t == _K_FILES_INFO:
            n_files = r.number()
            empty_stream = [False] * n_files
            while True:
                pt = r.byte()
                if pt == _K_END:
                    break
                size = r.number()
                end = r.p + size
                if pt == _K_NAMES:
                    if r.byte() != 0:
                        raise SevenZipError("external names — refusing")
                    raw = r.take(end - r.p)
                    names = [s.decode("utf-16-le", "replace")
                             for s in raw.split(b"\x00\x00\x00")[0]
                             .split(b"\x00\x00") if s] if False else []
                    # robust split: UTF-16LE names are NUL-terminated
                    names = []
                    acc = bytearray()
                    i = 0
                    while i + 1 < len(raw) + 1 and i < len(raw):
                        ch = raw[i : i + 2]
                        i += 2
                        if ch == b"\x00\x00":
                            names.append(
                                acc.decode("utf-16-le", "replace"))
                            acc = bytearray()
                        else:
                            acc += ch
                elif pt == _K_EMPTY_STREAM:
                    empty_stream = r.bits(n_files)
                    r.p = end
                elif pt == _K_EMPTY_FILE:
                    # one bit per EMPTY-STREAM entry (7-Zip writes
                    # kEmptyStream first): set = empty file, clear =
                    # directory.  Absent property = all directories.
                    empty_file = r.bits(sum(empty_stream))
                    r.p = end
                else:
                    r.p = end  # times/attributes/etc: size-skippable
        else:
            raise SevenZipError(f"unexpected 7z header prop 0x{t:02X}")

    if not names:
        raise SevenZipError("7z archive without a FilesInfo name table")
    si = 0
    ei = 0
    for i, name in enumerate(names):
        if i < len(empty_stream) and empty_stream[i]:
            # empty-stream entry: a FILE only if its kEmptyFile bit is
            # set; otherwise a directory — skipped, matching
            # iter_members' contract for zip/tar (yield regular
            # members only, never inflate member counts with dirs)
            is_file = (empty_file is not None and ei < len(empty_file)
                       and empty_file[ei])
            ei += 1
            if is_file:
                yield name, b""
            continue
        if si >= len(streams):
            raise SevenZipError(
                f"7z name table lists {len(names)} files but only "
                f"{len(streams)} streams decoded")
        yield name, streams[si]
        si += 1


def _wnum(v: int) -> bytes:
    if v < 0x80:
        return bytes([v])
    return b"\xff" + struct.pack("<Q", v)


def encode_7z(members: dict[str, bytes], codec: str = "lzma2",
              encoded_header: bool = False) -> bytes:
    """Real .7z fixture: one single-coder folder per non-empty member
    (``codec`` in 'copy' / 'lzma1' / 'lzma2'), CRC-stamped pack data,
    optional LZMA2-compressed metadata header (kEncodedHeader)."""
    names = list(members)
    payloads = [members[n] for n in names]
    nonempty = [(n, p) for n, p in zip(names, payloads) if p]

    packs: list[bytes] = []
    folders: list[tuple[bytes, bytes, int, int]] = []  # id, props, out, crc
    for _, p in nonempty:
        if codec == "copy":
            packs.append(p)
            folders.append((_COPY, b"", len(p), zlib.crc32(p)))
        elif codec == "lzma1":
            filt = [{"id": lzma.FILTER_LZMA1, "lc": 3, "lp": 0, "pb": 2,
                     "dict_size": 1 << 20}]
            c = lzma.LZMACompressor(format=lzma.FORMAT_RAW, filters=filt)
            packs.append(c.compress(p) + c.flush())
            props = bytes([(2 * 5 + 0) * 9 + 3]) + struct.pack(
                "<I", 1 << 20)
            folders.append((_LZMA1, props, len(p), zlib.crc32(p)))
        elif codec == "lzma2":
            filt = [{"id": lzma.FILTER_LZMA2, "preset": 6}]
            c = lzma.LZMACompressor(format=lzma.FORMAT_RAW, filters=filt)
            packs.append(c.compress(p) + c.flush())
            # dict-size property byte for 8 MiB (preset 6 default is
            # larger, but a DECODER dict may be bigger than the
            # encoder's — 24 -> 16 MiB is safe for fixture sizes)
            folders.append((_LZMA2, bytes([24]), len(p), zlib.crc32(p)))
        else:
            raise SevenZipError(f"unknown fixture codec {codec!r}")

    def streams_info() -> bytes:
        h = bytearray([_K_PACK_INFO])
        h += _wnum(0) + _wnum(len(packs)) + bytes([_K_SIZE])
        for p in packs:
            h += _wnum(len(p))
        h += bytes([_K_END])
        h += bytes([_K_UNPACK_INFO, _K_FOLDER]) + _wnum(len(folders))
        h += b"\x00"  # not external
        for cid, props, _out, _crc in folders:
            h += _wnum(1)  # numCoders
            flags = len(cid) | (0x20 if props else 0)
            h += bytes([flags]) + cid
            if props:
                h += _wnum(len(props)) + props
        h += bytes([_K_UNPACK_SIZE])
        for _cid, _props, out, _crc in folders:
            h += _wnum(out)
        h += bytes([_K_CRC, 1])  # all defined
        for _cid, _props, _out, crc in folders:
            h += struct.pack("<I", crc)
        h += bytes([_K_END, _K_END])
        return bytes(h)

    header = bytearray([_K_HEADER])
    if nonempty:
        header += bytes([_K_MAIN_STREAMS]) + streams_info()
    header += bytes([_K_FILES_INFO]) + _wnum(len(names))
    if len(nonempty) != len(names):
        bits = bytearray()
        acc = 0
        for i, n in enumerate(names):
            acc = (acc << 1) | (0 if members[n] else 1)
            if i % 8 == 7:
                bits.append(acc)
                acc = 0
        if len(names) % 8:
            bits.append(acc << (8 - len(names) % 8))
        header += bytes([_K_EMPTY_STREAM]) + _wnum(len(bits)) + bits
        # kEmptyFile: every empty stream here is an empty FILE (the
        # fixture encoder has no directories) — without this property
        # the spec reads them as directories and readers drop them
        n_empty = len(names) - len(nonempty)
        ebits = bytearray(b"\xff" * (n_empty // 8))
        if n_empty % 8:
            ebits.append((0xFF << (8 - n_empty % 8)) & 0xFF)
        header += bytes([_K_EMPTY_FILE]) + _wnum(len(ebits)) + ebits
    raw_names = b"\x00" + b"".join(
        n.encode("utf-16-le") + b"\x00\x00" for n in names)
    header += bytes([_K_NAMES]) + _wnum(len(raw_names)) + raw_names
    header += bytes([_K_END, _K_END])
    header = bytes(header)

    body = b"".join(packs)
    if encoded_header:
        filt = [{"id": lzma.FILTER_LZMA2, "preset": 6}]
        c = lzma.LZMACompressor(format=lzma.FORMAT_RAW, filters=filt)
        hpack = c.compress(header) + c.flush()
        meta = bytearray([_K_ENCODED_HEADER, _K_PACK_INFO])
        meta += _wnum(len(body)) + _wnum(1) + bytes([_K_SIZE])
        meta += _wnum(len(hpack)) + bytes([_K_END])
        meta += bytes([_K_UNPACK_INFO, _K_FOLDER]) + _wnum(1) + b"\x00"
        meta += _wnum(1)  # numCoders
        meta += bytes([1 | 0x20]) + _LZMA2 + _wnum(1) + bytes([24])
        meta += bytes([_K_UNPACK_SIZE]) + _wnum(len(header))
        meta += bytes([_K_CRC, 1]) + struct.pack("<I", zlib.crc32(header))
        meta += bytes([_K_END, _K_END])
        body += hpack
        header = bytes(meta)

    nh = struct.pack("<QQI", len(body), len(header), zlib.crc32(header))
    sig = _MAGIC + b"\x00\x04" + struct.pack("<I", zlib.crc32(nh)) + nh
    return sig + body + header
