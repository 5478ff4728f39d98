"""Pure-stdlib Compound File Binary (OLE2 / MS-CFB) container walk.

Legacy binary Office documents — .doc, .xls, .ppt, plus MSI and MSG —
are CFB containers: a FAT filesystem-in-a-file with 512-byte sectors,
a directory tree of named streams, and a 64-byte-mini-sector "mini
stream" for payloads under 4096 bytes.  Older corpora are full of
them, and the reference's unstructured_data source routes exactly
these local files into text pipelines
(/root/reference/sources/unstructured_data/helpers.py).  This module
is the container half: ``list_streams`` yields every stream's full
path and bytes so format layers (llm/worddoc, llm/xlsdoc) can find
their streams; everything is bounds- and cycle-checked (chain caps,
directory-id cycles, sector range checks) so a corrupt file raises
``CfbError`` instead of looping or silently truncating.

``encode_cfb`` writes a real v3 container (FAT chains, red-black-
flattened directory, miniFAT + mini stream for small payloads) for
fixtures — byte layouts are pinned by tests against the MS-CFB spec
values (magic, sector shifts, DIFAT layout), since no system OLE2
library exists in this environment to cross-check against.
"""

from __future__ import annotations

import struct

__all__ = ["CfbError", "list_streams", "encode_cfb"]

_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_ENDOFCHAIN = 0xFFFFFFFE
_FATSECT = 0xFFFFFFFD
_DIFSECT = 0xFFFFFFFC
_FREESECT = 0xFFFFFFFF
_NOSTREAM = 0xFFFFFFFF
_MAX_CHAIN = 1 << 22  # ~4M sectors = 2 GiB at 512B: runaway-chain cap


class CfbError(ValueError):
    """Named refusal: not a CFB container this walk can serve honestly."""


def _sector(data: bytes, n: int, size: int) -> bytes:
    off = size * (n + 1)
    if off + size > len(data):
        raise CfbError(f"sector {n} beyond end of file")
    return data[off : off + size]


def _chain(fat: list[int], start: int, what: str) -> list[int]:
    out = []
    cur = start
    seen = set()
    while cur != _ENDOFCHAIN:
        if cur in (_FREESECT, _FATSECT, _DIFSECT):
            raise CfbError(f"{what} chain hits special sector 0x{cur:08X}")
        if cur >= len(fat):
            raise CfbError(f"{what} chain sector {cur} outside FAT")
        if cur in seen or len(out) > _MAX_CHAIN:
            raise CfbError(f"{what} chain cycle at sector {cur}")
        seen.add(cur)
        out.append(cur)
        cur = fat[cur]
    return out


def list_streams(data: bytes) -> dict[str, bytes]:
    """{'path/to/stream': payload} for every stream in the container.
    Paths join storage names with '/'; the root storage itself is not
    a component."""
    if data[:8] != _MAGIC:
        raise CfbError(f"not a CFB container (magic {data[:8]!r})")
    if len(data) < 512:
        raise CfbError(
            f"truncated CFB header ({len(data)} bytes < 512)")
    (minor, major, order, sshift, mshift) = struct.unpack_from(
        "<HHHHH", data, 24)
    if order != 0xFFFE:
        raise CfbError(f"bad CFB byte-order mark 0x{order:04X}")
    if major not in (3, 4) or sshift not in (9, 12) or mshift != 6:
        raise CfbError(
            f"unsupported CFB version/shape: major {major}, "
            f"sector shift {sshift}, mini shift {mshift}")
    ssize = 1 << sshift
    msize = 1 << mshift
    (n_fat,) = struct.unpack_from("<I", data, 44)
    (first_dir,) = struct.unpack_from("<I", data, 48)
    (cutoff,) = struct.unpack_from("<I", data, 56)
    (first_mfat, n_mfat, first_difat, n_difat) = struct.unpack_from(
        "<IIII", data, 60)

    # FAT sector list: 109 header DIFAT slots + chained DIFAT sectors
    fat_sectors = [
        s for (s,) in struct.iter_unpack("<I", data[76:512])
        if s not in (_FREESECT, _ENDOFCHAIN)
    ]
    cur = first_difat
    hops = 0
    while cur != _ENDOFCHAIN and cur != _FREESECT:
        if hops > n_difat + 16:
            raise CfbError("DIFAT chain cycle")
        hops += 1
        sec = _sector(data, cur, ssize)
        entries = list(struct.unpack(f"<{ssize // 4}I", sec))
        fat_sectors += [s for s in entries[:-1]
                        if s not in (_FREESECT, _ENDOFCHAIN)]
        cur = entries[-1]
    if len(fat_sectors) < n_fat:
        raise CfbError(
            f"header declares {n_fat} FAT sectors, DIFAT lists "
            f"{len(fat_sectors)}")
    fat: list[int] = []
    for s in fat_sectors:
        fat += struct.unpack(f"<{ssize // 4}I", _sector(data, s, ssize))

    def read_chain(start: int, size: int, what: str) -> bytes:
        if size == 0 or start == _ENDOFCHAIN:
            return b""
        out = b"".join(_sector(data, s, ssize)
                       for s in _chain(fat, start, what))
        if len(out) < size:
            raise CfbError(f"{what} chain short: {len(out)} < {size}")
        return out[:size]

    # directory entries
    dir_raw = b"".join(_sector(data, s, ssize)
                       for s in _chain(fat, first_dir, "directory"))
    entries = []
    for off in range(0, len(dir_raw), 128):
        e = dir_raw[off : off + 128]
        if len(e) < 128:
            break
        (nlen,) = struct.unpack_from("<H", e, 64)
        otype = e[66]
        if otype == 0 or nlen < 2:
            entries.append(None)
            continue
        name = e[: min(nlen - 2, 62)].decode("utf-16-le", "replace")
        left, right, child = struct.unpack_from("<III", e, 68)
        (start,) = struct.unpack_from("<I", e, 116)
        (size,) = struct.unpack_from("<Q", e, 120)
        if major == 3:
            size &= 0xFFFFFFFF
        entries.append({"name": name, "type": otype, "left": left,
                        "right": right, "child": child,
                        "start": start, "size": size})
    if not entries or entries[0] is None or entries[0]["type"] != 5:
        raise CfbError("missing CFB root directory entry")

    # mini stream: the root entry's regular-sector chain
    root = entries[0]
    mini_raw = read_chain(root["start"], root["size"], "mini stream")
    mfat: list[int] = []
    if n_mfat and first_mfat != _ENDOFCHAIN:
        for s in _chain(fat, first_mfat, "miniFAT"):
            mfat += struct.unpack(f"<{ssize // 4}I", _sector(data, s, ssize))

    def read_mini(start: int, size: int, what: str) -> bytes:
        if size == 0 or start == _ENDOFCHAIN:
            return b""
        out = bytearray()
        for s in _chain(mfat, start, what):
            off = s * msize
            if off + msize > len(mini_raw):
                raise CfbError(f"{what} mini-sector {s} beyond mini stream")
            out += mini_raw[off : off + msize]
        if len(out) < size:
            raise CfbError(f"{what} mini chain short: {len(out)} < {size}")
        return bytes(out[:size])

    # walk the red-black sibling trees from the root's child
    streams: dict[str, bytes] = {}

    def visit(idx: int, prefix: str, depth: int):
        # Sibling chains walk ITERATIVELY (a degenerate right-linked
        # list — which encode_cfb itself legally writes, and real
        # legacy .doc/.xls with many streams ship — must not hit any
        # recursion/depth limit); a visited set bounded by the entry
        # count guards cycles.  The depth cap applies to STORAGE
        # nesting only.
        if depth > 64:
            raise CfbError("storage nesting exceeds depth cap 64")
        seen: set[int] = set()
        stack = [idx]
        while stack:
            i = stack.pop()
            if i == _NOSTREAM:
                continue
            if i in seen or i >= len(entries) or entries[i] is None:
                raise CfbError(f"bad directory reference {i}")
            seen.add(i)
            e = entries[i]
            stack.append(e["left"])
            stack.append(e["right"])
            path = prefix + e["name"]
            if e["type"] == 2:  # stream
                if e["size"] < cutoff:
                    streams[path] = read_mini(e["start"], e["size"], path)
                else:
                    streams[path] = read_chain(e["start"], e["size"], path)
            elif e["type"] == 1:  # storage
                visit(e["child"], path + "/", depth + 1)
            else:
                raise CfbError(
                    f"unexpected directory object type {e['type']}")

    visit(root["child"], "", 0)
    return streams


def encode_cfb(streams: dict[str, bytes]) -> bytes:
    """Real v3 CFB container for fixtures: 512-byte sectors, header
    DIFAT, one flat directory level (names with '/' become storages),
    miniFAT + mini stream for payloads under 4096 bytes.  Directory
    sibling 'trees' are written as right-linked lists — legal, if
    unbalanced, red-black trees that any conforming reader walks."""
    ssize, msize, cutoff = 512, 64, 4096
    # build directory structure: storages for path prefixes
    names: list[tuple[str, str | None, bytes | None]] = []  # (name, parent, payload)
    storages: dict[str, int] = {}

    def ensure_storage(path: str) -> str:
        if path in storages:
            return path
        parent, _, name = path.rpartition("/")
        if parent:
            ensure_storage(parent)
        storages[path] = len(names)
        names.append((name or path, parent or None, None))
        return path

    for path, payload in streams.items():
        parent, _, name = path.rpartition("/")
        if parent:
            ensure_storage(parent)
        names.append((name or path, parent or None, payload))

    # sector plan: [FAT...][directory...][miniFAT...][ministream...][data...]
    mini_payloads = [(i, p) for i, (_, _, p) in enumerate(names)
                     if p is not None and len(p) < cutoff]
    big_payloads = [(i, p) for i, (_, _, p) in enumerate(names)
                    if p is not None and len(p) >= cutoff]

    mini_stream = bytearray()
    mini_starts: dict[int, int] = {}
    mfat: list[int] = []
    for i, p in mini_payloads:
        if not p:
            mini_starts[i] = _ENDOFCHAIN
            continue
        nsec = (len(p) + msize - 1) // msize
        mini_starts[i] = len(mfat)
        for k in range(nsec - 1):
            mfat.append(len(mfat) + 1)
        mfat.append(_ENDOFCHAIN)
        mini_stream += p + b"\x00" * (nsec * msize - len(p))

    n_entries = len(names) + 1  # + root
    n_dir_sectors = max(1, (n_entries * 128 + ssize - 1) // ssize)
    n_mfat_sectors = (len(mfat) * 4 + ssize - 1) // ssize if mfat else 0
    n_mini_sectors = (len(mini_stream) + ssize - 1) // ssize
    n_data_sectors = sum((len(p) + ssize - 1) // ssize
                         for _, p in big_payloads)
    # FAT sectors: iterate until stable (FAT must also map itself)
    n_fat = 1
    while True:
        total = (n_fat + n_dir_sectors + n_mfat_sectors + n_mini_sectors
                 + n_data_sectors)
        need = (total * 4 + ssize - 1) // ssize
        if need <= n_fat:
            break
        n_fat = need
    if n_fat > 109:
        raise CfbError("fixture CFB too large for header DIFAT")

    fat_base = 0
    dir_base = n_fat
    mfat_base = dir_base + n_dir_sectors
    mini_base = mfat_base + n_mfat_sectors
    data_base = mini_base + n_mini_sectors

    fat: list[int] = []
    for _ in range(n_fat):
        fat.append(_FATSECT)
    for k in range(n_dir_sectors):
        fat.append(dir_base + k + 1 if k < n_dir_sectors - 1
                   else _ENDOFCHAIN)
    for k in range(n_mfat_sectors):
        fat.append(mfat_base + k + 1 if k < n_mfat_sectors - 1
                   else _ENDOFCHAIN)
    for k in range(n_mini_sectors):
        fat.append(mini_base + k + 1 if k < n_mini_sectors - 1
                   else _ENDOFCHAIN)
    data_starts: dict[int, int] = {}
    cur = data_base
    for i, p in big_payloads:
        nsec = (len(p) + ssize - 1) // ssize
        data_starts[i] = cur
        for k in range(nsec - 1):
            fat.append(cur + k + 1)
        fat.append(_ENDOFCHAIN)
        cur += nsec

    def dir_entry(name: str, otype: int, left: int, right: int,
                  child: int, start: int, size: int) -> bytes:
        raw = name.encode("utf-16-le")
        if len(raw) > 62:
            raise CfbError(f"stream name too long: {name!r}")
        e = bytearray(128)
        e[: len(raw)] = raw
        struct.pack_into("<H", e, 64, len(raw) + 2)
        e[66] = otype
        e[67] = 1  # black
        struct.pack_into("<III", e, 68, left, right, child)
        struct.pack_into("<I", e, 116, start)
        struct.pack_into("<Q", e, 120, size)
        return bytes(e)

    # directory ids: 0 = root, then names in order (index i -> id i+1)
    kids: dict[str | None, list[int]] = {}
    for i, (_, parent, _) in enumerate(names):
        kids.setdefault(parent, []).append(i)

    def first_child(parent_key: str | None) -> int:
        lst = kids.get(parent_key, [])
        return lst[0] + 1 if lst else _NOSTREAM

    def right_sibling(parent_key: str | None, i: int) -> int:
        lst = kids.get(parent_key, [])
        k = lst.index(i)
        return lst[k + 1] + 1 if k + 1 < len(lst) else _NOSTREAM

    entries = [dir_entry("Root Entry", 5, _NOSTREAM, _NOSTREAM,
                         first_child(None),
                         mini_base if mini_stream else _ENDOFCHAIN,
                         len(mini_stream))]
    path_of: dict[int, str] = {}
    for i, (name, parent, payload) in enumerate(names):
        path_of[i] = (parent + "/" + name) if parent else name
        if payload is None:
            entries.append(dir_entry(
                name, 1, _NOSTREAM, right_sibling(parent, i),
                first_child(path_of[i]), 0, 0))
        elif len(payload) < cutoff:
            entries.append(dir_entry(
                name, 2, _NOSTREAM, right_sibling(parent, i),
                _NOSTREAM,
                mini_starts[i] if payload else _ENDOFCHAIN,
                len(payload)))
        else:
            entries.append(dir_entry(
                name, 2, _NOSTREAM, right_sibling(parent, i),
                _NOSTREAM, data_starts[i], len(payload)))

    dir_raw = b"".join(entries)
    dir_raw += b"\x00" * (n_dir_sectors * ssize - len(dir_raw))
    # unused directory slots must parse as empty (type 0): zeros do

    header = bytearray(512)
    header[:8] = _MAGIC
    struct.pack_into("<HHHHH", header, 24, 0x3E, 3, 0xFFFE, 9, 6)
    struct.pack_into("<I", header, 44, n_fat)
    struct.pack_into("<I", header, 48, dir_base)
    struct.pack_into("<I", header, 56, cutoff)
    struct.pack_into("<IIII", header, 60,
                     mfat_base if n_mfat_sectors else _ENDOFCHAIN,
                     n_mfat_sectors, _ENDOFCHAIN, 0)
    for k in range(109):
        struct.pack_into("<I", header, 76 + 4 * k,
                         fat_base + k if k < n_fat else _FREESECT)

    total_sectors = data_base + n_data_sectors
    fat += [_FREESECT] * (n_fat * (ssize // 4) - len(fat))
    body = bytearray()
    body += b"".join(struct.pack("<I", v) for v in fat)
    body += dir_raw
    if n_mfat_sectors:
        mf = b"".join(struct.pack("<I", v) for v in mfat)
        mf += b"\xff" * (n_mfat_sectors * ssize - len(mf))
        body += mf
    body += mini_stream + b"\x00" * (n_mini_sectors * ssize
                                     - len(mini_stream))
    for _, p in big_payloads:
        nsec = (len(p) + ssize - 1) // ssize
        body += p + b"\x00" * (nsec * ssize - len(p))
    assert len(body) == total_sectors * ssize
    return bytes(header) + bytes(body)
