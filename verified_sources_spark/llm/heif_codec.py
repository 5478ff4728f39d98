"""HEIF/HEIC/AVIF probe — manifest-first, pure stdlib.

Every iPhone photo is HEIC and AVIF is the web's next image format;
both are ISO-BMFF (the MP4 box grammar, llm/mp4_codec) wrapping
HEVC/AV1 payloads this engine honestly refuses to pixel-decode.  Like
web video (llm/mp4_codec, llm/webm_codec), the right 100 TB posture
is manifest-first: ``probe`` walks ftyp → meta (a FULL box) → pitm /
iinf(infe) / iprp(ipco(ispe) + ipma) and reports the PRIMARY item's
codec and pixel dimensions by following the ipma property
associations — real facts for dedup manifests, typed refusal for
pixels.  ``encode_stub`` writes structurally real fixtures (primary +
thumbnail items with distinct ispe properties, so a probe that
ignored ipma and grabbed the first/largest ispe would fail the hash
gate).  Reference analogue: mux's asset metadata posture
(/root/reference/sources/mux/__init__.py:15-28).
"""

from __future__ import annotations

import struct

from verified_sources_spark.llm.mp4_codec import Mp4Error, _boxes, _fullbox

__all__ = ["HeifError", "probe", "encode_stub", "HEIF_BRANDS"]

HEIF_BRANDS = (b"heic", b"heix", b"hevc", b"mif1", b"msf1",
               b"avif", b"avis")


class HeifError(ValueError):
    """Named refusal: not a HEIF container this probe can serve."""


def _children(data: bytes, start: int, end: int) -> dict:
    out = {}
    try:
        for fourcc, b, e in _boxes(data, start, end):
            out.setdefault(fourcc, []).append((b, e))
    except Mp4Error as exc:
        raise HeifError(str(exc)) from None
    return out


def probe(data: bytes) -> dict:
    """{brand, codec, width, height, n_items} for the PRIMARY item."""
    try:
        return _probe(data)
    except (struct.error, IndexError) as e:
        raise HeifError(f"malformed HEIF box body: {e}") from None


def _probe(data: bytes) -> dict:
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise HeifError("not an ISO-BMFF payload (no ftyp)")
    brand = data[8:12]
    if brand not in HEIF_BRANDS:
        raise HeifError(
            f"ftyp brand {brand!r} is not a HEIF/AVIF image brand")
    top = _children(data, 0, len(data))
    if b"meta" not in top:
        raise HeifError("HEIF without a meta box")
    mb, me = top[b"meta"][0]
    try:
        _, pos = _fullbox(data, mb, me, "meta")
    except Mp4Error as exc:
        raise HeifError(str(exc)) from None
    meta = _children(data, pos, me)

    # primary item id
    if b"pitm" not in meta:
        raise HeifError("HEIF meta without pitm (no primary item)")
    pb, pe = meta[b"pitm"][0]
    ver, p = _fullbox(data, pb, pe, "pitm")
    primary = (struct.unpack_from(">H", data, p)[0] if ver == 0
               else struct.unpack_from(">I", data, p)[0])

    # item types from iinf/infe
    item_type: dict[int, str] = {}
    if b"iinf" in meta:
        ib, ie = meta[b"iinf"][0]
        ver, p = _fullbox(data, ib, ie, "iinf")
        n = (struct.unpack_from(">H", data, p)[0] if ver == 0
             else struct.unpack_from(">I", data, p)[0])
        p += 2 if ver == 0 else 4
        for fourcc, b, e in _boxes(data, p, ie):
            if fourcc != b"infe":
                continue
            iver, q = _fullbox(data, b, e, "infe")
            if iver >= 2:
                iid = (struct.unpack_from(">H", data, q)[0] if iver == 2
                       else struct.unpack_from(">I", data, q)[0])
                q += (2 if iver == 2 else 4) + 2  # + protection index
                item_type[iid] = data[q : q + 4].decode("latin-1")
        if len(item_type) > n:
            raise HeifError("iinf count disagrees with infe boxes")

    # properties: ipco order matters (1-based indices), ipma associates
    if b"iprp" not in meta:
        raise HeifError("HEIF meta without iprp (no item properties)")
    rb, re_ = meta[b"iprp"][0]
    iprp = _children(data, rb, re_)
    if b"ipco" not in iprp:
        raise HeifError("iprp without ipco")
    cb, ce = iprp[b"ipco"][0]
    props: list[tuple[bytes, int, int]] = []
    for fourcc, b, e in _boxes(data, cb, ce):
        props.append((fourcc, b, e))

    # ipma: item id -> 1-based property indices
    assoc: dict[int, list[int]] = {}
    if b"ipma" in iprp:
        ab, ae = iprp[b"ipma"][0]
        ver, p = _fullbox(data, ab, ae, "ipma")
        # version AND flags both matter for ipma field widths
        vf = struct.unpack_from(">I", data, ab + 8)[0]
        ver, flags = vf >> 24, vf & 0xFFFFFF
        n = struct.unpack_from(">I", data, p)[0]
        p += 4
        for _ in range(n):
            if ver == 0:
                iid = struct.unpack_from(">H", data, p)[0]
                p += 2
            else:
                iid = struct.unpack_from(">I", data, p)[0]
                p += 4
            cnt = data[p]
            p += 1
            idxs = []
            for _ in range(cnt):
                if flags & 1:
                    v = struct.unpack_from(">H", data, p)[0]
                    idxs.append(v & 0x7FFF)
                    p += 2
                else:
                    idxs.append(data[p] & 0x7F)
                    p += 1
            assoc[iid] = idxs

    def ispe_of(item: int) -> tuple[int, int] | None:
        for idx in assoc.get(item, []):
            if 1 <= idx <= len(props) and props[idx - 1][0] == b"ispe":
                _, b, e = props[idx - 1]
                _, q = _fullbox(data, b, e, "ispe")
                w, h = struct.unpack_from(">II", data, q)
                return w, h
        return None

    dims = ispe_of(primary)
    if dims is None:
        # no ipma (legal in old files): fall back to the largest ispe
        best = None
        for fourcc, b, e in props:
            if fourcc == b"ispe":
                _, q = _fullbox(data, b, e, "ispe")
                w, h = struct.unpack_from(">II", data, q)
                if best is None or w * h > best[0] * best[1]:
                    best = (w, h)
        dims = best
    if dims is None:
        raise HeifError("HEIF without any ispe property (no dimensions)")
    return {
        "format": "heif",
        "brand": brand.decode("latin-1"),
        "codec": item_type.get(primary),
        "width": dims[0],
        "height": dims[1],
        "n_items": max(len(item_type), 1),
    }


def _box(fourcc: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + fourcc + body


def _full(fourcc: bytes, ver: int, flags: int, body: bytes) -> bytes:
    return _box(fourcc, struct.pack(">I", (ver << 24) | flags) + body)


def encode_stub(width: int, height: int, codec: bytes = b"hvc1",
                brand: bytes = b"heic", thumb: bool = True) -> bytes:
    """Structurally real HEIF fixture: primary item (id 1) + optional
    half-size thumbnail item (id 2, listed FIRST in ipco so a probe
    that ignores ipma grabs the wrong dims), infe types, opaque mdat."""
    infes = [_full(b"infe", 2, 0,
                   struct.pack(">HH", 1, 0) + codec + b"\x00")]
    if thumb:
        infes.append(_full(b"infe", 2, 0,
                           struct.pack(">HH", 2, 0) + codec + b"\x00"))
    iinf = _full(b"iinf", 0, 0,
                 struct.pack(">H", len(infes)) + b"".join(infes))
    ispe_primary = _full(b"ispe", 0, 0, struct.pack(">II", width, height))
    props = []
    if thumb:
        props.append(_full(b"ispe", 0, 0,
                           struct.pack(">II", max(width // 2, 1),
                                       max(height // 2, 1))))
    props.append(ispe_primary)
    primary_idx = len(props)  # 1-based
    ipco = _box(b"ipco", b"".join(props))
    ents = [struct.pack(">HB", 1, 1) + bytes([primary_idx])]
    if thumb:
        ents.append(struct.pack(">HB", 2, 1) + bytes([1]))
    ipma = _full(b"ipma", 0, 0,
                 struct.pack(">I", len(ents)) + b"".join(ents))
    iprp = _box(b"iprp", ipco + ipma)
    pitm = _full(b"pitm", 0, 0, struct.pack(">H", 1))
    meta = _full(b"meta", 0, 0,
                 _full(b"hdlr", 0, 0,
                       b"\x00\x00\x00\x00pict\x00" * 1
                       + bytes(11))
                 + pitm + iinf + iprp)
    ftyp = _box(b"ftyp", brand + struct.pack(">I", 0) + brand + b"mif1")
    mdat = _box(b"mdat", b"\x00" * 64)  # opaque coded payload stub
    return ftyp + meta + mdat
