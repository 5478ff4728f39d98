"""Pure-stdlib AVI codec for uncompressed-RGB video assets.

Completes the multimodal always-on decode triangle (png_codec.py for
images, wav_codec.py for audio): AVI is RIFF — the same container
family as WAV — with a ``hdrl`` header list (avih main header + one
``strl`` per stream) and a ``movi`` list of per-frame chunks.  This
module parses that structure with struct alone and decodes
**BI_RGB 24-bit DIB frames** (bottom-up BGR rows, 4-byte-aligned) to
top-down RGB bytes — the uncompressed interchange layout capture and
intermediate pipelines emit.  Compressed fourccs (MJPG, H264, …)
REFUSE loudly with the codec name rather than mis-decoding — the same
honest-refusal contract as the table-format readers; at 100 TB an
asset inventory must distinguish "not decodable here" from "broken".

``probe`` is header-only (no frame materialization) for manifest
building; ``decode_frame`` materializes exactly one frame so time-based
sampling touches only the frames it keeps — on a 2-hour clip a
1-frame-per-second sample decodes 0.03% of the payload.

The reference has no video operators — this is part of the engine's
LLM-pipeline surface beyond reference parity (SURVEY.md multimodal
row)."""

from __future__ import annotations

import struct

__all__ = ["AviError", "probe", "decode_frame", "frame_indices_every_ms", "encode"]


class AviError(ValueError):
    pass


def _chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, list_type_or_None, body_start, body_size) over a
    RIFF chunk run; LIST chunks report their list type and their body
    EXCLUDES the 4-byte type tag."""
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body_start = pos + 8
        if body_start + size > end:
            raise AviError(f"truncated {cid!r} chunk: {end - body_start} < {size}")
        if cid == b"LIST":
            if size < 4:
                raise AviError("LIST chunk too short for a type tag")
            yield cid, data[body_start : body_start + 4], body_start + 4, size - 4
        else:
            yield cid, None, body_start, size
        pos = body_start + size + (size & 1)


def probe(data: bytes) -> dict:
    """Header-only metadata: width, height, n_frames, fps, codec
    fourcc, bit depth, duration_ms, and the movi frame offsets (so
    ``decode_frame`` seeks straight to frame k).  No pixel
    materialization."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise AviError("not a RIFF/AVI payload")
    avih = None
    strh = None
    strf = None
    frame_offsets: list[tuple[int, int]] = []
    for cid, ltype, start, size in _chunks(data, 12, len(data)):
        if cid == b"LIST" and ltype == b"hdrl":
            for c2, l2, s2, z2 in _chunks(data, start, start + size):
                if c2 == b"avih":
                    if z2 < 40:
                        raise AviError("avih header too short")
                    avih = struct.unpack_from("<10I", data, s2)
                elif c2 == b"LIST" and l2 == b"strl" and strh is None:
                    for c3, _l3, s3, z3 in _chunks(data, s2, s2 + z2):
                        if c3 == b"strh" and z3 >= 48:
                            fcc_type = data[s3 : s3 + 4]
                            if fcc_type != b"vids":
                                strh = None
                                break
                            strh = {
                                "handler": data[s3 + 4 : s3 + 8],
                                "scale": struct.unpack_from("<I", data, s3 + 20)[0],
                                "rate": struct.unpack_from("<I", data, s3 + 24)[0],
                                "length": struct.unpack_from("<I", data, s3 + 32)[0],
                            }
                        elif c3 == b"strf" and strh is not None and z3 >= 40:
                            (
                                _bisize, w, h, _planes, bits, compression
                            ) = struct.unpack_from("<IiiHHI", data, s3)
                            strf = {
                                "width": w,
                                "height": h,
                                "bits": bits,
                                "compression": compression,
                            }
        elif cid == b"LIST" and ltype == b"movi":
            for c2, _l2, s2, z2 in _chunks(data, start, start + size):
                # 00db = uncompressed DIB, 00dc = compressed frame data
                if c2[2:4] in (b"db", b"dc"):
                    frame_offsets.append((s2, z2))
    if avih is None or strh is None or strf is None:
        raise AviError("missing avih/strh(vids)/strf header")
    fps = (strh["rate"] / strh["scale"]) if strh["scale"] else 0.0
    n_frames = len(frame_offsets) or strh["length"]
    comp = strf["compression"]
    codec = "BI_RGB" if comp == 0 else struct.pack("<I", comp).decode(
        "ascii", errors="replace"
    )
    return {
        "width": strf["width"],
        "height": abs(strf["height"]),
        "bottom_up": strf["height"] > 0,
        "bits": strf["bits"],
        "codec": codec,
        "fps": fps,
        "n_frames": n_frames,
        "duration_ms": int(n_frames * 1000 / fps) if fps else 0,
        "frame_offsets": frame_offsets,
    }


def decode_frame(data: bytes, meta: dict, index: int) -> bytes:
    """Top-down RGB bytes (h*w*3) for frame ``index``.  BI_RGB 24-bit
    decodes natively; MJPG frames (each chunk a standalone JPEG, with
    the OpenDML omit-DHT convention handled by llm/jpeg_codec) decode
    through the baseline JPEG path; any other fourcc refuses with its
    name."""
    if not 0 <= index < len(meta["frame_offsets"]):
        raise AviError(f"frame index {index} out of range")
    if meta["codec"] == "MJPG":
        from verified_sources_spark.llm.jpeg_codec import JpegError, decode

        start, size = meta["frame_offsets"][index]
        try:
            im = decode(data[start : start + size])
        except JpegError as e:
            raise AviError(f"MJPG frame {index}: {e}") from e
        if (im["width"], im["height"]) != (meta["width"], meta["height"]):
            raise AviError(
                f"MJPG frame {index} is {im['width']}x{im['height']}, "
                f"header says {meta['width']}x{meta['height']}"
            )
        return im["pixels"]
    if meta["codec"] != "BI_RGB" or meta["bits"] != 24:
        raise AviError(
            f"cannot decode codec={meta['codec']!r} bits={meta['bits']} "
            "(only uncompressed BI_RGB 24-bit or MJPG)"
        )
    start, size = meta["frame_offsets"][index]
    w, h = meta["width"], meta["height"]
    stride = (w * 3 + 3) & ~3  # DIB rows pad to 4-byte boundaries
    if size < stride * h:
        raise AviError(f"frame {index} short: {size} < {stride * h}")
    import numpy as np

    rows = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=start)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if meta["bottom_up"]:
        rows = rows[::-1]
    return rows[:, :, ::-1].tobytes()  # BGR -> RGB


def frame_indices_every_ms(meta: dict, every_ms: int) -> list[tuple[int, int]]:
    """(frame_index, ts_ms) pairs sampling one frame per ``every_ms``
    window — pure arithmetic on the probe, no decoding."""
    if every_ms <= 0:
        raise AviError("every_ms must be positive")
    fps, n = meta["fps"], len(meta["frame_offsets"])
    if not fps or n == 0:
        return []
    out = []
    seen = set()
    t = 0
    dur = meta["duration_ms"]
    while t <= dur:
        idx = min(int(t * fps / 1000), n - 1)
        if idx not in seen:
            seen.add(idx)
            out.append((idx, t))
        t += every_ms
    return out


def encode(
    frames, fps: float, width: int, height: int, codec: str = "BI_RGB",
    quality: int = 90,
) -> bytes:
    """Minimal spec-shaped AVI from top-down RGB frames (each ``bytes``
    of h*w*3, or numpy (h, w, 3) uint8).  ``codec='BI_RGB'`` writes
    uncompressed DIB frames; ``codec='MJPG'`` writes one baseline JPEG
    per frame chunk (llm/jpeg_codec at the given quality).
    Deterministic: the fixture generator for tests and graded probes."""
    import numpy as np

    if codec not in ("BI_RGB", "MJPG"):
        raise AviError(f"encode supports BI_RGB or MJPG, not {codec!r}")
    stride = (width * 3 + 3) & ~3
    blobs = []
    for f in frames:
        arr = np.frombuffer(f, dtype=np.uint8) if isinstance(
            f, (bytes, bytearray)
        ) else np.asarray(f, dtype=np.uint8).ravel()
        if arr.shape[0] != width * height * 3:
            raise AviError("frame size does not match width*height*3")
        rgb = arr.reshape(height, width, 3)
        if codec == "MJPG":
            from verified_sources_spark.llm.jpeg_codec import encode as jenc

            blobs.append(jenc(width, height, rgb.tobytes(), quality=quality))
            continue
        bgr = rgb[::-1, :, ::-1]  # bottom-up BGR
        padded = np.zeros((height, stride), dtype=np.uint8)
        padded[:, : width * 3] = bgr.reshape(height, width * 3)
        blobs.append(padded.tobytes())

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) % 2 else b""
        )

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    scale, rate = 1000, int(round(fps * 1000))
    usec = int(1_000_000 / fps) if fps else 0
    avih = struct.pack(
        "<10I", usec, 0, 0, 0, len(blobs), 0, 1, 0, width, height
    ) + b"\x00" * 16
    handler = b"DIB " if codec == "BI_RGB" else b"MJPG"
    compression = 0 if codec == "BI_RGB" else struct.unpack("<I", b"MJPG")[0]
    cid = b"00db" if codec == "BI_RGB" else b"00dc"
    strh = (
        b"vids" + handler + struct.pack("<IHHI", 0, 0, 0, 0)
        + struct.pack("<6I", scale, rate, 0, len(blobs), 0, 0xFFFFFFFF)
        + struct.pack("<I", 0) + struct.pack("<4h", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, compression,
        stride * height, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(cid, b) for b in blobs))
    return chunk(b"RIFF", b"AVI " + hdrl + movi)
