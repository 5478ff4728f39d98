"""Capability-gated ctypes seam over the SYSTEM libzstd.

Modern LLM training corpora overwhelmingly ship zstd-compressed —
``.jsonl.zst`` shards (The Pile, RedPajama, most HuggingFace dumps)
and ``.tar.zst`` bundles — and Python 3.11's stdlib has no zstd
codec, so without this seam every such payload refuses.  Like the
libwebp seam (llm/webp_system), this binds the battle-tested system
library via plain ctypes (no pip dependency) and degrades to the
named refusal when absent:

- ``available()`` / ``zstd_version()`` — capability probe.
- ``decompress(data, max_out)`` — one zstd frame sequence → bytes.
  Known-content-size frames decode in one call; unknown-size frames
  (the streaming-writer default: ``zstd`` CLI without --content-size,
  most jsonl shard writers) walk ``ZSTD_decompressStream``.  The
  ``max_out`` cap is the decompression-bomb gate: a frame that
  expands past it refuses loudly (same posture as the archive
  member cap — at 100 TB someone WILL feed the pipeline a bomb).
- ``compress(data, level)`` — fixture/ingest-side encoder, giving
  tests a genuinely independent compressor for the decode path.

Reference analogue: the filesystem source reads compressed dumps via
fsspec's transparent codecs (/root/reference/sources/filesystem);
this seam is the same capability for zstd payload columns.
"""

from __future__ import annotations

import ctypes
import ctypes.util

__all__ = ["available", "zstd_version", "compress", "decompress",
           "ZstdError", "ZSTD_MAGIC"]

ZSTD_MAGIC = b"\x28\xb5\x2f\xfd"

_CONTENTSIZE_UNKNOWN = (1 << 64) - 1
_CONTENTSIZE_ERROR = (1 << 64) - 2


class ZstdError(ValueError):
    """Named refusal: not a zstd stream this seam can serve honestly."""


class _InBuffer(ctypes.Structure):
    _fields_ = [("src", ctypes.c_void_p), ("size", ctypes.c_size_t),
                ("pos", ctypes.c_size_t)]


class _OutBuffer(ctypes.Structure):
    _fields_ = [("dst", ctypes.c_void_p), ("size", ctypes.c_size_t),
                ("pos", ctypes.c_size_t)]


_lib: ctypes.CDLL | None | bool = None


def _load():
    global _lib
    if _lib is None:
        name = ctypes.util.find_library("zstd") or "libzstd.so.1"
        try:
            lib = ctypes.CDLL(name)
            lib.ZSTD_versionNumber.restype = ctypes.c_uint
            lib.ZSTD_isError.restype = ctypes.c_uint
            lib.ZSTD_isError.argtypes = [ctypes.c_size_t]
            lib.ZSTD_getErrorName.restype = ctypes.c_char_p
            lib.ZSTD_getErrorName.argtypes = [ctypes.c_size_t]
            lib.ZSTD_compressBound.restype = ctypes.c_size_t
            lib.ZSTD_compressBound.argtypes = [ctypes.c_size_t]
            lib.ZSTD_compress.restype = ctypes.c_size_t
            lib.ZSTD_compress.argtypes = [
                ctypes.c_void_p, ctypes.c_size_t,
                ctypes.c_void_p, ctypes.c_size_t, ctypes.c_int]
            lib.ZSTD_getFrameContentSize.restype = ctypes.c_ulonglong
            lib.ZSTD_getFrameContentSize.argtypes = [
                ctypes.c_void_p, ctypes.c_size_t]
            lib.ZSTD_decompress.restype = ctypes.c_size_t
            lib.ZSTD_decompress.argtypes = [
                ctypes.c_void_p, ctypes.c_size_t,
                ctypes.c_void_p, ctypes.c_size_t]
            lib.ZSTD_createDCtx.restype = ctypes.c_void_p
            lib.ZSTD_freeDCtx.argtypes = [ctypes.c_void_p]
            lib.ZSTD_decompressStream.restype = ctypes.c_size_t
            lib.ZSTD_decompressStream.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(_OutBuffer),
                ctypes.POINTER(_InBuffer)]
            lib.ZSTD_createCCtx.restype = ctypes.c_void_p
            lib.ZSTD_freeCCtx.argtypes = [ctypes.c_void_p]
            lib.ZSTD_CCtx_setParameter.restype = ctypes.c_size_t
            lib.ZSTD_CCtx_setParameter.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
            lib.ZSTD_compressStream2.restype = ctypes.c_size_t
            lib.ZSTD_compressStream2.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(_OutBuffer),
                ctypes.POINTER(_InBuffer), ctypes.c_int]
            _lib = lib
        except (OSError, AttributeError):
            _lib = False
    return _lib if _lib else None


def available() -> bool:
    """True when a system libzstd with the needed entry points loaded."""
    return _load() is not None


def zstd_version() -> str | None:
    lib = _load()
    if lib is None:
        return None
    v = lib.ZSTD_versionNumber()
    return f"{v // 10000}.{(v // 100) % 100}.{v % 100}"


def _check(lib, code: int, what: str) -> int:
    if lib.ZSTD_isError(code):
        name = lib.ZSTD_getErrorName(code).decode("ascii", "replace")
        raise ZstdError(f"{what}: {name}")
    return code


def compress(data: bytes, level: int = 3,
             content_size: bool = True) -> bytes:
    """One zstd frame.  ``content_size=True`` (the ZSTD_compress
    default) stamps the decompressed size in the frame header;
    fixtures exercise the unknown-size streaming path by recompressing
    through a DCtx-less writer is not possible here, so tests strip
    the header bit via the streaming decode of CLI-style frames
    instead."""
    lib = _load()
    if lib is None:
        raise ZstdError("system libzstd not present — refusing by name")
    bound = lib.ZSTD_compressBound(len(data))
    out = ctypes.create_string_buffer(bound)
    n = _check(lib, lib.ZSTD_compress(out, bound, data, len(data),
                                      int(level)), "zstd compress")
    return out.raw[:n]


def compress_streamed(data: bytes, level: int = 3) -> bytes:
    """One zstd frame WITHOUT a content-size header — what streaming
    writers (the zstd CLI on a pipe, most jsonl shard writers) emit.
    Exists so fixtures exercise the unknown-size decode path."""
    lib = _load()
    if lib is None:
        raise ZstdError("system libzstd not present — refusing by name")
    cctx = lib.ZSTD_createCCtx()
    if not cctx:
        raise ZstdError("ZSTD_createCCtx failed")
    try:
        # ZSTD_c_compressionLevel = 100, ZSTD_c_contentSizeFlag = 200
        _check(lib, lib.ZSTD_CCtx_setParameter(cctx, 100, int(level)),
               "set level")
        _check(lib, lib.ZSTD_CCtx_setParameter(cctx, 200, 0),
               "unset content-size flag")
        src = ctypes.create_string_buffer(data, len(data))
        inbuf = _InBuffer(ctypes.cast(src, ctypes.c_void_p), len(data), 0)
        chunk = 1 << 17
        outchunk = ctypes.create_string_buffer(chunk)
        parts: list[bytes] = []
        while True:
            outbuf = _OutBuffer(
                ctypes.cast(outchunk, ctypes.c_void_p), chunk, 0)
            remaining = _check(lib, lib.ZSTD_compressStream2(
                cctx, ctypes.byref(outbuf), ctypes.byref(inbuf), 2),
                "zstd stream encode")  # 2 = ZSTD_e_end
            if outbuf.pos:
                parts.append(outchunk.raw[:outbuf.pos])
            if remaining == 0 and inbuf.pos == inbuf.size:
                return b"".join(parts)
    finally:
        lib.ZSTD_freeCCtx(cctx)


def decompress(data: bytes, max_out: int = 1 << 30) -> bytes:
    """Decode a zstd frame sequence to bytes, bomb-gated at
    ``max_out`` decompressed bytes."""
    lib = _load()
    if lib is None:
        raise ZstdError("system libzstd not present — refusing by name")
    if data[:4] != ZSTD_MAGIC:
        raise ZstdError(
            f"not a zstd frame (magic {data[:4]!r}) — refusing by name")
    size = lib.ZSTD_getFrameContentSize(data, len(data))
    if size == _CONTENTSIZE_ERROR:
        raise ZstdError("corrupt zstd frame header")
    if size != _CONTENTSIZE_UNKNOWN and len(data) >= 18:
        # single known-size frame fast path — but only when no second
        # frame follows; a multi-frame sequence must stream
        if size > max_out:
            raise ZstdError(
                f"zstd frame declares {size} bytes > cap {max_out} "
                f"— decompression-bomb gate")
        out = ctypes.create_string_buffer(int(size) or 1)
        n = lib.ZSTD_decompress(out, int(size), data, len(data))
        if not lib.ZSTD_isError(n):
            return out.raw[:int(n)]
        # fall through to streaming (multi-frame sequences land here)
    dctx = lib.ZSTD_createDCtx()
    if not dctx:
        raise ZstdError("ZSTD_createDCtx failed")
    try:
        src = ctypes.create_string_buffer(data, len(data))
        inbuf = _InBuffer(ctypes.cast(src, ctypes.c_void_p), len(data), 0)
        chunk = 1 << 17
        outchunk = ctypes.create_string_buffer(chunk)
        parts: list[bytes] = []
        total = 0
        hint = 0
        while inbuf.pos < inbuf.size:
            outbuf = _OutBuffer(
                ctypes.cast(outchunk, ctypes.c_void_p), chunk, 0)
            hint = _check(lib, lib.ZSTD_decompressStream(
                dctx, ctypes.byref(outbuf), ctypes.byref(inbuf)),
                "zstd stream decode")
            if outbuf.pos:
                total += outbuf.pos
                if total > max_out:
                    raise ZstdError(
                        f"zstd stream expands past cap {max_out} "
                        f"— decompression-bomb gate")
                parts.append(outchunk.raw[:outbuf.pos])
            elif inbuf.pos < inbuf.size:
                raise ZstdError("zstd stream stalled (truncated frame)")
        if hint != 0:
            # nonzero frame-progress hint after the input drained =
            # the frame is incomplete — refusing beats silent-truncate
            raise ZstdError("truncated zstd frame (input ended mid-frame)")
        return b"".join(parts)
    finally:
        lib.ZSTD_freeDCtx(dctx)
