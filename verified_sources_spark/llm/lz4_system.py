"""Capability-gated ctypes seam over the SYSTEM liblz4 (frame format).

``.jsonl.lz4`` shards show up in data-pipeline dumps (Kafka archive
sinks, some dataset mirrors) and Python has no stdlib codec.  Same
contract as the libzstd/libbrotli seams: ``available()`` probe,
streaming ``decompress`` with an expansion cap and explicit
truncation detection, one-shot ``compress`` (LZ4F_compressFrame) as
the independent fixture encoder.  Frame magic: 04 22 4D 18.
"""

from __future__ import annotations

import ctypes
import ctypes.util

__all__ = ["available", "compress", "decompress", "Lz4Error",
           "LZ4_MAGIC"]

LZ4_MAGIC = b"\x04\x22\x4d\x18"
_LZ4F_VERSION = 100


class Lz4Error(ValueError):
    """Named refusal: not an lz4 frame this seam can serve honestly."""


_lib: ctypes.CDLL | None | bool = None


def _load():
    global _lib
    if _lib is None:
        name = ctypes.util.find_library("lz4") or "liblz4.so.1"
        try:
            lib = ctypes.CDLL(name)
            lib.LZ4F_isError.restype = ctypes.c_uint
            lib.LZ4F_isError.argtypes = [ctypes.c_size_t]
            lib.LZ4F_getErrorName.restype = ctypes.c_char_p
            lib.LZ4F_getErrorName.argtypes = [ctypes.c_size_t]
            lib.LZ4F_compressFrameBound.restype = ctypes.c_size_t
            lib.LZ4F_compressFrameBound.argtypes = [
                ctypes.c_size_t, ctypes.c_void_p]
            lib.LZ4F_compressFrame.restype = ctypes.c_size_t
            lib.LZ4F_compressFrame.argtypes = [
                ctypes.c_void_p, ctypes.c_size_t,
                ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p]
            lib.LZ4F_createDecompressionContext.restype = ctypes.c_size_t
            lib.LZ4F_createDecompressionContext.argtypes = [
                ctypes.POINTER(ctypes.c_void_p), ctypes.c_uint]
            lib.LZ4F_freeDecompressionContext.argtypes = [ctypes.c_void_p]
            lib.LZ4F_decompress.restype = ctypes.c_size_t
            lib.LZ4F_decompress.argtypes = [
                ctypes.c_void_p,
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_size_t),
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_size_t),
                ctypes.c_void_p]
            _lib = lib
        except (OSError, AttributeError):
            _lib = False
    return _lib if _lib else None


def available() -> bool:
    return _load() is not None


def compress(data: bytes) -> bytes:
    lib = _load()
    if lib is None:
        raise Lz4Error("system liblz4 not present — refusing by name")
    bound = lib.LZ4F_compressFrameBound(len(data), None)
    out = ctypes.create_string_buffer(bound)
    n = lib.LZ4F_compressFrame(out, bound, data, len(data), None)
    if lib.LZ4F_isError(n):
        raise Lz4Error(
            f"lz4 compress: "
            f"{lib.LZ4F_getErrorName(n).decode('ascii', 'replace')}")
    return out.raw[:n]


def decompress(data: bytes, max_out: int = 1 << 30) -> bytes:
    """Decode an lz4 frame sequence, bomb-gated at ``max_out``."""
    lib = _load()
    if lib is None:
        raise Lz4Error("system liblz4 not present — refusing by name")
    if data[:4] != LZ4_MAGIC:
        raise Lz4Error(
            f"not an lz4 frame (magic {data[:4]!r}) — refusing by name")
    ctx = ctypes.c_void_p()
    code = lib.LZ4F_createDecompressionContext(
        ctypes.byref(ctx), _LZ4F_VERSION)
    if lib.LZ4F_isError(code):
        raise Lz4Error("LZ4F_createDecompressionContext failed")
    try:
        src = ctypes.create_string_buffer(data, len(data))
        chunk = 1 << 17
        outbuf = ctypes.create_string_buffer(chunk)
        parts: list[bytes] = []
        total = 0
        src_pos = 0
        hint = 0
        while src_pos < len(data):
            dst_size = ctypes.c_size_t(chunk)
            src_size = ctypes.c_size_t(len(data) - src_pos)
            hint = lib.LZ4F_decompress(
                ctx, outbuf, ctypes.byref(dst_size),
                ctypes.byref(src, src_pos), ctypes.byref(src_size), None)
            if lib.LZ4F_isError(hint):
                raise Lz4Error(
                    f"corrupt lz4 frame: "
                    f"{lib.LZ4F_getErrorName(hint).decode('ascii', 'replace')}")
            if dst_size.value:
                total += dst_size.value
                if total > max_out:
                    raise Lz4Error(
                        f"lz4 stream expands past cap {max_out} "
                        f"— decompression-bomb gate")
                parts.append(outbuf.raw[: dst_size.value])
            if src_size.value == 0 and dst_size.value == 0:
                raise Lz4Error("lz4 stream stalled (truncated frame)")
            src_pos += src_size.value
        if hint != 0:
            raise Lz4Error("truncated lz4 frame (input ended mid-frame)")
        return b"".join(parts)
    finally:
        lib.LZ4F_freeDecompressionContext(ctx)
