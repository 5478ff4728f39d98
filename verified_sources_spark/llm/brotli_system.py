"""Capability-gated ctypes seam over the SYSTEM libbrotlidec/enc.

``Content-Encoding: br`` is the most common non-gzip coding on the
modern web (every major CDN serves it), so a Common-Crawl-shaped WARC
front door that refuses it drops a large share of pages.  Python 3.11
has no stdlib brotli codec; like the libwebp and libzstd seams this
binds the system library via plain ctypes and degrades to the named
refusal when absent.

- ``available()`` / ``brotli_version()`` — capability probe.
- ``decompress(data, max_out)`` — streaming
  ``BrotliDecoderDecompressStream`` walk with an expansion cap (the
  decompression-bomb gate) and explicit truncation detection (a
  stream still wanting input when the buffer ends refuses instead of
  silently returning a prefix).
- ``compress(data, quality)`` — one-shot ``BrotliEncoderCompress``
  for fixtures: a genuinely independent encoder for the decode path.

NOTE brotli streams carry NO magic bytes — they cannot be sniffed,
only declared (HTTP Content-Encoding, file extension).  That is why
the shard-codec sniffer (llm/archives.sniff_shard_codec) does not
route to this seam; the WARC HTTP layer, where the coding is declared
in-band, does.
"""

from __future__ import annotations

import ctypes
import ctypes.util

__all__ = ["available", "brotli_version", "compress", "decompress",
           "BrotliError"]


class BrotliError(ValueError):
    """Named refusal: not a brotli stream this seam can serve honestly."""


_dec: ctypes.CDLL | None | bool = None
_enc: ctypes.CDLL | None | bool = None


def _load_dec():
    global _dec
    if _dec is None:
        name = ctypes.util.find_library("brotlidec") or "libbrotlidec.so.1"
        try:
            lib = ctypes.CDLL(name)
            lib.BrotliDecoderCreateInstance.restype = ctypes.c_void_p
            lib.BrotliDecoderCreateInstance.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
            lib.BrotliDecoderDestroyInstance.argtypes = [ctypes.c_void_p]
            lib.BrotliDecoderDecompressStream.restype = ctypes.c_int
            lib.BrotliDecoderDecompressStream.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_size_t),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
                ctypes.POINTER(ctypes.c_size_t),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
                ctypes.POINTER(ctypes.c_size_t)]
            lib.BrotliDecoderVersion.restype = ctypes.c_uint32
            _dec = lib
        except (OSError, AttributeError):
            _dec = False
    return _dec if _dec else None


def _load_enc():
    global _enc
    if _enc is None:
        name = ctypes.util.find_library("brotlienc") or "libbrotlienc.so.1"
        try:
            lib = ctypes.CDLL(name)
            lib.BrotliEncoderMaxCompressedSize.restype = ctypes.c_size_t
            lib.BrotliEncoderMaxCompressedSize.argtypes = [ctypes.c_size_t]
            lib.BrotliEncoderCompress.restype = ctypes.c_int
            lib.BrotliEncoderCompress.argtypes = [
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_size_t, ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_size_t), ctypes.c_char_p]
            _enc = lib
        except (OSError, AttributeError):
            _enc = False
    return _enc if _enc else None


def available() -> bool:
    """True when BOTH decoder and encoder system libraries loaded."""
    return _load_dec() is not None and _load_enc() is not None


def brotli_version() -> str | None:
    lib = _load_dec()
    if lib is None:
        return None
    v = lib.BrotliDecoderVersion()
    return f"{v >> 24}.{(v >> 12) & 0xFFF}.{v & 0xFFF}"


def compress(data: bytes, quality: int = 5) -> bytes:
    """One brotli stream (generic mode, default window)."""
    lib = _load_enc()
    if lib is None:
        raise BrotliError(
            "system libbrotlienc not present — refusing by name")
    bound = lib.BrotliEncoderMaxCompressedSize(len(data)) or (
        len(data) + 1024)
    out = ctypes.create_string_buffer(bound)
    out_len = ctypes.c_size_t(bound)
    ok = lib.BrotliEncoderCompress(
        int(quality), 22, 0, len(data), data, ctypes.byref(out_len), out)
    if not ok:
        raise BrotliError("brotli compress failed")
    return out.raw[: out_len.value]


# BrotliDecoderResult enum
_RESULT_ERROR = 0
_RESULT_SUCCESS = 1
_RESULT_NEEDS_MORE_INPUT = 2
_RESULT_NEEDS_MORE_OUTPUT = 3


def decompress(data: bytes, max_out: int = 1 << 30) -> bytes:
    """Decode one brotli stream, bomb-gated at ``max_out`` bytes."""
    lib = _load_dec()
    if lib is None:
        raise BrotliError(
            "system libbrotlidec not present — refusing by name")
    state = lib.BrotliDecoderCreateInstance(None, None, None)
    if not state:
        raise BrotliError("BrotliDecoderCreateInstance failed")
    try:
        src = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
        next_in = ctypes.cast(src, ctypes.POINTER(ctypes.c_uint8))
        avail_in = ctypes.c_size_t(len(data))
        chunk = 1 << 17
        outbuf = (ctypes.c_uint8 * chunk)()
        parts: list[bytes] = []
        total = 0
        while True:
            next_out = ctypes.cast(outbuf, ctypes.POINTER(ctypes.c_uint8))
            avail_out = ctypes.c_size_t(chunk)
            res = lib.BrotliDecoderDecompressStream(
                state, ctypes.byref(avail_in), ctypes.byref(next_in),
                ctypes.byref(avail_out), ctypes.byref(next_out), None)
            produced = chunk - avail_out.value
            if produced:
                total += produced
                if total > max_out:
                    raise BrotliError(
                        f"brotli stream expands past cap {max_out} "
                        f"— decompression-bomb gate")
                parts.append(bytes(outbuf[:produced]))
            if res == _RESULT_SUCCESS:
                return b"".join(parts)
            if res == _RESULT_NEEDS_MORE_OUTPUT:
                continue
            if res == _RESULT_NEEDS_MORE_INPUT:
                raise BrotliError(
                    "truncated brotli stream (input ended mid-stream)")
            raise BrotliError("corrupt brotli stream")
    finally:
        lib.BrotliDecoderDestroyInstance(state)
