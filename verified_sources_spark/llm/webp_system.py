"""Capability-gated ctypes seam over the SYSTEM libwebp for lossy VP8.

Lossy VP8 is the majority of real-world WebP, and its keyframe decode
(boolean arithmetic coder over ~3 KB of trained probability tables +
DCT/WHT + loop filter) is exactly the kind of bitstream a production
100 TB pipeline decodes with the battle-tested system codec, not a
hand-rolled reimplementation: the RFC 6386 probability tables are
large opaque constants, so a from-scratch decoder that cannot be
verified against a reference would risk SILENT GARBLE — the failure
mode this engine's honest-refusal contract exists to prevent.

This module binds ``libwebp.so`` when present (plain ``ctypes``, no
pip dependency) and exposes:

- ``available()`` — capability probe; every caller falls back to the
  named refusal when the library is absent, so behavior degrades to
  exactly the pre-seam posture.
- ``decode_rgb`` — any WebP the system codec accepts (lossy VP8,
  VP8L, VP8X envelopes incl. alpha, which decodes as RGBA) → the
  engine's common ``{width, height, mode, pixels}`` contract.
- ``encode_rgb`` — fixture/ingest-side lossy encoder (quality 0-100),
  giving tests a genuinely independent encoder for the decoder path.

The pure-stdlib VP8L decoder (llm/vp8l_codec) remains the default for
lossless bitstreams — this seam is consulted for the lossy share only
(see llm/image_io.decode_image dispatch).
"""

from __future__ import annotations

import ctypes
import ctypes.util

__all__ = ["available", "decode_rgb", "encode_rgb", "webp_version"]

_lib: ctypes.CDLL | None | bool = None


def _load():
    global _lib
    if _lib is None:
        name = ctypes.util.find_library("webp") or "libwebp.so.7"
        try:
            lib = ctypes.CDLL(name)
            lib.WebPDecodeRGB.restype = ctypes.POINTER(ctypes.c_uint8)
            lib.WebPDecodeRGB.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ]
            lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
            lib.WebPDecodeRGBA.argtypes = lib.WebPDecodeRGB.argtypes
            lib.WebPEncodeRGB.restype = ctypes.c_size_t
            lib.WebPEncodeRGB.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_float,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ]
            lib.WebPGetInfo.restype = ctypes.c_int
            lib.WebPGetInfo.argtypes = lib.WebPDecodeRGB.argtypes
            lib.WebPGetDecoderVersion.restype = ctypes.c_int
            lib.WebPFree.argtypes = [ctypes.c_void_p]
            _lib = lib
        except (OSError, AttributeError):
            _lib = False
    return _lib if _lib else None


def available() -> bool:
    """True when a system libwebp with the needed entry points loaded."""
    return _load() is not None


def webp_version() -> str | None:
    lib = _load()
    if lib is None:
        return None
    v = lib.WebPGetDecoderVersion()
    return f"{(v >> 16) & 0xFF}.{(v >> 8) & 0xFF}.{v & 0xFF}"


def decode_rgb(payload: bytes, with_alpha: bool = False) -> dict:
    """{width, height, mode, pixels} via the system codec; raises
    ValueError on absent library or undecodable payload (callers keep
    the named-refusal posture)."""
    lib = _load()
    if lib is None:
        raise ValueError(
            "system libwebp not present — lossy VP8 refuses by name")
    w = ctypes.c_int()
    h = ctypes.c_int()
    fn = lib.WebPDecodeRGBA if with_alpha else lib.WebPDecodeRGB
    ptr = fn(payload, len(payload), ctypes.byref(w), ctypes.byref(h))
    if not ptr:
        raise ValueError("libwebp could not decode the WebP payload")
    try:
        ch = 4 if with_alpha else 3
        pixels = ctypes.string_at(ptr, w.value * h.value * ch)
    finally:
        lib.WebPFree(ptr)
    return {"width": w.value, "height": h.value,
            "mode": "RGBA" if with_alpha else "RGB", "pixels": pixels}


def encode_rgb(width: int, height: int, pixels: bytes,
               quality: float = 90.0) -> bytes:
    """Lossy VP8 WebP via the system encoder (independent of any
    decode path in this repo — the two-sided fixture property)."""
    lib = _load()
    if lib is None:
        raise ValueError(
            "system libwebp not present — lossy VP8 refuses by name")
    if len(pixels) != width * height * 3:
        raise ValueError("pixel buffer does not match dimensions")
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.WebPEncodeRGB(pixels, width, height, width * 3,
                          float(quality), ctypes.byref(out))
    if n == 0 or not out:
        raise ValueError("libwebp encode failed")
    try:
        return ctypes.string_at(out, n)
    finally:
        lib.WebPFree(out)
