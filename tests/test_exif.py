"""EXIF probe + scrub (llm/exif.py): TIFF IFD walks in both byte
orders, GPS DMS decoding, pixel-preserving metadata removal, error
paths, and the Spark compliance operator."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from verified_sources_spark.llm.exif import (
    ExifError,
    build_exif_app1,
    exif_inventory,
    inject_app1,
    probe_exif,
    strip_metadata,
)
from verified_sources_spark.llm.jpeg_codec import decode, encode


def _jpg(seed=0, w=32, h=24):
    rng = np.random.default_rng(seed)
    coarse = rng.integers(0, 256, size=(6, 8))
    gray = coarse[(np.arange(h) * 6) // h][:, (np.arange(w) * 8) // w]
    rgb = np.stack([gray] * 3, axis=2).astype(np.uint8)
    return encode(w, h, rgb.tobytes(), quality=90)


@pytest.mark.parametrize("bo", ["II", "MM"])
def test_probe_both_byte_orders(bo):
    app1 = build_exif_app1(make="TestCam", model="M2", orientation=6,
                           datetime="2025:05:05 12:00:00",
                           gps=(37.7749, -122.4194), byte_order=bo)
    m = probe_exif(inject_app1(_jpg(), app1))
    assert m["has_exif"] and m["make"] == "TestCam" and m["model"] == "M2"
    assert m["orientation"] == 6
    assert m["datetime"] == "2025:05:05 12:00:00"
    assert m["has_gps"]
    assert m["latitude"] == pytest.approx(37.7749, abs=1e-6)
    assert m["longitude"] == pytest.approx(-122.4194, abs=1e-6)


def test_no_exif_and_gps_hemispheres():
    m = probe_exif(_jpg())
    assert not m["has_exif"] and not m["has_gps"]
    m = probe_exif(inject_app1(_jpg(), build_exif_app1(gps=(-33.5, 151.25))))
    assert m["latitude"] == pytest.approx(-33.5)
    assert m["longitude"] == pytest.approx(151.25)


def test_strip_preserves_pixels_and_removes_metadata():
    base = _jpg(seed=7)
    tagged = inject_app1(base, build_exif_app1(gps=(1.5, 2.25)))
    assert len(tagged) > len(base)
    clean = strip_metadata(tagged)
    m = probe_exif(clean)
    assert not m["has_exif"] and not m["has_gps"]
    # the scrub never touches entropy data: decoded pixels identical
    assert decode(clean)["pixels"] == decode(base)["pixels"]
    # idempotent
    assert strip_metadata(clean) == clean


def test_strip_drops_com_and_keeps_jfif():
    base = _jpg()
    com = b"\xff\xfe" + struct.pack(">H", 12) + b"copyright!"
    jfif = (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02"
            + b"\x00" * 7)
    data = base[:2] + jfif + com + base[2:]
    clean = strip_metadata(data)
    assert b"copyright!" not in clean
    assert b"JFIF" in clean  # APP0 is structural, not metadata
    assert decode(clean)["pixels"] == decode(base)["pixels"]


def test_strip_keeps_decode_bearing_app_segments():
    """APP14 (Adobe color transform) and APP2/ICC are decode-bearing:
    dropping them recolors Adobe-encoded JPEGs. They must survive the
    scrub while EXIF/XMP/COM and non-ICC APP2 segments are removed."""
    base = _jpg(seed=3)
    adobe = (b"\xff\xee" + struct.pack(">H", 14)
             + b"Adobe\x00\x64\x00\x00\x00\x00\x00")
    icc = (b"\xff\xe2" + struct.pack(">H", 2 + 12 + 2 + 4)
           + b"ICC_PROFILE\x00\x01\x01" + b"PROF")
    fpx = b"\xff\xe2" + struct.pack(">H", 10) + b"FPXR\x00abc"
    data = base[:2] + adobe + icc + fpx + base[2:]
    tagged = inject_app1(data, build_exif_app1(gps=(1.0, 2.0)))
    clean = strip_metadata(tagged)
    assert b"Adobe\x00" in clean and b"ICC_PROFILE" in clean
    assert b"FPXR" not in clean  # non-ICC APP2 is still metadata
    assert not probe_exif(clean)["has_exif"]
    assert decode(clean)["pixels"] == decode(base)["pixels"]
    assert strip_metadata(clean) == clean


def test_error_paths():
    with pytest.raises(ExifError, match="missing SOI"):
        probe_exif(b"\x00" * 32)
    with pytest.raises(ExifError, match="truncated"):
        probe_exif(_jpg()[:10])
    # APP1 claiming Exif but carrying a garbage TIFF header
    bad = (b"\xff\xe1" + struct.pack(">H", 20) + b"Exif\x00\x00"
           + b"XX" + b"\x00" * 10)
    with pytest.raises(ExifError, match="byte order"):
        probe_exif(inject_app1(_jpg(), bad)[: None])
    # IFD pointing past the segment
    app1 = bytearray(build_exif_app1())
    app1[14:18] = struct.pack("<I", 1 << 24)  # IFD0 offset into nowhere
    with pytest.raises(ExifError, match="truncated IFD"):
        probe_exif(inject_app1(_jpg(), bytes(app1)))


def test_exif_inventory_spark_operator(spark):
    rows = [
        (1, bytearray(inject_app1(
            _jpg(1), build_exif_app1(make="A", gps=(10.5, -20.25))))),
        (2, bytearray(_jpg(2))),
        (3, bytearray(b"\xff\xd8garbage")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, asset binary")
    got = {r["doc_id"]: r for r in exif_inventory(df).collect()}
    assert got[1]["has_gps"] and got[1]["latitude"] == pytest.approx(10.5)
    assert got[1]["clean_after_scrub"] is True
    assert got[2]["has_exif"] is False and got[2]["clean_after_scrub"] is True
    assert got[3]["decoded_ok"] is False
