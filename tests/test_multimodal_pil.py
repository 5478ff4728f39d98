"""Pillow-gated multimodal decode tests.

The real-codec paths (``decoder="pil"``) are optional-dependency-gated
exactly like HttpTransport/requests.  In an environment WITHOUT Pillow
(this container) the contract under test is the fail-fast ImportError at
plan-build time; WHERE Pillow is installed the same file exercises real
decode, resize, and per-object corrupt-payload isolation end-to-end.
"""

from __future__ import annotations

import pytest

from verified_sources_spark.llm.multimodal import (
    PIL_FEATURE_SCHEMA,
    extract_features,
    resize_images,
)

try:
    import PIL  # noqa: F401

    HAS_PIL = True
except ImportError:
    HAS_PIL = False


def _docs(spark):
    return spark.createDataFrame([(1, b"x"), (2, b"y")], "doc_id long, asset binary")


@pytest.mark.skipif(HAS_PIL, reason="Pillow installed; fail-fast path not reachable")
def test_pil_decoder_fails_fast_on_driver_without_pillow(spark):
    """Missing codec dependency surfaces at plan BUILD on the driver —
    not N tasks deep into an executor stage."""
    with pytest.raises(ImportError, match="Pillow"):
        extract_features(_docs(spark), decoder="pil")
    with pytest.raises(ImportError, match="Pillow"):
        resize_images(_docs(spark), decoder="pil")


def test_unknown_decoder_rejected(spark):
    with pytest.raises(ValueError):
        extract_features(_docs(spark), decoder="ffmpeg")
    with pytest.raises(ValueError):
        resize_images(_docs(spark), decoder="ffmpeg")


def _png_bytes(w: int, h: int, color) -> bytes:
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (w, h), color).save(buf, format="PNG")
    return buf.getvalue()


@pytest.mark.skipif(not HAS_PIL, reason="Pillow not installed")
def test_pil_extract_features_real_decode(spark):
    rows = [
        (1, _png_bytes(8, 6, (255, 0, 0))),
        (2, _png_bytes(3, 5, (0, 255, 0))),
        (3, b"not an image at all"),  # corrupt object must not kill the task
    ]
    df = spark.createDataFrame(rows, "doc_id long, asset binary")
    out = {r["doc_id"]: r for r in extract_features(df, decoder="pil").collect()}
    assert out[1]["decoded_ok"] and (out[1]["width"], out[1]["height"]) == (8, 6)
    assert out[1]["format"] == "PNG" and out[1]["mode"] == "RGB"
    assert out[2]["decoded_ok"] and (out[2]["width"], out[2]["height"]) == (3, 5)
    assert not out[3]["decoded_ok"] and out[3]["width"] is None
    assert extract_features(df, decoder="pil").schema == PIL_FEATURE_SCHEMA


@pytest.mark.skipif(not HAS_PIL, reason="Pillow not installed")
def test_pil_resize_images_real_roundtrip(spark):
    import io

    from PIL import Image

    df = spark.createDataFrame(
        [(1, _png_bytes(64, 48, (1, 2, 3))), (2, b"garbage")],
        "doc_id long, asset binary",
    )
    out = {r["doc_id"]: r for r in resize_images(df, width=16, height=16, decoder="pil").collect()}
    im = Image.open(io.BytesIO(out[1]["resized"]))
    assert im.size == (16, 16) and im.format == "PNG"
    assert out[2]["resized"] is None  # corrupt payload isolated, not fatal
