"""Real multimodal decode tests — ALWAYS-ON via the stdlib PNG codec.

``decoder="png"`` (llm/png_codec.py) runs in every environment, so the
real decode/resize paths are exercised unconditionally; where Pillow IS
installed the same tests additionally run with ``decoder="pil"``
(parametrized, no skips).  The pil-without-Pillow contract remains the
fail-fast ImportError at plan-build time.
"""

from __future__ import annotations

import pytest

from verified_sources_spark.llm.multimodal import (
    PIL_FEATURE_SCHEMA,
    extract_features,
    resize_images,
)
from verified_sources_spark.llm.png_codec import decode, encode

try:
    import PIL  # noqa: F401

    HAS_PIL = True
except ImportError:
    HAS_PIL = False

DECODERS = ["png"] + (["pil"] if HAS_PIL else [])


def _docs(spark):
    return spark.createDataFrame([(1, b"x"), (2, b"y")], "doc_id long, asset binary")


def test_pil_decoder_gate(spark):
    """Missing codec dependency surfaces at plan BUILD on the driver —
    not N tasks deep into an executor stage (when Pillow IS installed
    the same call simply builds the plan)."""
    if HAS_PIL:
        extract_features(_docs(spark), decoder="pil")  # builds, no raise
        resize_images(_docs(spark), decoder="pil")
    else:
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
    return encode(w, h, bytes(color) * (w * h), "RGB")


@pytest.mark.parametrize("decoder", DECODERS)
def test_extract_features_real_decode(spark, decoder):
    rows = [
        (1, _png_bytes(8, 6, (255, 0, 0))),
        (2, _png_bytes(3, 5, (0, 255, 0))),
        (3, b"not an image at all"),  # corrupt object must not kill the task
    ]
    df = spark.createDataFrame(rows, "doc_id long, asset binary")
    out = {r["doc_id"]: r for r in extract_features(df, decoder=decoder).collect()}
    assert out[1]["decoded_ok"] and (out[1]["width"], out[1]["height"]) == (8, 6)
    assert out[1]["format"] == "PNG" and out[1]["mode"] == "RGB"
    assert out[2]["decoded_ok"] and (out[2]["width"], out[2]["height"]) == (3, 5)
    assert not out[3]["decoded_ok"] and out[3]["width"] is None
    assert extract_features(df, decoder=decoder).schema == PIL_FEATURE_SCHEMA


@pytest.mark.parametrize("decoder", DECODERS)
def test_resize_images_real_roundtrip(spark, decoder):
    df = spark.createDataFrame(
        [(1, _png_bytes(64, 48, (1, 2, 3))), (2, b"garbage")],
        "doc_id long, asset binary",
    )
    out = {
        r["doc_id"]: r
        for r in resize_images(df, width=16, height=16, decoder=decoder).collect()
    }
    im = decode(bytes(out[1]["resized"]))
    assert (im["width"], im["height"]) == (16, 16)
    # a solid-color source stays solid through any resampler
    assert im["pixels"] == bytes((1, 2, 3)) * (16 * 16)
    assert out[2]["resized"] is None  # corrupt payload isolated, not fatal
