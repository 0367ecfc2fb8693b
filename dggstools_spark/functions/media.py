"""Multimodal (image/audio/video) column plumbing.

Media rides as opaque ``binary`` columns with typed metadata structs; decode
/ feature-extract / resize / frame-sample run as Arrow-batched ``mapInPandas``
stages.  The actual codec step is STUBBED (no image/audio libraries in this
container): ``deterministic_fake_decode`` produces a seeded, reproducible
"pixel" tensor from the bytes so the Spark-side plumbing — schema, batch
shape, partitioning, UDF signatures — is real and testable, and a real codec
drops in by replacing one function.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (ArrayType, BinaryType, FloatType, IntegerType,
                               StringType, StructField, StructType)

MEDIA_META = StructType([
    StructField("kind", StringType()),       # image | audio | video
    StructField("mime", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_frames", IntegerType()),
    StructField("sample_rate", IntegerType()),
])

FEATURE_SCHEMA = StructType([
    StructField("doc_id", StringType()),
    StructField("media_ref", StringType()),
    StructField("feature", ArrayType(FloatType())),
    StructField("feat_dim", IntegerType()),
])


def deterministic_fake_decode(blob: bytes, out_pixels: int = 64) -> np.ndarray:
    """STUB codec: derive a deterministic float32 'image' from the raw bytes.

    Replace with e.g. PIL/libvips/ffmpeg in a real deployment; the dataflow
    (bytes in, fixed-shape float tensor out) is the contract that matters."""
    if blob is None or len(blob) == 0:
        return np.zeros(out_pixels, dtype=np.float32)
    arr = np.frombuffer(blob, dtype=np.uint8)
    reps = int(np.ceil(out_pixels / arr.size))
    tiled = np.tile(arr, reps)[:out_pixels].astype(np.float32)
    return (tiled - 127.5) / 127.5


def extract_features(df: DataFrame, blob_col: str = "blob",
                     id_col: str = "doc_id", ref_col: str = "media_ref",
                     feat_dim: int = 64) -> DataFrame:
    """mapInPandas feature extraction: decode (stub) + mean-pool per batch.
    Arrow batches in, Arrow batches out; no per-row Python beyond the codec
    call itself (which a real codec also requires)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                deterministic_fake_decode(b, feat_dim).tolist()
                for b in pdf[blob_col]
            ]
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype(str),
                "media_ref": pdf[ref_col].astype(str),
                "feature": feats,
                "feat_dim": feat_dim,
            })

    return df.mapInPandas(run, FEATURE_SCHEMA)


def resize_images(df: DataFrame, blob_col: str = "blob",
                  target: int = 16) -> DataFrame:
    """STUB resize: decode (fake) -> downsample by striding -> re-encode as
    binary.  Demonstrates the binary->binary mapInPandas shape."""
    schema = StructType(df.schema.fields + [StructField("resized", BinaryType())])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for b in pdf[blob_col]:
                px = deterministic_fake_decode(b, 256)
                stride = max(1, 256 // target)
                small = px[::stride][:target]
                out.append(((small * 127.5) + 127.5).astype(np.uint8).tobytes())
            pdf = pdf.copy()
            pdf["resized"] = out
            yield pdf

    return df.mapInPandas(run, schema)


def sample_frames(df: DataFrame, blob_col: str = "blob", every: int = 8,
                  n_frames: int = 32) -> DataFrame:
    """STUB video frame sampling: emits one row per sampled frame index —
    the explode-shaped mapInPandas used for video pipelines."""
    schema = StructType(df.schema.fields + [
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                for fi in range(0, n_frames, every):
                    px = deterministic_fake_decode(
                        (row[blob_col] or b"") + fi.to_bytes(2, "big"), 32)
                    r = dict(row)
                    r["frame_idx"] = fi
                    r["frame"] = ((px * 127.5) + 127.5).astype(np.uint8).tobytes()
                    rows.append(r)
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return df.mapInPandas(run, schema)
