"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

Data model: media travels as a BinaryType column beside a struct of
typed metadata (media_type, width/height/duration, codec). Decode /
feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` kernels so each task touches a bounded batch of blobs —
the only sane shape at 100 TB (no driver collection, no per-row Python).

The actual codec step is STUBBED: image/audio libraries are not in this
environment. ``decode_media`` raises ``NotImplementedError`` unless
``fake=True``, which substitutes a deterministic pseudo-decoder
(md5-seeded) so the Spark-side plumbing — schema, batching, partitioning,
UDF signatures — is real and testable. Swapping in PIL/av later changes
ONLY the ``_decode_one`` body.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _fake_decode(blob: bytes) -> np.ndarray:
    """Deterministic stand-in decoder: blob -> 8x8 'pixel' grid seeded by
    the blob's md5 (stable across runs/executors)."""
    seed = int(hashlib.md5(blob).hexdigest()[:8], 16)
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(8, 8), dtype=np.uint8)


def _decode_one(blob: bytes, fake: bool) -> np.ndarray:
    if fake:
        return _fake_decode(blob)
    raise NotImplementedError(
        "real media decoding needs PIL/av which are not installed; "
        "pass fake=True for the deterministic test decoder"
    )


def decode_media(
    df: DataFrame,
    blob_col: str = "media",
    id_col: str = "media_id",
    fake: bool = False,
) -> DataFrame:
    """binary blob -> flattened pixel array column (array<int>) plus
    width/height. Arrow-batched; one task per input partition."""
    out_schema = f"{id_col} long, width int, height int, pixels array<int>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            px = [_decode_one(bytes(b), fake) for b in pdf[blob_col]]
            yield pd.DataFrame({
                id_col: pdf[id_col].to_numpy(),
                "width": [p.shape[1] for p in px],
                "height": [p.shape[0] for p in px],
                "pixels": [p.ravel().tolist() for p in px],
            })

    return df.select(id_col, blob_col).mapInPandas(run, schema=out_schema)


def media_features(
    df: DataFrame,
    blob_col: str = "media",
    id_col: str = "media_id",
    fake: bool = False,
) -> DataFrame:
    """Per-blob features: byte size, byte-entropy, mean/std of decoded
    pixels. Entropy is computed on the raw bytes (codec-independent)."""
    out_schema = (
        f"{id_col} long, n_bytes long, byte_entropy double, "
        "px_mean double, px_std double"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[blob_col]):
                b = np.frombuffer(bytes(blob), dtype=np.uint8)
                counts = np.bincount(b, minlength=256)
                p = counts[counts > 0] / max(len(b), 1)
                ent = float(-(p * np.log2(p)).sum()) if len(b) else 0.0
                px = _decode_one(bytes(blob), fake).astype(float)
                rows.append((int(mid), len(b), ent, float(px.mean()), float(px.std())))
            yield pd.DataFrame(rows, columns=[id_col, "n_bytes", "byte_entropy",
                                              "px_mean", "px_std"])

    return df.select(id_col, blob_col).mapInPandas(run, schema=out_schema)


def sample_frames(
    df: DataFrame,
    blob_col: str = "media",
    id_col: str = "media_id",
    every_n: int = 2,
    fake: bool = False,
) -> DataFrame:
    """Frame sampling: decode -> emit every Nth row of the pixel grid as
    a 'frame' (UDTF shape: one input row -> many output rows). For real
    video this is the keyframe/stride sampler."""
    out_schema = f"{id_col} long, frame_no int, frame array<int>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_no, out_frame = [], [], []
            for mid, blob in zip(pdf[id_col], pdf[blob_col]):
                px = _decode_one(bytes(blob), fake)
                for i in range(0, px.shape[0], every_n):
                    out_id.append(int(mid))
                    out_no.append(i)
                    out_frame.append(px[i].tolist())
            yield pd.DataFrame({id_col: out_id, "frame_no": out_no, "frame": out_frame})

    return df.select(id_col, blob_col).mapInPandas(run, schema=out_schema)


def documents_as_media(df: DataFrame) -> DataFrame:
    """Adapter: treat the documents table's text as binary payloads so the
    multimodal plumbing has a driver-data substrate."""
    return df.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "utf-8").alias("media"),
    )


def media_metadata(df: DataFrame, blob_col: str = "media",
                   id_col: str = "media_id") -> DataFrame:
    """Codec-independent blob metadata — pure Catalyst (size, md5,
    magic-byte prefix); the cheap pre-filter stage every 100 TB media
    pipeline runs before spending decode cycles."""
    return df.select(
        F.col(id_col),
        F.octet_length(F.col(blob_col)).alias("n_bytes"),
        F.md5(F.col(blob_col)).alias("blob_md5"),
        F.hex(F.substring(F.col(blob_col), 1, 4)).alias("magic"),
    )
