"""Multimodal column support (`[ext]`, north-star mandate).

Design: media are opaque ``BinaryType`` columns + a typed metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` operators so each task streams batches
of blobs without ever materializing a partition in Python memory.

The container has no image/audio codecs, so the actual byte→pixels
step is STUBBED (clearly marked below): `decode_image` raises
``NotImplementedError`` unless ``fake=True``, in which case a
deterministic fake decoder (seeded by the blob's bytes) produces
stable metadata/features. Everything Spark-side — schemas, batch
iteration, partitioning, UDF signatures — is real and tested; swapping
the stub for Pillow/ffmpeg is a pure function replacement.
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Typed metadata carried with every media blob.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("format", T.StringType()),      # png|jpg|wav|mp4|...
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.StringType()),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "doc_id long, n_bytes long, checksum string, width int, height int, "
    "n_channels int, mean_luma double"
)


def attach_media(df: DataFrame, binary_col: str, media_type: str, fmt: str) -> DataFrame:
    """Wrap a binary column with its typed metadata struct (real,
    engine-side — no stub)."""
    b = F.col(binary_col)
    meta = F.struct(
        F.lit(media_type).alias("media_type"),
        F.lit(fmt).alias("format"),
        F.octet_length(b).cast("long").alias("n_bytes"),
        F.md5(b).alias("checksum"),
    )
    return df.withColumn("media_meta", meta)


def _fake_decode(blob: bytes) -> tuple[int, int, int, float]:
    """STUB decoder: deterministic pseudo-image properties derived from
    the blob bytes (replace with Pillow in a codec-enabled image).
    Returns (width, height, channels, mean_luma)."""
    h = zlib.crc32(blob)
    width = 64 + (h & 0x3FF)           # 64..1087
    height = 64 + ((h >> 10) & 0x3FF)
    channels = 1 + ((h >> 20) & 0x3)   # 1..4
    mean_luma = ((h >> 22) & 0xFF) / 255.0
    return width, height, channels, mean_luma


def decode_image_features(
    df: DataFrame, binary_col: str, id_col: str = "doc_id", fake: bool = True
) -> DataFrame:
    """Decode + feature-extract over media blobs via mapInPandas: each
    Arrow batch of blobs yields one row of features per blob. The
    iterator contract keeps peak memory at one batch, independent of
    partition size — the 100 TB-safe shape for fat binary columns.
    """
    if not fake:
        # STUB: no codec libraries in this container (north-star brief).
        raise NotImplementedError(
            "real image decoding needs Pillow/opencv; run with fake=True"
        )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_decode(b) for b in pdf["__blob"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["__id"].values,
                    "n_bytes": [len(b) for b in pdf["__blob"]],
                    "checksum": [hashlib.md5(b).hexdigest() for b in pdf["__blob"]],
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "n_channels": [f[2] for f in feats],
                    "mean_luma": [f[3] for f in feats],
                }
            )

    slim = df.select(F.col(id_col).alias("__id"), F.col(binary_col).alias("__blob"))
    return slim.mapInPandas(extract, schema=IMAGE_FEATURES_SCHEMA)


def sample_frames(
    df: DataFrame, binary_col: str, id_col: str = "doc_id", every_n: int = 10
) -> DataFrame:
    """Frame-sampling plumbing for video blobs: emits (id, frame_idx,
    frame_blob) rows. The splitter is the same deterministic stub
    (fixed-size chunks as stand-in frames); the Spark shape — explode
    via mapInPandas iterator, downstream repartition by id — is real."""

    def split(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for i, blob in zip(pdf["__id"], pdf["__blob"]):
                chunk = 256  # STUB: fixed-size chunks stand in for decoded frames
                n = max(1, len(blob) // chunk)
                for fi in range(0, n, every_n):
                    ids.append(i)
                    idxs.append(fi)
                    frames.append(bytes(blob[fi * chunk : (fi + 1) * chunk]))
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    slim = df.select(F.col(id_col).alias("__id"), F.col(binary_col).alias("__blob"))
    return slim.mapInPandas(split, schema="doc_id long, frame_idx int, frame binary")
