"""Multimodal (image/audio/video) columns: binary payloads + typed metadata.

Reference parity: asset MLTypes IMAGE/AUDIO/VIDEO/PDF
(src/bears/constants/_MLTypeConstants.py:20-25) and the asset readers
(src/bears/reader/asset/ — ImageIOReader.py:17, TorchAudioReader,
FitzPdfReader.py:17). The engine treats assets as opaque ``binary`` columns
with a struct metadata column; decode / resize / frame-sample run as
Arrow-batched pandas functions over mapInPandas.

The decode kernels themselves are STUBBED (image/audio libraries are not in
this container): ``decode_image`` raises NotImplementedError unless
``fake=True``, which produces a deterministic fake decode so the Spark-side
plumbing — schema, batching, partitioning — is fully real and tested.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def load_assets(spark, path_glob: str, partition_target_bytes: int = 128 << 20) -> DataFrame:
    """Read a directory/glob of binary assets -> (path, modificationTime,
    length, content). binaryFile source parallelizes per file; for millions of
    small files at 100 TB, prefer packing into parquet/sequence containers
    upstream — this source is for moderate file counts."""
    return spark.read.format("binaryFile").load(path_glob)


_MAGIC = {
    b"\xff\xd8\xff": "jpeg",
    b"\x89PNG": "png",
    b"GIF8": "gif",
    b"RIFF": "riff",  # wav/webp — disambiguated at decode
    b"%PDF": "pdf",
}


def detect_format(content_col) -> "F.Column":
    """Magic-byte sniffing as a pure expression over the binary column."""
    c = content_col if not isinstance(content_col, str) else F.col(content_col)
    out = F.lit("unknown")
    for magic, name in _MAGIC.items():
        hexs = magic.hex()
        out = F.when(F.startswith(F.hex(c), F.lit(hexs.upper())), F.lit(name)).otherwise(out)
    return out


def decode_image_batch(content: bytes, fake: bool = False) -> np.ndarray:
    """Decode one image payload -> HxWx3 uint8 array.

    STUB: real decode needs Pillow/opencv (not in this container). With
    fake=True, returns a deterministic 8x8x3 array seeded by the content
    hash — stable across runs/engines, so tests can assert values."""
    if not fake:
        raise NotImplementedError("image decode requires Pillow/opencv — not available in this environment")
    seed = int(hashlib.md5(content).hexdigest()[:8], 16)
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)


_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("w", T.IntegerType()),
    ]
)


def extract_image_features(assets: DataFrame, fake: bool = True) -> DataFrame:
    """Decode + per-channel mean features via mapInPandas (Arrow batches stay
    on executors; one Python worker per core). The canonical multimodal
    pattern: binary in, narrow typed features out — never ship decoded
    pixels through a shuffle."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                content = bytes(r["content"])
                arr = decode_image_batch(content, fake=fake)
                fmt = next((n for m, n in _MAGIC.items() if content.startswith(m)), "unknown")
                rows.append(
                    {
                        "path": r["path"],
                        "fmt": fmt,
                        "mean_r": float(arr[..., 0].mean()),
                        "mean_g": float(arr[..., 1].mean()),
                        "mean_b": float(arr[..., 2].mean()),
                        "h": arr.shape[0],
                        "w": arr.shape[1],
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in _FEATURES_SCHEMA.fields])

    return assets.select("path", "content").mapInPandas(_extract, _FEATURES_SCHEMA)


def sample_frames(video_df: DataFrame, every_n: int = 30, fake: bool = True) -> DataFrame:
    """Frame-sampling plumbing for video payloads: 1 video row -> N frame rows
    (UDTF shape via mapInPandas). Decode stubbed like images."""
    schema = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                content = bytes(r["content"])
                if not fake:
                    raise NotImplementedError("video decode requires ffmpeg/pyav — not available")
                n_frames = (len(content) % 91) + 30  # deterministic fake frame count
                for i in range(0, n_frames, every_n):
                    digest = hashlib.md5(content + i.to_bytes(4, "little")).digest()
                    rows.append({"path": r["path"], "frame_idx": i, "frame": digest})
            yield pd.DataFrame(rows, columns=["path", "frame_idx", "frame"])

    return video_df.select("path", "content").mapInPandas(_sample, schema)
