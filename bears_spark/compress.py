"""CompressedScalableDataFrame parity: DataFrame <-> compressed JSON payload.

Reference: compress (src/bears/core/frame/ScalableDataFrame.py:336-393,
brotli quality=11 / gzip level=9 defaults, optional base64) and decompress
(:2057-2087). A driver-side serialization utility, not a distributed op —
kept for API parity; use parquet for anything that matters.
"""

from __future__ import annotations

import base64 as _b64
import gzip
import json


def compress(frame, codec: str = "gzip", base64: bool = False) -> bytes | str:
    """SparkFrame/DataFrame -> gzip'd JSONLines payload (level 9 parity)."""
    df = frame.df if hasattr(frame, "df") else frame
    payload = "\n".join(df.toJSON().collect()).encode()
    if codec == "gzip":
        blob = gzip.compress(payload, compresslevel=9)
    elif codec == "brotli":
        try:
            import brotli

            blob = brotli.compress(payload, quality=11)
        except ImportError:
            raise ImportError("brotli not installed; use codec='gzip'")
    else:
        raise ValueError(f"unknown codec {codec!r}")
    header = codec.encode() + b"\x00"
    blob = header + blob
    return _b64.b64encode(blob).decode() if base64 else blob


def decompress(blob: bytes | str, spark=None):
    """Inverse of compress -> SparkFrame."""
    from bears_spark.frame import SparkFrame

    if isinstance(blob, str):
        blob = _b64.b64decode(blob)
    codec, _, body = blob.partition(b"\x00")
    if codec == b"gzip":
        payload = gzip.decompress(body)
    elif codec == b"brotli":
        import brotli

        payload = brotli.decompress(body)
    else:
        raise ValueError(f"unknown codec {codec!r}")
    if spark is None:
        from bears_spark.session import get_session

        spark = get_session()
    rows = [json.loads(line) for line in payload.decode().splitlines() if line]
    return SparkFrame.of(rows, spark)
