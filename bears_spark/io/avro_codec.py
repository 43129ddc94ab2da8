"""Pure-stdlib Avro Object Container File codec (read + write).

The spark-avro JVM package is an external module not deployed in this
container; rather than leaving the AVRO format enum reader/writer-less, this
implements the published Avro 1.x spec (container format + binary encoding)
directly: magic ``Obj\\x01``, file-metadata map carrying the JSON schema,
16-byte sync marker, then length-prefixed row blocks; values use zigzag
varints, IEEE little-endian floats, and length-prefixed UTF-8/bytes.

Scope: flat records of the primitive types Spark's scalar columns map to —
boolean, int, long, float, double, string, bytes, plus the
``timestamp-micros`` and ``date`` logical types — each wrapped nullable as
``["null", T]``. Nested records/arrays/maps raise (use parquet for nested
data). ``null`` codec only (no deflate), which every Avro reader accepts.

Reference parity: bears ships format readers/writers as registry entries
(src/bears/reader/Reader.py:81-116); Avro is a capability-gap fill, not a
reference feature.
"""

from __future__ import annotations

import hashlib
import io
import json
import struct
from typing import Any

import pandas as pd

MAGIC = b"Obj\x01"
_BLOCK_ROWS = 4096

# ---------------------------------------------------------------- primitives


def _zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _zigzag_decode(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _write_varint(buf: io.BytesIO, n: int) -> None:
    n &= (1 << 64) - 1
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            return


def _write_long(buf: io.BytesIO, n: int) -> None:
    _write_varint(buf, _zigzag_encode(int(n)))


def _read_varint(buf: io.BufferedReader) -> int:
    shift = 0
    out = 0
    while True:
        byte = buf.read(1)
        if not byte:
            raise EOFError("truncated avro varint")
        b = byte[0]
        out |= (b & 0x7F) << shift
        if not (b & 0x80):
            return out
        shift += 7


def _read_long(buf) -> int:
    n = _zigzag_decode(_read_varint(buf))
    # wrap to signed 64-bit
    n &= (1 << 64) - 1
    return n - (1 << 64) if n >= (1 << 63) else n


def _write_bytes(buf: io.BytesIO, b: bytes) -> None:
    _write_long(buf, len(b))
    buf.write(b)


def _read_bytes(buf) -> bytes:
    n = _read_long(buf)
    return buf.read(n)


# ---------------------------------------------------------- schema translation


def spark_schema_to_avro(schema, name: str = "row") -> dict:
    """Spark StructType -> Avro record schema (every field nullable)."""
    from pyspark.sql import types as T

    def field_type(dt) -> Any:
        if isinstance(dt, T.BooleanType):
            return "boolean"
        if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType)):
            return "int"
        if isinstance(dt, T.LongType):
            return "long"
        if isinstance(dt, T.FloatType):
            return "float"
        if isinstance(dt, T.DoubleType):
            return "double"
        if isinstance(dt, T.StringType):
            return "string"
        if isinstance(dt, T.BinaryType):
            return "bytes"
        if isinstance(dt, T.TimestampType):
            return {"type": "long", "logicalType": "timestamp-micros"}
        if isinstance(dt, T.DateType):
            return {"type": "int", "logicalType": "date"}
        raise NotImplementedError(f"avro codec supports flat scalar columns; got {dt}")

    return {
        "type": "record",
        "name": name,
        "fields": [{"name": f.name, "type": ["null", field_type(f.dataType)]} for f in schema.fields],
    }


def avro_schema_to_spark(avro: dict):
    """Avro record schema -> Spark StructType (inverse of the map above)."""
    from pyspark.sql import types as T

    prim = {
        "boolean": T.BooleanType(),
        "int": T.IntegerType(),
        "long": T.LongType(),
        "float": T.FloatType(),
        "double": T.DoubleType(),
        "string": T.StringType(),
        "bytes": T.BinaryType(),
    }

    def to_spark(ft) -> Any:
        if isinstance(ft, list):  # union — take the non-null branch
            branches = [b for b in ft if b != "null"]
            if len(branches) != 1:
                raise NotImplementedError(f"only [null, T] unions supported, got {ft}")
            return to_spark(branches[0])
        if isinstance(ft, dict):
            lt = ft.get("logicalType")
            if lt == "timestamp-micros":
                return T.TimestampType()
            if lt == "date":
                return T.DateType()
            return to_spark(ft["type"])
        if ft in prim:
            return prim[ft]
        raise NotImplementedError(f"unsupported avro type {ft!r}")

    return T.StructType([T.StructField(f["name"], to_spark(f["type"]), True) for f in avro["fields"]])


def _plain_type(ft) -> tuple[str, str | None]:
    """(base primitive, logicalType|None) of a [null, T] field type."""
    if isinstance(ft, list):
        ft = [b for b in ft if b != "null"][0]
    if isinstance(ft, dict):
        return ft["type"], ft.get("logicalType")
    return ft, None


# ------------------------------------------------------------------- encoding


def _encode_value(buf: io.BytesIO, base: str, logical: str | None, v: Any) -> None:
    if base in ("int", "long"):
        if logical == "timestamp-micros":
            v = pd.Timestamp(v).value // 1000  # ns -> µs
        elif logical == "date":
            v = (pd.Timestamp(v) - pd.Timestamp("1970-01-01")).days
        _write_long(buf, int(v))
    elif base == "double":
        buf.write(struct.pack("<d", float(v)))
    elif base == "float":
        buf.write(struct.pack("<f", float(v)))
    elif base == "string":
        _write_bytes(buf, str(v).encode("utf-8"))
    elif base == "bytes":
        _write_bytes(buf, bytes(v))
    elif base == "boolean":
        buf.write(b"\x01" if v else b"\x00")
    else:
        raise NotImplementedError(f"avro encode: {base}")


def encode_container(pdf: pd.DataFrame, avro_schema: dict) -> bytes:
    """pandas DataFrame -> one Avro container file (bytes), null codec."""
    schema_json = json.dumps(avro_schema, sort_keys=True)
    # deterministic sync marker: same data + schema -> byte-identical file
    sync = hashlib.md5(schema_json.encode() + str(len(pdf)).encode()).digest()

    out = io.BytesIO()
    out.write(MAGIC)
    meta = {"avro.schema": schema_json.encode(), "avro.codec": b"null"}
    _write_long(out, len(meta))
    for k, v in sorted(meta.items()):
        _write_bytes(out, k.encode())
        _write_bytes(out, v)
    _write_long(out, 0)  # end of metadata map
    out.write(sync)

    fields = [(f["name"], *_plain_type(f["type"])) for f in avro_schema["fields"]]
    cols = {name: pdf[name].tolist() if name in pdf.columns else [None] * len(pdf) for name, _, _ in fields}
    for start in range(0, len(pdf), _BLOCK_ROWS):
        n = min(_BLOCK_ROWS, len(pdf) - start)
        block = io.BytesIO()
        for i in range(start, start + n):
            for name, base, logical in fields:
                v = cols[name][i]
                if v is None or v != v:  # None or NaN/NaT
                    _write_long(block, 0)  # union branch: null
                else:
                    _write_long(block, 1)  # union branch: value
                    _encode_value(block, base, logical, v)
        payload = block.getvalue()
        _write_long(out, n)
        _write_long(out, len(payload))
        out.write(payload)
        out.write(sync)
    return out.getvalue()


# ------------------------------------------------------------------- decoding


def _decode_value(buf, base: str, logical: str | None) -> Any:
    if base in ("int", "long"):
        v = _read_long(buf)
        if logical == "timestamp-micros":
            return pd.Timestamp(v * 1000)  # µs -> ns
        if logical == "date":
            return (pd.Timestamp("1970-01-01") + pd.Timedelta(days=v)).date()
        return v
    if base == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if base == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if base == "string":
        return _read_bytes(buf).decode("utf-8")
    if base == "bytes":
        return _read_bytes(buf)
    if base == "boolean":
        return buf.read(1) == b"\x01"
    raise NotImplementedError(f"avro decode: {base}")


def read_header(buf) -> tuple[dict, bytes]:
    """Parse container header; returns (avro schema dict, sync marker)."""
    if buf.read(4) != MAGIC:
        raise ValueError("not an avro object container file")
    meta: dict[str, bytes] = {}
    while True:
        n = _read_long(buf)
        if n == 0:
            break
        if n < 0:  # negative block count form: size follows
            n = -n
            _read_long(buf)
        for _ in range(n):
            k = _read_bytes(buf).decode()
            meta[k] = _read_bytes(buf)
    codec = meta.get("avro.codec", b"null")
    if codec not in (b"null", b""):
        raise NotImplementedError(f"avro codec {codec!r} unsupported (null only)")
    return json.loads(meta["avro.schema"]), buf.read(16)


def decode_container(data: bytes) -> pd.DataFrame:
    """One Avro container file (bytes) -> pandas DataFrame."""
    buf = io.BytesIO(data)
    avro_schema, sync = read_header(buf)
    fields = [(f["name"], *_plain_type(f["type"])) for f in avro_schema["fields"]]
    cols: dict[str, list] = {name: [] for name, _, _ in fields}
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, 1)
        n_rows = _read_long(buf)
        _read_long(buf)  # block byte size (unused — null codec)
        for _ in range(n_rows):
            for name, base, logical in fields:
                branch = _read_long(buf)
                cols[name].append(None if branch == 0 else _decode_value(buf, base, logical))
        if buf.read(16) != sync:
            raise ValueError("avro sync marker mismatch (corrupt file)")
    return pd.DataFrame({name: pd.Series(vals, dtype="object") for name, vals in cols.items()})
