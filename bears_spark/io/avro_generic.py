"""Generic (recursive) Avro container codec — the full type system, not just
the flat nullable-primitive records io/avro_codec.py handles: records,
arrays, maps, unions, enums, fixed, named-type references, and the null /
deflate block codecs. Pure stdlib.

Exists for table-format interop: Apache Iceberg's metadata tree
(manifest-list and manifest files) is deeply-nested Avro
(iceberg.apache.org/spec — manifest `data_file` is a record of records,
maps, and arrays), which the flat codec cannot express. Decoding is
schema-driven off the container's EMBEDDED schema, so readers work on real
files regardless of writer; the encoder exists so tests can craft
spec-shaped fixtures without a third-party Avro dependency.

Scale note: these parse METADATA files (KBs to a few MBs, driver-side);
bulk data decode stays on the Spark/Arrow paths.
"""

from __future__ import annotations

import io
import json
import struct
import zlib
from typing import Any

# varint / zigzag ------------------------------------------------------------


def _read_varint(buf) -> int:
    shift = 0
    out = 0
    while True:
        b = buf.read(1)
        if not b:
            raise ValueError("truncated avro varint")
        v = b[0]
        out |= (v & 0x7F) << shift
        if not v & 0x80:
            return out
        shift += 7


def _read_long(buf) -> int:
    n = _read_varint(buf)
    return (n >> 1) ^ -(n & 1)


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n >= 0 else ((-n) << 1) - 1


def _write_zlong(buf, n: int) -> None:
    z = _zigzag(n)
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            return


# schema resolution -----------------------------------------------------------


def _named(schema, env: dict) -> Any:
    """Resolve a schema node: register/look up named types so self-references
    ('type': 'r102') decode."""
    if isinstance(schema, str):
        return env.get(schema, schema)
    if isinstance(schema, dict) and schema.get("type") in ("record", "enum", "fixed"):
        env[schema["name"]] = schema
    return schema


# decode -----------------------------------------------------------------------


def _decode(buf, schema, env: dict) -> Any:
    schema = _named(schema, env)
    if isinstance(schema, list):  # union: branch index then value
        branch = _read_long(buf)
        return _decode(buf, schema[branch], env)
    t = schema if isinstance(schema, str) else schema["type"]
    if isinstance(t, (list, dict)):  # {"type": <complex>} wrapper
        return _decode(buf, t, env)
    if t == "null":
        return None
    if t == "boolean":
        return buf.read(1) != b"\x00"
    if t in ("int", "long"):
        return _read_long(buf)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "bytes":
        return buf.read(_read_long(buf))
    if t == "string":
        return buf.read(_read_long(buf)).decode("utf-8")
    if t == "fixed":
        return buf.read(schema["size"])
    if t == "enum":
        return schema["symbols"][_read_long(buf)]
    if t == "record":
        _named(schema, env)
        return {f["name"]: _decode(buf, f["type"], env) for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:  # block with byte size prefix
                n = -n
                _read_long(buf)
            for _ in range(n):
                out.append(_decode(buf, schema["items"], env))
    if t == "map":
        out = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:
                n = -n
                _read_long(buf)
            for _ in range(n):
                k = buf.read(_read_long(buf)).decode("utf-8")
                out[k] = _decode(buf, schema["values"], env)
    raise ValueError(f"unsupported avro type {t!r}")


def read_container(data: bytes) -> tuple[dict, list[dict]]:
    """Avro object-container bytes -> (embedded schema, records). Handles
    the null and deflate codecs."""
    buf = io.BytesIO(data)
    if buf.read(4) != b"Obj\x01":
        raise ValueError("not an avro container")
    meta = _decode(buf, {"type": "map", "values": "bytes"}, {})
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported avro codec {codec!r}")
    sync = buf.read(16)
    records: list[dict] = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, 1)
        n = _read_long(buf)
        size = _read_long(buf)
        block = buf.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, wbits=-15)
        bbuf = io.BytesIO(block)
        env: dict = {}
        for _ in range(n):
            records.append(_decode(bbuf, schema, env))
        if buf.read(16) != sync:
            raise ValueError("avro sync marker mismatch")
    return schema, records


# encode -----------------------------------------------------------------------


def _encode(buf, schema, value, env: dict) -> None:
    schema = _named(schema, env)
    if isinstance(schema, list):  # union: pick the first matching branch
        for i, branch in enumerate(schema):
            bt = branch if isinstance(branch, str) else branch.get("type")
            if value is None and bt == "null":
                _write_zlong(buf, i)
                return
            if value is not None and bt != "null":
                _write_zlong(buf, i)
                _encode(buf, branch, value, env)
                return
        raise ValueError(f"no union branch for {value!r} in {schema}")
    t = schema if isinstance(schema, str) else schema["type"]
    if isinstance(t, (list, dict)):
        _encode(buf, t, value, env)
        return
    if t == "null":
        return
    if t == "boolean":
        buf.write(b"\x01" if value else b"\x00")
    elif t in ("int", "long"):
        _write_zlong(buf, int(value))
    elif t == "float":
        buf.write(struct.pack("<f", float(value)))
    elif t == "double":
        buf.write(struct.pack("<d", float(value)))
    elif t == "bytes":
        _write_zlong(buf, len(value))
        buf.write(value)
    elif t == "string":
        b = value.encode("utf-8")
        _write_zlong(buf, len(b))
        buf.write(b)
    elif t == "fixed":
        buf.write(value)
    elif t == "enum":
        _write_zlong(buf, schema["symbols"].index(value))
    elif t == "record":
        _named(schema, env)
        for f in schema["fields"]:
            _encode(buf, f["type"], value.get(f["name"]), env)
    elif t == "array":
        if value:
            _write_zlong(buf, len(value))
            for item in value:
                _encode(buf, schema["items"], item, env)
        _write_zlong(buf, 0)
    elif t == "map":
        if value:
            _write_zlong(buf, len(value))
            for k, v in value.items():
                kb = k.encode("utf-8")
                _write_zlong(buf, len(kb))
                buf.write(kb)
                _encode(buf, schema["values"], v, env)
        _write_zlong(buf, 0)
    else:
        raise ValueError(f"unsupported avro type {t!r}")


def write_container(schema: dict, records: list[dict]) -> bytes:
    """(schema, records) -> avro object-container bytes (null codec)."""
    out = io.BytesIO()
    out.write(b"Obj\x01")
    meta = {"avro.schema": json.dumps(schema).encode()}
    _encode(out, {"type": "map", "values": "bytes"}, meta, {})
    sync = b"\x00" * 8 + b"bearsync"  # any 16 bytes
    out.write(sync)
    body = io.BytesIO()
    env: dict = {}
    for r in records:
        _encode(body, schema, r, env)
    payload = body.getvalue()
    _write_zlong(out, len(records))
    _write_zlong(out, len(payload))
    out.write(payload)
    out.write(sync)
    return out.getvalue()
