"""Pure-stdlib RoaringBitmap codecs for Delta Lake deletion vectors.

Implements exactly the public byte formats a Delta DV reader needs
(delta-io PROTOCOL.md "Deletion Vectors" + the RoaringFormatSpec at
github.com/RoaringBitmap/RoaringFormatSpec):

* **Z85** (ZeroMQ spec 32): the ASCII armor Delta uses for inline DVs and
  the UUID in ``storageType = "u"`` paths. 4 bytes -> 5 chars, big-endian.
* **32-bit roaring bitmap, portable serialization**: little-endian;
  no-run cookie 12346 / run cookie 12347; array (<=4096 sorted uint16),
  bitset (1024 x uint64) and run (n x (start, len-1)) containers. The
  decoder speaks all three; the encoder (used by tests and the DV export
  helper) emits array/bitset only — always spec-legal.
* **64-bit RoaringBitmapArray, "portable" format** (Delta's
  ``RoaringBitmapArray``): int32 LE magic 1681511377, int64 LE number of
  32-bit bitmaps, then each bitmap standard-serialized; bucket index is
  implicit (bitmap i holds values with high 32 bits == i).
* **DV file framing**: a DV file starts with a single format-version byte
  (= 1); each vector is ``[int32 BE dataSize][data][int32 BE CRC-32 of
  data]`` with the descriptor's ``offset`` pointing at the length field
  and ``sizeInBytes == len(data)``.

Every checked invariant (magic, cookie, CRC, sizes) raises ``ValueError``
on mismatch — the Delta reader converts that into its refuse-rather-than-
misread contract, so a table whose DVs don't parse fails loudly instead of
returning rows that should be deleted.
"""

from __future__ import annotations

import struct
import zlib

_Z85_CHARS = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_CHARS)}

MAGIC_RBA_PORTABLE = 1681511377
_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE_RUN = 12347
_NO_OFFSET_THRESHOLD = 4
DV_FILE_FORMAT_VERSION = 1


# -- Z85 ---------------------------------------------------------------------
def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise ValueError(f"Z85 input length {len(data)} not a multiple of 4")
    out = []
    for i in range(0, len(data), 4):
        (v,) = struct.unpack(">I", data[i : i + 4])
        chunk = []
        for _ in range(5):
            v, r = divmod(v, 85)
            chunk.append(_Z85_CHARS[r])
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError(f"Z85 input length {len(text)} not a multiple of 5")
    out = bytearray()
    for i in range(0, len(text), 5):
        v = 0
        for c in text[i : i + 5]:
            if c not in _Z85_INDEX:
                raise ValueError(f"invalid Z85 character {c!r}")
            v = v * 85 + _Z85_INDEX[c]
        if v > 0xFFFFFFFF:
            raise ValueError("Z85 quintet overflows 32 bits")
        out += struct.pack(">I", v)
    return bytes(out)


# -- 32-bit roaring ----------------------------------------------------------
def serialize_roaring32(values: list[int]) -> bytes:
    """Standard portable serialization (no run containers). ``values`` are
    uint32, any order, deduplicated here."""
    containers: dict[int, list[int]] = {}
    for v in sorted(set(values)):
        if not 0 <= v <= 0xFFFFFFFF:
            raise ValueError(f"value {v} out of uint32 range")
        containers.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(containers)
    out = bytearray()
    out += struct.pack("<ii", _SERIAL_COOKIE_NO_RUN, len(keys))
    for k in keys:
        out += struct.pack("<HH", k, len(containers[k]) - 1)
    # offsets (from start of the buffer)
    header_len = 8 + 4 * len(keys) + 4 * len(keys)
    pos = header_len
    payloads = []
    for k in keys:
        lows = containers[k]
        if len(lows) <= 4096:
            payload = struct.pack(f"<{len(lows)}H", *lows)
        else:
            bits = bytearray(8192)
            for lo in lows:
                bits[lo >> 3] |= 1 << (lo & 7)
            payload = bytes(bits)
        payloads.append(payload)
        out += struct.pack("<I", pos)
        pos += len(payload)
    for p in payloads:
        out += p
    return bytes(out)


def _deserialize_roaring32(buf: bytes, base: int) -> tuple[list[int], int]:
    """Decode one 32-bit bitmap starting at ``base``; returns (sorted low
    values as full uint32s within their 16-bit key buckets, bytes consumed)."""
    # unsigned: the run cookie packs (container_count - 1) into the high 16
    # bits, so with >= 32769 containers a signed unpack goes negative and a
    # valid giant DV would be rejected
    (cookie,) = struct.unpack_from("<I", buf, base)
    run_flags = b""
    if (cookie & 0xFFFF) == _SERIAL_COOKIE_RUN:
        size = (cookie >> 16) + 1
        p = base + 4
        nrf = (size + 7) // 8
        run_flags = buf[p : p + nrf]
        p += nrf
        has_offsets = size >= _NO_OFFSET_THRESHOLD
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (size,) = struct.unpack_from("<i", buf, base + 4)
        p = base + 8
        has_offsets = True
    else:
        raise ValueError(f"bad roaring cookie {cookie}")
    keys_cards = []
    for i in range(size):
        k, cm1 = struct.unpack_from("<HH", buf, p)
        p += 4
        keys_cards.append((k, cm1 + 1))
    if has_offsets:
        p += 4 * size  # offsets are redundant for a sequential decode
    values: list[int] = []
    for i, (k, card) in enumerate(keys_cards):
        is_run = bool(run_flags) and bool(run_flags[i >> 3] & (1 << (i & 7)))
        hi = k << 16
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, p)
            p += 2
            for _ in range(n_runs):
                start, length = struct.unpack_from("<HH", buf, p)
                p += 4
                values.extend(hi | v for v in range(start, start + length + 1))
        elif card <= 4096:
            lows = struct.unpack_from(f"<{card}H", buf, p)
            p += 2 * card
            values.extend(hi | v for v in lows)
        else:
            words = struct.unpack_from("<1024Q", buf, p)
            p += 8192
            for wi, w in enumerate(words):
                while w:
                    b = w & -w
                    values.append(hi | (wi << 6) | (b.bit_length() - 1))
                    w ^= b
    return values, p - base


# -- 64-bit RoaringBitmapArray (Delta portable format) -----------------------
def serialize_rba(values: list[int]) -> bytes:
    """Delta RoaringBitmapArray portable serialization of uint64 values
    (dense bucket array: every 2^32 bucket up to the max one is present,
    empty buckets as empty bitmaps — matching the implicit-index layout)."""
    buckets: dict[int, list[int]] = {}
    for v in sorted(set(values)):
        if v < 0:
            raise ValueError("negative value")
        buckets.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    n = (max(buckets) + 1) if buckets else 0
    out = bytearray(struct.pack("<iq", MAGIC_RBA_PORTABLE, n))
    for i in range(n):
        out += serialize_roaring32(buckets.get(i, []))
    return bytes(out)


def deserialize_rba(data: bytes) -> list[int]:
    """Decode a Delta RoaringBitmapArray; returns sorted uint64 values."""
    if len(data) < 12:
        raise ValueError("RoaringBitmapArray too short")
    magic, n = struct.unpack_from("<iq", data, 0)
    if magic != MAGIC_RBA_PORTABLE:
        raise ValueError(f"bad RoaringBitmapArray magic {magic}")
    if n < 0 or n > 1 << 32:
        raise ValueError(f"implausible bitmap count {n}")
    p = 12
    values: list[int] = []
    for i in range(n):
        lows, consumed = _deserialize_roaring32(data, p)
        p += consumed
        hi = i << 32
        values.extend(hi | v for v in lows)
    return values


# -- DV file framing ---------------------------------------------------------
def frame_dv(data: bytes) -> bytes:
    """``[int32 BE dataSize][data][int32 BE CRC-32(data)]`` — one vector's
    on-disk framing (the descriptor's offset points at the length field)."""
    return struct.pack(">i", len(data)) + data + struct.pack(">I", zlib.crc32(data))


def unframe_dv(buf: bytes, offset: int, size_in_bytes: int) -> bytes:
    """Extract and checksum-verify one framed vector."""
    (n,) = struct.unpack_from(">i", buf, offset)
    if n != size_in_bytes:
        raise ValueError(
            f"DV length field {n} != descriptor sizeInBytes {size_in_bytes}"
        )
    data = buf[offset + 4 : offset + 4 + n]
    if len(data) != n:
        raise ValueError("DV data truncated")
    (crc,) = struct.unpack_from(">I", buf, offset + 4 + n)
    if crc != zlib.crc32(data):
        raise ValueError("DV checksum mismatch")
    return data
