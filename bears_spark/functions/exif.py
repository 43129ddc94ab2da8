"""Pure-stdlib EXIF / image-metadata extraction.

Parses the JPEG APP1 "Exif" segment (a TIFF container: byte-order header,
IFD0 + Exif sub-IFD entry tables) and PNG tEXt chunks — the metadata a
training-data pipeline filters and stratifies on (camera model, orientation,
capture time) without decoding a single pixel. At 100 TB this matters: the
metadata scan reads only the first few KB of each payload while a decode
touches everything, so layout the pipeline as metadata-filter FIRST, decode
the survivors.

Format facts are from the public TIFF 6.0 and EXIF 2.3 specifications and
the PNG RFC (2083).
"""

from __future__ import annotations

import struct
from typing import Any

# TIFF field types -> (struct code, size in bytes)
_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}

_TAG_NAMES = {
    0x010F: "make",
    0x0110: "model",
    0x0112: "orientation",
    0x0132: "datetime",
    0x011A: "x_resolution",
    0x011B: "y_resolution",
    0x0131: "software",
    0x8769: "_exif_ifd",
    0x829A: "exposure_time",
    0x829D: "f_number",
    0x8827: "iso",
    0x9003: "datetime_original",
    0x920A: "focal_length",
    0xA002: "pixel_x_dimension",
    0xA003: "pixel_y_dimension",
}


def _read_value(data: bytes, entry_off: int, endian: str, tiff_base: int) -> Any:
    tag, ftype, count = struct.unpack_from(endian + "HHL", data, entry_off)
    if ftype not in _TYPE_SIZES:
        return tag, None
    total = _TYPE_SIZES[ftype] * count
    if total <= 4:
        voff = entry_off + 8
    else:
        (rel,) = struct.unpack_from(endian + "L", data, entry_off + 8)
        voff = tiff_base + rel
    if voff + total > len(data):
        return tag, None
    if ftype == 2:  # ASCII
        raw = data[voff : voff + count]
        return tag, raw.split(b"\x00", 1)[0].decode("ascii", "replace")
    if ftype in (1, 6, 7):
        vals = list(data[voff : voff + count])
    elif ftype in (3, 8):
        code = "H" if ftype == 3 else "h"
        vals = list(struct.unpack_from(endian + code * count, data, voff))
    elif ftype in (4, 9):
        code = "L" if ftype == 4 else "l"
        vals = list(struct.unpack_from(endian + code * count, data, voff))
    else:  # RATIONAL / SRATIONAL
        code = "LL" if ftype == 5 else "ll"
        vals = []
        for i in range(count):
            num, den = struct.unpack_from(endian + code, data, voff + 8 * i)
            vals.append(num / den if den else None)
    return tag, vals[0] if count == 1 else vals


def _parse_ifd(data: bytes, ifd_off: int, endian: str, tiff_base: int, out: dict) -> None:
    if ifd_off + 2 > len(data):
        return
    (n,) = struct.unpack_from(endian + "H", data, ifd_off)
    for i in range(n):
        entry = ifd_off + 2 + 12 * i
        if entry + 12 > len(data):
            return
        tag, value = _read_value(data, entry, endian, tiff_base)
        name = _TAG_NAMES.get(tag)
        if name == "_exif_ifd" and isinstance(value, int):
            _parse_ifd(data, tiff_base + value, endian, tiff_base, out)
        elif name and value is not None:
            out.setdefault(name, value)


def parse_tiff(data: bytes, base: int = 0) -> dict:
    """Parse a TIFF byte-order header + IFD chain starting at ``base``."""
    bom = data[base : base + 2]
    if bom == b"II":
        endian = "<"
    elif bom == b"MM":
        endian = ">"
    else:
        raise ValueError("EXIF: bad TIFF byte-order mark")
    (magic,) = struct.unpack_from(endian + "H", data, base + 2)
    if magic != 42:
        raise ValueError("EXIF: bad TIFF magic")
    (ifd0,) = struct.unpack_from(endian + "L", data, base + 4)
    out: dict = {}
    _parse_ifd(data, base + ifd0, endian, base, out)
    return out


def parse_exif_jpeg(content: bytes) -> dict:
    """Extract EXIF fields + frame dimensions from a JPEG payload. Walks
    segments only — never entropy-coded data — so it reads a few KB
    regardless of image size."""
    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    out: dict = {}
    pos = 2
    while pos + 4 <= len(content):
        if content[pos] != 0xFF:
            break
        marker = content[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xDA:  # start of scan — metadata is all before this
            break
        (seg_len,) = struct.unpack_from(">H", content, pos + 2)
        seg = content[pos + 4 : pos + 2 + seg_len]
        if marker == 0xE1 and seg[:6] == b"Exif\x00\x00":
            try:
                out.update(parse_tiff(seg, 6))
            except (ValueError, struct.error):
                pass
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2: true frame dims
            _, h, w, _ = struct.unpack_from(">BHHB", seg, 0)
            out["height"], out["width"] = h, w
        pos += 2 + seg_len
    return out


def parse_png_metadata(content: bytes) -> dict:
    """IHDR dimensions + tEXt key/value chunks from a PNG payload."""
    if content[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    out: dict = {}
    texts: dict = {}
    pos = 8
    while pos + 8 <= len(content):
        (length,) = struct.unpack_from(">L", content, pos)
        ctype = content[pos + 4 : pos + 8]
        body = content[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            out["width"], out["height"] = struct.unpack_from(">LL", body, 0)
            out["bit_depth"], out["color_type"] = body[8], body[9]
        elif ctype == b"tEXt" and b"\x00" in body:
            k, v = body.split(b"\x00", 1)
            texts[k.decode("latin-1")] = v.decode("latin-1")
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + crc
    if texts:
        out["text"] = texts
    return out


def parse_image_metadata(content: bytes) -> dict:
    """Format-dispatching metadata parse (JPEG EXIF / PNG); unknown formats
    yield an empty dict rather than raising — the operator records fmt."""
    try:
        if content[:2] == b"\xff\xd8":
            return parse_exif_jpeg(content)
        if content[:4] == b"\x89PNG":
            return parse_png_metadata(content)
    except (ValueError, struct.error, IndexError):
        pass
    return {}
