"""EXIF / image-metadata extraction tests: hand-built JPEG APP1 (both TIFF
byte orders, sub-IFD, rationals, out-of-line values) and PNG tEXt chunks,
plus the Spark metadata operator end-to-end."""

import struct
import zlib

import numpy as np

from bears_spark.functions.exif import (
    parse_exif_jpeg,
    parse_image_metadata,
    parse_png_metadata,
    parse_tiff,
)


def _tiff(endian: str, entries, extra: bytes = b"") -> bytes:
    """Build a one-IFD TIFF block. ``entries`` = [(tag, type, count, value_bytes)]
    where value_bytes is the 4-byte inline field (already padded/offset)."""
    bom = b"II" if endian == "<" else b"MM"
    head = bom + struct.pack(endian + "H", 42) + struct.pack(endian + "L", 8)
    ifd = struct.pack(endian + "H", len(entries))
    for tag, ftype, count, val4 in entries:
        ifd += struct.pack(endian + "HHL", tag, ftype, count) + val4
    ifd += struct.pack(endian + "L", 0)  # no next IFD
    return head + ifd + extra


def _jpeg_with_app1(tiff_block: bytes) -> bytes:
    app1_body = b"Exif\x00\x00" + tiff_block
    seg = struct.pack(">H", len(app1_body) + 2) + app1_body
    sof = struct.pack(">H", 2 + 1 + 2 + 2 + 1) + struct.pack(">BHHB", 8, 99, 123, 1)
    return b"\xff\xd8" + b"\xff\xe1" + seg + b"\xff\xc0" + sof + b"\xff\xda" + b"\x00\x02"


def test_tiff_little_endian_shorts_and_ascii():
    # orientation (SHORT inline) + make (ASCII out-of-line)
    make = b"ACME Cam\x00"
    # IFD starts at 8; 2 entries -> ifd size = 2 + 2*12 + 4 = 30; data at 38
    entries = [
        (0x0112, 3, 1, struct.pack("<H", 6) + b"\x00\x00"),
        (0x010F, 2, len(make), struct.pack("<L", 38)),
    ]
    md = parse_tiff(_tiff("<", entries, make))
    assert md["orientation"] == 6
    assert md["make"] == "ACME Cam"


def test_tiff_big_endian_and_rational():
    # exposure_time RATIONAL 1/250 stored out-of-line at offset 38
    entries = [
        (0x0112, 3, 1, struct.pack(">H", 3) + b"\x00\x00"),
        (0x829A, 5, 1, struct.pack(">L", 38)),
    ]
    extra = struct.pack(">LL", 1, 250)
    md = parse_tiff(_tiff(">", entries, extra))
    assert md["orientation"] == 3
    assert abs(md["exposure_time"] - 1 / 250) < 1e-12


def test_exif_sub_ifd_and_sof_dims():
    # IFD0 has the Exif-IFD pointer; sub-IFD carries ISO + pixel dims
    sub_off = 8 + 2 + 12 + 4  # one-entry IFD0 ends at 26
    ifd0 = struct.pack("<H", 1) + struct.pack("<HHL", 0x8769, 4, 1) + struct.pack("<L", sub_off)
    ifd0 += struct.pack("<L", 0)
    sub = struct.pack("<H", 2)
    sub += struct.pack("<HHL", 0x8827, 3, 1) + struct.pack("<H", 400) + b"\x00\x00"
    sub += struct.pack("<HHL", 0xA002, 4, 1) + struct.pack("<L", 1920)
    sub += struct.pack("<L", 0)
    tiff = b"II" + struct.pack("<H", 42) + struct.pack("<L", 8) + ifd0 + sub
    md = parse_exif_jpeg(_jpeg_with_app1(tiff))
    assert md["iso"] == 400
    assert md["pixel_x_dimension"] == 1920
    # SOF dims always win for height/width
    assert (md["height"], md["width"]) == (99, 123)


def test_corrupt_exif_does_not_break_sof():
    md = parse_exif_jpeg(_jpeg_with_app1(b"XX garbage"))
    assert (md["height"], md["width"]) == (99, 123)


def _png_with_text(pairs) -> bytes:
    def chunk(ctype: bytes, body: bytes) -> bytes:
        return struct.pack(">L", len(body)) + ctype + body + struct.pack(">L", zlib.crc32(ctype + body))

    ihdr = struct.pack(">LLBBBBB", 64, 32, 8, 2, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    for k, v in pairs:
        out += chunk(b"tEXt", k.encode() + b"\x00" + v.encode())
    return out + chunk(b"IEND", b"")


def test_png_metadata():
    md = parse_png_metadata(_png_with_text([("Software", "testgen"), ("Comment", "hi")]))
    assert (md["width"], md["height"]) == (64, 32)
    assert md["bit_depth"] == 8 and md["color_type"] == 2
    assert md["text"] == {"Software": "testgen", "Comment": "hi"}


def test_parse_image_metadata_dispatch_unknown():
    assert parse_image_metadata(b"garbage bytes") == {}


def test_extract_image_metadata_operator(spark, tmp_path):
    from bears_spark.functions.multimodal import extract_image_metadata, load_assets

    entries = [(0x0112, 3, 1, struct.pack("<H", 8) + b"\x00\x00")]
    (tmp_path / "cam.jpg").write_bytes(_jpeg_with_app1(_tiff("<", entries)))
    (tmp_path / "shot.png").write_bytes(_png_with_text([("Software", "gen")]))
    (tmp_path / "junk.bin").write_bytes(b"\x00\x01\x02")

    rows = {r["path"].rsplit("/", 1)[-1]: r for r in extract_image_metadata(load_assets(spark, str(tmp_path))).collect()}
    assert rows["cam.jpg"]["fmt"] == "jpeg"
    assert rows["cam.jpg"]["orientation"] == 8
    assert (rows["cam.jpg"]["height"], rows["cam.jpg"]["width"]) == (99, 123)
    assert rows["shot.png"]["fmt"] == "png"
    assert (rows["shot.png"]["width"], rows["shot.png"]["height"]) == (64, 32)
    assert rows["junk.bin"]["fmt"] == "unknown"
    assert rows["junk.bin"]["width"] is None
