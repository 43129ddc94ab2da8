"""Pure stdlib/numpy GIF decoder (first frame) — no Pillow.

Reference parity: the reference decodes GIF via imageio
(src/bears/reader/asset/ImageIOReader.py:17). Together with
functions/jpeg.py this removes the last external-library gate for the
common image formats: PPM/BMP/PNG/JPEG/GIF all decode natively.

Scope: GIF87a/GIF89a, global + local color tables, LZW decompression
(variable code width, clear/EOI codes), interlaced and non-interlaced
frames. Returns the FIRST frame composited onto the logical screen —
animation frame iteration belongs in sample_frames-style plumbing, not a
batch decode.
"""

from __future__ import annotations

import numpy as np


def _lzw_decode(min_code_size: int, data: bytes) -> bytearray:
    """GIF-flavor LZW: codes are emitted LSB-first in a little-endian bit
    stream; width grows after the dictionary fills, capped at 12 bits."""
    clear_code = 1 << min_code_size
    eoi_code = clear_code + 1

    def reset_dict() -> list[bytes | None]:
        d: list[bytes | None] = [bytes([i]) for i in range(clear_code)]
        d.extend([None, None])  # clear, EOI placeholders
        return d

    dictionary = reset_dict()
    code_size = min_code_size + 1
    out = bytearray()
    prev: bytes | None = None

    bitpos = 0
    total_bits = len(data) * 8

    def read_code(size: int) -> int | None:
        nonlocal bitpos
        if bitpos + size > total_bits:
            return None
        byte_idx = bitpos >> 3
        # codes can straddle up to 3 bytes at 12-bit width
        chunk = int.from_bytes(data[byte_idx : byte_idx + 3], "little")
        code = (chunk >> (bitpos & 7)) & ((1 << size) - 1)
        bitpos += size
        return code

    while True:
        code = read_code(code_size)
        if code is None or code == eoi_code:
            break
        if code == clear_code:
            dictionary = reset_dict()
            code_size = min_code_size + 1
            prev = None
            continue
        if prev is None:
            entry = dictionary[code]
            if entry is None:
                raise ValueError("corrupt GIF LZW stream")
            out.extend(entry)
            prev = entry
            continue
        if code < len(dictionary) and dictionary[code] is not None:
            entry = dictionary[code]
        elif code == len(dictionary):
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError("corrupt GIF LZW stream")
        out.extend(entry)
        dictionary.append(prev + entry[:1])
        if len(dictionary) == (1 << code_size) and code_size < 12:
            code_size += 1
        prev = entry
    return out


def decode_gif(content: bytes) -> np.ndarray:
    """Decode GIF bytes -> HxWx3 uint8 RGB (first frame, composited onto the
    logical screen; transparency index renders as the background color)."""
    if content[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w = int.from_bytes(content[6:8], "little")
    h = int.from_bytes(content[8:10], "little")
    packed = content[10]
    bg_index = content[11]
    pos = 13
    global_table: np.ndarray | None = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        global_table = np.frombuffer(content[pos : pos + 3 * n], dtype=np.uint8).reshape(-1, 3)
        pos += 3 * n

    transparent_index = -1
    while pos < len(content):
        block = content[pos]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = content[pos + 1]
            pos += 2
            if label == 0xF9 and content[pos] >= 4:  # graphic control
                flags = content[pos + 1]
                if flags & 0x01:
                    transparent_index = content[pos + 4]
            while content[pos] != 0:  # skip sub-blocks
                pos += 1 + content[pos]
            pos += 1
            continue
        if block != 0x2C:  # image descriptor expected
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        left = int.from_bytes(content[pos + 1 : pos + 3], "little")
        top = int.from_bytes(content[pos + 3 : pos + 5], "little")
        fw = int.from_bytes(content[pos + 5 : pos + 7], "little")
        fh = int.from_bytes(content[pos + 7 : pos + 9], "little")
        iflags = content[pos + 9]
        pos += 10
        table = global_table
        if iflags & 0x80:  # local color table
            n = 2 << (iflags & 0x07)
            table = np.frombuffer(content[pos : pos + 3 * n], dtype=np.uint8).reshape(-1, 3)
            pos += 3 * n
        if table is None:
            raise ValueError("GIF frame has no color table")
        min_code_size = content[pos]
        pos += 1
        lzw = bytearray()
        while content[pos] != 0:
            size = content[pos]
            lzw += content[pos + 1 : pos + 1 + size]
            pos += 1 + size
        pos += 1

        indices = np.frombuffer(bytes(_lzw_decode(min_code_size, bytes(lzw))), dtype=np.uint8)
        if len(indices) < fw * fh:
            raise ValueError("GIF LZW stream shorter than frame")
        frame_idx = indices[: fw * fh].reshape(fh, fw)
        if iflags & 0x40:  # interlaced: 4-pass row order
            deinterlaced = np.zeros_like(frame_idx)
            rows = list(range(0, fh, 8)) + list(range(4, fh, 8)) + list(range(2, fh, 4)) + list(range(1, fh, 2))
            deinterlaced[rows] = frame_idx
            frame_idx = deinterlaced

        canvas_idx = np.full((h, w), bg_index, dtype=np.uint8)
        canvas_idx[top : top + fh, left : left + fw] = frame_idx
        if transparent_index >= 0:
            # first-frame semantics: transparent pixels show the background
            region = canvas_idx[top : top + fh, left : left + fw]
            region[frame_idx == transparent_index] = bg_index
        safe = np.minimum(canvas_idx, len(table) - 1)
        return table[safe].copy()
    raise ValueError("GIF contains no image frame")


def encode_gif(arr: np.ndarray) -> bytes:
    """Minimal GIF89a encoder for <=256-color images (test fixture support:
    exercises the real decoder without external tools). Quantization is
    exact-palette only — raises if the image has more than 256 distinct
    colors."""
    arr = np.asarray(arr, dtype=np.uint8)
    h, w = arr.shape[:2]
    flat = arr.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError("encode_gif supports at most 256 distinct colors")
    table_bits = max(1, int(len(colors) - 1).bit_length())
    table_size = 1 << table_bits
    palette = np.zeros((table_size, 3), dtype=np.uint8)
    palette[: len(colors)] = colors

    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | (table_bits - 1), 0, 0])
    out += palette.tobytes()
    out += b"\x2c" + bytes(4) + w.to_bytes(2, "little") + h.to_bytes(2, "little") + b"\x00"

    min_code_size = max(2, table_bits)
    clear_code = 1 << min_code_size
    eoi_code = clear_code + 1
    out.append(min_code_size)

    # LZW encode (dictionary of tuples -> code)
    bitbuf = 0
    nbits = 0
    body = bytearray()

    def emit(code: int, size: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += size
        while nbits >= 8:
            body.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    code_size = min_code_size + 1
    dictionary: dict[tuple[int, ...], int] = {(i,): i for i in range(clear_code)}
    next_code = eoi_code + 1
    emit(clear_code, code_size)
    seq: tuple[int, ...] = ()
    for pix in inverse.astype(int):
        candidate = seq + (pix,)
        if candidate in dictionary:
            seq = candidate
            continue
        emit(dictionary[seq], code_size)
        dictionary[candidate] = next_code
        next_code += 1
        if next_code - 1 == (1 << code_size) and code_size < 12:
            code_size += 1
        if next_code >= 4096:  # dictionary full: reset
            emit(clear_code, code_size)
            dictionary = {(i,): i for i in range(clear_code)}
            next_code = eoi_code + 1
            code_size = min_code_size + 1
        seq = (pix,)
    if seq:
        emit(dictionary[seq], code_size)
    emit(eoi_code, code_size)
    if nbits:
        body.append(bitbuf & 0xFF)

    for i in range(0, len(body), 255):
        chunk = body[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
