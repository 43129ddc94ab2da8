"""Pure numpy/stdlib baseline JPEG codec (no Pillow, no C extensions).

Reference parity: the reference decodes real images via imageio
(src/bears/reader/asset/ImageIOReader.py:17); this container has no image
libraries, so the engine ships its own baseline-JPEG (ITU-T T.81 sequential
DCT) decode path, plus a matching encoder so tests can round-trip real JPEG
bytes without external fixtures.

Scope (documented gates, not stubs):
  * decode: baseline sequential (SOF0/SOF1) AND progressive (SOF2) huffman
    DCT, 8-bit, grayscale or YCbCr, any sampling factors (4:4:4 / 4:2:2 /
    4:2:0 ...), restart markers, spectral selection + successive
    approximation with EOB runs, tables read from the file's own DQT/DHT
    segments. Arithmetic coding / lossless / 12-bit raise.
  * encode: baseline (encode_jpeg) and progressive (encode_jpeg_progressive,
    4-scan SA script) at 4:4:4. Tables are embedded in the output stream per
    the spec, so decode correctness never depends on transcription fidelity
    of the constants. Fuzzed: progressive decode is bit-identical to
    baseline decode of the same quantized coefficients across random
    sizes/qualities.

Performance note: this codec runs inside Arrow-batched ``mapInPandas``
workers (functions/multimodal.py) — per-image Python cost is the accepted
trade for a zero-dependency container; swap in Pillow/imageio on clusters
that have them (decode_image_batch auto-detects).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared constants


def _zigzag() -> np.ndarray:
    """Scan-order -> (row, col) row-major flat index, generated (not
    transcribed) to keep the 64-entry table typo-proof."""
    out = []
    for s in range(15):
        diag = [(r, s - r) for r in range(8) if 0 <= s - r < 8]
        if s % 2 == 0:
            diag = diag[::-1]
        out.extend(diag)
    return np.array([r * 8 + c for r, c in out], dtype=np.int64)


ZIGZAG = _zigzag()

# 8-point DCT-II basis: C[k, n] = a(k) cos((2n+1) k pi / 16)
_C = np.zeros((8, 8))
for _k in range(8):
    _a = np.sqrt(0.125) if _k == 0 else np.sqrt(0.25)
    for _n in range(8):
        _C[_k, _n] = _a * np.cos((2 * _n + 1) * _k * np.pi / 16)

# Annex-K-style tables. Encoder-only: every table is *written into* the
# stream (DQT/DHT), so a decoder — ours or libjpeg — always uses what the
# file says, never these constants.
QUANT_LUMA = np.array(
    [16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
     14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
     18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
     49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99],
    dtype=np.int64,
).reshape(8, 8)
QUANT_CHROMA = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99],
    dtype=np.int64,
).reshape(8, 8)

DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) via the canonical construction (T.81 C.2)."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    if k != len(vals):
        raise ValueError("huffman BITS/HUFFVAL mismatch")
    return codes


# ---------------------------------------------------------------------------
# decoder


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 stuffing;
    stops cleanly at markers (RSTn handled by the MCU loop)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                self.bitbuf = (self.bitbuf << 8) | 0
                self.nbits += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0
                if nxt == 0x00:
                    self.pos += 2  # stuffed 0xFF data byte
                else:
                    # a real marker: feed zeros (spec: decoder pads at end)
                    self.bitbuf = (self.bitbuf << 8) | 0
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.bitbuf = (self.bitbuf << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        return (self.bitbuf >> self.nbits) & ((1 << n) - 1)

    def peek_bits(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        return (self.bitbuf >> (self.nbits - n)) & ((1 << n) - 1)

    def skip_bits(self, n: int) -> None:
        self.nbits -= n

    def align_to_marker(self) -> None:
        """Drop buffered bits and position at the next marker (for RSTn)."""
        self.bitbuf = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d) and not (d[self.pos] == 0xFF and d[self.pos + 1] != 0x00):
            self.pos += 1


_FAST_BITS = 9  # first-level lookup width (covers every code of the flat
# progressive table and the overwhelmingly common Annex K symbols)


def _build_decode_table(bits: list[int], vals: list[int]) -> dict:
    """Decode structure: {'slow': {(length, code): symbol}, 'fast': list} —
    fast[prefix] = (symbol, length) for codes <= _FAST_BITS, else None and
    the per-bit walk takes over. One table build per DHT segment."""
    slow: dict[tuple[int, int], int] = {}
    fast: list = [None] * (1 << _FAST_BITS)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            slow[(length, code)] = vals[k]
            if length <= _FAST_BITS:
                base = code << (_FAST_BITS - length)
                entry = (vals[k], length)
                for suffix in range(1 << (_FAST_BITS - length)):
                    fast[base | suffix] = entry
            code += 1
            k += 1
        code <<= 1
    return {"slow": slow, "fast": fast}


def _huff_decode(reader: _BitReader, table: dict) -> int:
    entry = table["fast"][reader.peek_bits(_FAST_BITS)]
    if entry is not None:
        sym, length = entry
        reader.skip_bits(length)
        return sym
    slow = table["slow"]
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        if length <= _FAST_BITS:
            continue  # already known not to terminate within the fast width
        sym = slow.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid huffman code in entropy stream")


def _extend(value: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the raw ``size``-bit field to a signed coeff."""
    if size == 0:
        return 0
    if value < (1 << (size - 1)):
        return value - (1 << size) + 1
    return value


def decode_jpeg(content: bytes) -> np.ndarray:
    """Decode baseline-JPEG bytes -> HxWx3 uint8 RGB (grayscale replicated).

    Raises NotImplementedError for progressive/arithmetic streams and
    ValueError for malformed ones.
    """
    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict[tuple[int, int], int]] = {}
    huff_ac: dict[int, dict[tuple[int, int], int]] = {}
    frame = None  # (h, w, components) where component = (cid, hs, vs, tq)
    restart_interval = 0
    scan_pos = None
    scan_comps: list[tuple[int, int, int]] = []  # (comp_index, dc_id, ac_id)

    while pos + 4 <= len(content):
        if content[pos] != 0xFF:
            pos += 1
            continue
        marker = content[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI with no scan
            break
        seglen = struct.unpack(">H", content[pos + 2 : pos + 4])[0]
        seg = content[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[i : i + 64], dtype=np.uint8).astype(np.int64)
                    i += 64
                else:
                    tbl = np.frombuffer(seg[i : i + 128], dtype=">u2").astype(np.int64)
                    i += 128
                q = np.zeros(64, dtype=np.int64)
                q[ZIGZAG] = tbl
                quant[tq] = q.reshape(8, 8)
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1 baseline(+extended) huffman
            precision = seg[0]
            if precision != 8:
                raise NotImplementedError(f"{precision}-bit JPEG not supported")
            h = struct.unpack(">H", seg[1:3])[0]
            w = struct.unpack(">H", seg[3:5])[0]
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
        elif marker == 0xC2:  # progressive — dedicated multi-scan decoder
            return _decode_progressive(content)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("only baseline/progressive huffman JPEG (SOF0/1/2) is supported")
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                nvals = sum(bits)
                vals = list(seg[i + 17 : i + 17 + nvals])
                table = _build_decode_table(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = table
                i += 17 + nvals
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[0:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            cids = [c[0] for c in frame[2]]
            if ns < len(cids):
                # Legal non-interleaved multi-scan baseline (ns < ncomp):
                # decoding only the first scan would leave the remaining
                # planes zero (heavily tinted image). Gate honestly instead.
                raise NotImplementedError(
                    f"non-interleaved multi-scan baseline JPEG (first SOS covers "
                    f"{ns}/{len(cids)} components) is not supported"
                )
            for c in range(ns):
                cs, tda = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_comps.append((cids.index(cs), tda >> 4, tda & 0x0F))
            scan_pos = pos + 2 + seglen
            break
        pos += 2 + seglen

    if frame is None or scan_pos is None:
        raise ValueError("JPEG missing SOF/SOS")
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h

    planes = [
        np.zeros((mcus_y * c[2] * 8, mcus_x * c[1] * 8), dtype=np.float64) for c in comps
    ]
    reader = _BitReader(content, scan_pos)
    dc_pred = [0] * len(comps)
    mcu_index = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                reader.align_to_marker()
                m = reader.data[reader.pos + 1] if reader.pos + 1 < len(reader.data) else 0
                if 0xD0 <= m <= 0xD7:
                    reader.pos += 2
                dc_pred = [0] * len(comps)
            for ci, dc_id, ac_id in scan_comps:
                _, hs, vs, tq = comps[ci]
                for by in range(vs):
                    for bx in range(hs):
                        blk = np.zeros(64, dtype=np.int64)
                        size = _huff_decode(reader, huff_dc[dc_id])
                        diff = _extend(reader.read_bits(size), size)
                        dc_pred[ci] += diff
                        blk[0] = dc_pred[ci]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(reader, huff_ac[ac_id])
                            run, size = rs >> 4, rs & 0x0F
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("AC coefficient index out of range")
                            blk[k] = _extend(reader.read_bits(size), size)
                            k += 1
                        coeffs = np.zeros(64, dtype=np.float64)
                        coeffs[ZIGZAG] = blk
                        coeffs = coeffs.reshape(8, 8) * quant[tq]
                        spatial = _C.T @ coeffs @ _C + 128.0
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = spatial
            mcu_index += 1

    # upsample each plane to full MCU-grid resolution, crop to (h, w)
    full = []
    for (cid, hs, vs, tq), plane in zip(comps, planes):
        if hs != hmax or vs != vmax:
            plane = np.repeat(np.repeat(plane, vmax // vs, axis=0), hmax // hs, axis=1)
        full.append(plane[:h, :w])

    if len(full) == 1:
        y = np.clip(full[0], 0, 255).astype(np.uint8)
        return np.repeat(y[..., None], 3, axis=2)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


def _scale_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-style quality scaling (public IJG formula)."""
    quality = min(max(quality, 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int64)


def _size_of(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _encode_block(
    writer: _BitWriter,
    block: np.ndarray,
    q: np.ndarray,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
    dc_pred: int,
) -> int:
    coeffs = _C @ (block - 128.0) @ _C.T
    quantized = np.round(coeffs / q).astype(np.int64)
    zz = quantized.reshape(-1)[ZIGZAG]
    dc = int(zz[0])
    diff = dc - dc_pred
    size = _size_of(diff)
    code, length = dc_codes[size]
    writer.write(code, length)
    if size:
        writer.write(diff if diff > 0 else diff + (1 << size) - 1, size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if k > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]
            writer.write(code, length)
            run -= 16
        size = _size_of(v)
        code, length = ac_codes[(run << 4) | size]
        writer.write(code, length)
        writer.write(v if v > 0 else v + (1 << size) - 1, size)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        writer.write(code, length)
    return dc


def encode_jpeg(
    arr: np.ndarray, quality: int = 90, subsampling: str = "444", restart_interval: int = 0
) -> bytes:
    """Encode HxWx3 (RGB) or HxW (grayscale) uint8 -> baseline JPEG bytes
    (huffman, tables embedded). ``subsampling``: "444" (default) or "420"
    (2x2 box-mean chroma — the dominant real-world layout; exercises the
    decoder's multi-block interleaved-MCU path). ``restart_interval`` > 0
    emits DRI + RSTn markers every N MCUs (what camera firmware writes for
    error resilience — and the decoder path that needs testing)."""
    if subsampling not in ("444", "422", "420"):
        raise ValueError("subsampling must be '444', '422' or '420'")
    arr = np.asarray(arr, dtype=np.float64)
    gray = arr.ndim == 2
    if subsampling in ("420", "422") and not gray:
        if restart_interval:
            raise ValueError("restart_interval is supported on the 4:4:4 path")
        return _encode_jpeg_subsampled(arr, quality, vsub=2 if subsampling == "420" else 1)
    h, w = arr.shape[:2]
    if gray:
        planes = [arr]
    else:
        r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]

    ql = _scale_quant(QUANT_LUMA, quality)
    qc = _scale_quant(QUANT_CHROMA, quality)
    quant_for = [ql] + [qc] * (len(planes) - 1)

    out = bytearray(b"\xff\xd8")  # SOI
    # DQT (luma, and chroma when color)
    for tq, q in enumerate([ql] if gray else [ql, qc]):
        zz = q.reshape(-1)[ZIGZAG].astype(np.uint8)
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + zz.tobytes()
    # SOF0
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for c in range(ncomp):
        sof += bytes([c + 1, 0x11, 0 if c == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    # DHT x4 (or x2 for grayscale)
    tables = [(0x00, DC_LUMA_BITS, DC_LUMA_VALS), (0x10, AC_LUMA_BITS, AC_LUMA_VALS)]
    if not gray:
        tables += [(0x01, DC_CHROMA_BITS, DC_CHROMA_VALS), (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS)]
    for tid, bits, vals in tables:
        payload = bytes([tid]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    sos = bytes([ncomp])
    for c in range(ncomp):
        sos += bytes([c + 1, 0x00 if c == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    dc_l = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
    codes_for = [(dc_l, ac_l)] + [(dc_c, ac_c)] * (len(planes) - 1)

    # pad each plane to 8-multiples via edge replication (encoder's choice;
    # decoders crop to SOF dims)
    blocks_y = (h + 7) // 8
    blocks_x = (w + 7) // 8
    padded = []
    for p in planes:
        pp = np.pad(p, ((0, blocks_y * 8 - h), (0, blocks_x * 8 - w)), mode="edge")
        padded.append(pp)

    writer = _BitWriter()
    dc_pred = [0] * len(planes)
    mcu_index = 0
    # 4:4:4 -> MCU == one 8x8 block per component, interleaved
    for by in range(blocks_y):
        for bx in range(blocks_x):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                writer.flush()  # pad to byte boundary before the marker
                writer.out += bytes([0xFF, 0xD0 + ((mcu_index // restart_interval - 1) % 8)])
                dc_pred = [0] * len(planes)
            for ci, plane in enumerate(padded):
                block = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                dc_pred[ci] = _encode_block(
                    writer, block, quant_for[ci], codes_for[ci][0], codes_for[ci][1], dc_pred[ci]
                )
            mcu_index += 1
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _encode_jpeg_subsampled(arr: np.ndarray, quality: int, vsub: int = 2) -> bytes:
    """Chroma-subsampled baseline encode. vsub=2 -> 4:2:0 (Y sampling 2x2,
    MCU 16x16: 4 Y blocks + Cb + Cr); vsub=1 -> 4:2:2 (Y sampling 2x1,
    MCU 16x8: 2 Y blocks + Cb + Cr). Chroma is box-mean downsampled."""
    h, w = arr.shape[:2]
    r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    mcu_h = 8 * vsub
    mcus_y, mcus_x = (h + mcu_h - 1) // mcu_h, (w + 15) // 16
    ph, pw = mcus_y * mcu_h, mcus_x * 16
    pad = lambda p: np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")  # noqa: E731
    yp = pad(y)
    cbs = pad(cb).reshape(ph // vsub, vsub, pw // 2, 2).mean(axis=(1, 3))
    crs = pad(cr).reshape(ph // vsub, vsub, pw // 2, 2).mean(axis=(1, 3))

    ql = _scale_quant(QUANT_LUMA, quality)
    qc = _scale_quant(QUANT_CHROMA, quality)

    out = bytearray(b"\xff\xd8")
    for tq, q in enumerate([ql, qc]):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + q.reshape(-1)[ZIGZAG].astype(np.uint8).tobytes()
    y_hv = 0x20 | vsub  # (2, vsub) sampling for Y
    sof = struct.pack(">BHHB", 8, h, w, 3) + bytes([1, y_hv, 0, 2, 0x11, 1, 3, 0x11, 1])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for tid, bits, vals in [
        (0x00, DC_LUMA_BITS, DC_LUMA_VALS),
        (0x10, AC_LUMA_BITS, AC_LUMA_VALS),
        (0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
        (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS),
    ]:
        payload = bytes([tid]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    dc_l = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    writer = _BitWriter()
    preds = [0, 0, 0]
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for sy in range(vsub):
                for sx in range(2):
                    y0, x0 = my * mcu_h + sy * 8, mx * 16 + sx * 8
                    preds[0] = _encode_block(writer, yp[y0 : y0 + 8, x0 : x0 + 8], ql, dc_l, ac_l, preds[0])
            cy, cx = my * 8, mx * 8
            preds[1] = _encode_block(writer, cbs[cy : cy + 8, cx : cx + 8], qc, dc_c, ac_c, preds[1])
            preds[2] = _encode_block(writer, crs[cy : cy + 8, cx : cx + 8], qc, dc_c, ac_c, preds[2])
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive (SOF2) decoder + encoder
#
# Multi-scan coefficient accumulation per ITU-T T.81 Annex G: DC/AC spectral
# selection, successive approximation (first + refinement passes), EOB runs.
# Algorithms follow the public spec (G.1.2.1-G.1.2.3) and the well-known
# libjpeg structure. The progressive encoder exists so the decoder's every
# path — DC refine, AC refine correction bits, EOBRUN buffering — is
# exercised by round-trip tests without external fixtures.


class _ScanState:
    __slots__ = ("eobrun",)

    def __init__(self) -> None:
        self.eobrun = 0


def _dc_scan_block(reader, blk, dc_table, dc_pred, ci, ah, al):
    if ah == 0:
        size = _huff_decode(reader, dc_table)
        diff = _extend(reader.read_bits(size), size)
        dc_pred[ci] += diff
        blk[0] = dc_pred[ci] << al
    else:  # refinement: one raw bit appends bit `al` of the two's complement
        if reader.read_bit():
            blk[0] |= 1 << al
    return dc_pred


def _ac_first_block(reader, blk, ac_table, ss, se, al, state):
    if state.eobrun > 0:
        state.eobrun -= 1
        return
    k = ss
    while k <= se:
        rs = _huff_decode(reader, ac_table)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            state.eobrun = (1 << r) - 1
            if r:
                state.eobrun += reader.read_bits(r)
            break
        k += r
        if k > se:
            raise ValueError("AC coefficient index out of band")
        blk[k] = _extend(reader.read_bits(s), s) << al
        k += 1


def _ac_refine_block(reader, blk, ac_table, ss, se, al, state):
    # mirrors libjpeg jdphuff decode_mcu_AC_refine; Python ints give the
    # same two's-complement & semantics as C
    p1, m1 = 1 << al, -1 << al

    def _correct(k: int) -> None:
        if reader.read_bit():
            if (blk[k] & p1) == 0:
                blk[k] += p1 if blk[k] >= 0 else m1

    # EOBRUN convention (as libjpeg): the count INCLUDES the current block;
    # every block that consumes the run — the one that read the EOBn symbol
    # and each subsequent skipped block — applies its correction tail then
    # decrements by one.
    k = ss
    if state.eobrun == 0:
        while k <= se:
            rs = _huff_decode(reader, ac_table)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r < 15:
                    state.eobrun = (1 << r) + (reader.read_bits(r) if r else 0)
                    break
                # r == 15: run of 16 zero-HISTORY coefficients
            else:
                val = p1 if reader.read_bit() else m1
            while k <= se:
                if blk[k] != 0:
                    _correct(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                blk[k] = val
            k += 1
    if state.eobrun > 0:
        while k <= se:
            if blk[k] != 0:
                _correct(k)
            k += 1
        state.eobrun -= 1


def _decode_progressive(content: bytes) -> np.ndarray:
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict[tuple[int, int], int]] = {}
    huff_ac: dict[int, dict[tuple[int, int], int]] = {}
    frame = None
    restart_interval = 0
    coefs: list[np.ndarray] | None = None  # per comp: (by, bx, 64) zigzag-order ints
    geoms: list[tuple[int, int, int, int]] = []  # per comp: padded (bh, bw), true (tbh, tbw)

    while pos + 2 <= len(content):
        if content[pos] != 0xFF:
            pos += 1
            continue
        marker = content[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:
            break
        seglen = struct.unpack(">H", content[pos + 2 : pos + 4])[0]
        seg = content[pos + 4 : pos + 2 + seglen]
        nxt = pos + 2 + seglen
        if marker == 0xDB:
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                raw = (
                    np.frombuffer(seg[i : i + 64], dtype=np.uint8).astype(np.int64)
                    if pq == 0
                    else np.frombuffer(seg[i : i + 128], dtype=">u2").astype(np.int64)
                )
                i += 64 if pq == 0 else 128
                q = np.zeros(64, dtype=np.int64)
                q[ZIGZAG] = raw
                quant[tq] = q.reshape(8, 8)
        elif marker == 0xC4:
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                nvals = sum(bits)
                table = _build_decode_table(bits, list(seg[i + 17 : i + 17 + nvals]))
                (huff_dc if tc == 0 else huff_ac)[th] = table
                i += 17 + nvals
        elif marker == 0xDD:
            restart_interval = struct.unpack(">H", seg[0:2])[0]
        elif marker == 0xC2:
            if seg[0] != 8:
                raise NotImplementedError("12-bit progressive JPEG not supported")
            h = struct.unpack(">H", seg[1:3])[0]
            w = struct.unpack(">H", seg[3:5])[0]
            comps = []
            for c in range(seg[5]):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
            mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
            coefs = []
            for _, hs, vs, _ in comps:
                bh, bw = mcus_y * vs, mcus_x * hs  # padded (interleaved) grid
                cw = (w * hs + hmax - 1) // hmax
                ch = (h * vs + vmax - 1) // vmax
                tbh, tbw = (ch + 7) // 8, (cw + 7) // 8  # true grid
                coefs.append(np.zeros((bh, bw, 64), dtype=np.int64))
                geoms.append((bh, bw, tbh, tbw))
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("mixed/unsupported frame type inside progressive decode")
        elif marker == 0xDA:
            if frame is None or coefs is None:
                raise ValueError("SOS before SOF2")
            h, w, comps = frame
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            ns = seg[0]
            cids = [c[0] for c in comps]
            sc = []
            for c in range(ns):
                cs, tda = seg[1 + 2 * c], seg[2 + 2 * c]
                sc.append((cids.index(cs), tda >> 4, tda & 0x0F))
            ss_, se_, a = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            ah, al = a >> 4, a & 0x0F
            reader = _BitReader(content, nxt)
            state = _ScanState()
            dc_pred = [0] * len(comps)
            unit = 0  # MCU (interleaved) / block (non-interleaved) counter

            def _restart_if_due() -> None:
                nonlocal dc_pred
                if restart_interval and unit and unit % restart_interval == 0:
                    reader.align_to_marker()
                    m = reader.data[reader.pos + 1] if reader.pos + 1 < len(reader.data) else 0
                    if 0xD0 <= m <= 0xD7:
                        reader.pos += 2
                    dc_pred[:] = [0] * len(comps)
                    state.eobrun = 0

            if len(sc) > 1:  # interleaved — DC scans only, per spec
                if ss_ != 0:
                    raise ValueError("interleaved progressive AC scan is illegal")
                mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
                mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
                for my in range(mcus_y):
                    for mx in range(mcus_x):
                        _restart_if_due()
                        for ci, dc_id, _ in sc:
                            _, hs, vs, _tq = comps[ci]
                            for by in range(vs):
                                for bx in range(hs):
                                    blk = coefs[ci][my * vs + by, mx * hs + bx]
                                    _dc_scan_block(reader, blk, huff_dc.get(dc_id, {}), dc_pred, ci, ah, al)
                        unit += 1
            else:
                ci, dc_id, ac_id = sc[0]
                _, _, tbh, tbw = geoms[ci]
                for by in range(tbh):
                    for bx in range(tbw):
                        _restart_if_due()
                        blk = coefs[ci][by, bx]
                        if ss_ == 0:
                            _dc_scan_block(reader, blk, huff_dc.get(dc_id, {}), dc_pred, ci, ah, al)
                        elif ah == 0:
                            _ac_first_block(reader, blk, huff_ac[ac_id], ss_, se_, al, state)
                        else:
                            _ac_refine_block(reader, blk, huff_ac[ac_id], ss_, se_, al, state)
                        unit += 1
            reader.align_to_marker()
            pos = reader.pos
            continue
        pos = nxt

    if frame is None or coefs is None:
        raise ValueError("progressive JPEG missing SOF2/SOS")
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    planes = []
    for ci, (_, hs, vs, tq) in enumerate(comps):
        bh, bw, _, _ = geoms[ci]
        plane = np.zeros((bh * 8, bw * 8), dtype=np.float64)
        q = quant[tq]
        for by in range(bh):
            for bx in range(bw):
                cz = np.zeros(64, dtype=np.float64)
                cz[ZIGZAG] = coefs[ci][by, bx]
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = _C.T @ (cz.reshape(8, 8) * q) @ _C + 128.0
        if hs != hmax or vs != vmax:
            plane = np.repeat(np.repeat(plane, vmax // vs, axis=0), hmax // hs, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        y = np.clip(planes[0], 0, 255).astype(np.uint8)
        return np.repeat(y[..., None], 3, axis=2)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


# Progressive AC scans emit EOBn symbols (r<<4, r=1..14) that the Annex K
# baseline tables don't define, so the progressive encoder ships a "flat"
# AC table covering ALL 256 symbols: 255 codes of length 8 + 1 of length 9
# (canonical order keeps the all-ones code word unassigned, as T.81 C.2
# requires). ~0.5 bit/symbol worse than an optimized table — irrelevant for
# fixture generation, and decoders just read whatever DHT declares.
FLAT_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0, 0]
FLAT_AC_VALS = list(range(255)) + [255]


class _RefineWriter:
    """Bit emission for progressive scans: symbols via huffman codes, plus
    the EOBRUN + buffered-correction-bit discipline of Annex G encoders."""

    def __init__(self, writer: _BitWriter, ac_codes: dict[int, tuple[int, int]]):
        self.w = writer
        self.ac = ac_codes
        self.eobrun = 0
        self.bits: list[int] = []  # correction bits buffered during an EOB run

    def emit_eobrun(self) -> None:
        if self.eobrun > 0:
            r = self.eobrun.bit_length() - 1
            code, length = self.ac[r << 4]
            self.w.write(code, length)
            if r:
                self.w.write(self.eobrun - (1 << r), r)
            self.eobrun = 0
        for b in self.bits:
            self.w.write(b, 1)
        self.bits = []


def _encode_dc_first(writer, dc_codes, vals, preds, ci, al):
    v = int(vals) >> al  # arithmetic shift: DC point transform per G.1.2.1
    diff = v - preds[ci]
    preds[ci] = v
    size = _size_of(diff)
    code, length = dc_codes[size]
    writer.write(code, length)
    if size:
        writer.write(diff if diff > 0 else diff + (1 << size) - 1, size)


def _encode_ac_first(rw: _RefineWriter, band, al) -> None:
    """One block's AC first-pass scan (Ah=0) with EOBRUN accumulation."""
    shifted = [(0 if c == 0 else (abs(int(c)) >> al) * (1 if c > 0 else -1)) for c in band]
    last_nz = max((i for i, v in enumerate(shifted) if v != 0), default=-1)
    if last_nz < 0:
        rw.eobrun += 1
        if rw.eobrun == 0x7FFF:
            rw.emit_eobrun()
        return
    rw.emit_eobrun()
    run = 0
    for i in range(last_nz + 1):
        v = shifted[i]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = rw.ac[0xF0]
            rw.w.write(code, length)
            run -= 16
        size = _size_of(v)
        code, length = rw.ac[(run << 4) | size]
        rw.w.write(code, length)
        rw.w.write(v if v > 0 else v + (1 << size) - 1, size)
        run = 0
    if last_nz < len(band) - 1:
        rw.eobrun += 1
        if rw.eobrun == 0x7FFF:
            rw.emit_eobrun()


def _encode_ac_refine(rw: _RefineWriter, band, al) -> None:
    """One block's AC refinement scan (Ah=Al+1, emitting bit Al) — the
    buffered-correction-bit algorithm of Annex G / libjpeg jcphuff."""
    absv = [abs(int(c)) >> al for c in band]
    eob = max((i for i, t in enumerate(absv) if t == 1), default=-1)
    run = 0
    pend: list[int] = []  # correction bits awaiting the next emitted symbol
    for i, t in enumerate(absv):
        if t == 0:
            run += 1
            continue
        # ZRLs (unless foldable into the EOB) are emitted at ANY nonzero —
        # including correction-bit coefficients — so the buffered correction
        # bits stay interleaved exactly as the decoder's walk consumes them
        while run > 15 and i <= eob:
            rw.emit_eobrun()
            code, length = rw.ac[0xF0]
            rw.w.write(code, length)
            run -= 16
            for b in pend:
                rw.w.write(b, 1)
            pend = []
        if t > 1:  # previously significant: correction bit, run unaffected
            pend.append(absv[i] & 1)
            continue
        # newly significant (t == 1)
        rw.emit_eobrun()
        code, length = rw.ac[(run << 4) | 1]
        rw.w.write(code, length)
        rw.w.write(1 if band[i] > 0 else 0, 1)
        for b in pend:
            rw.w.write(b, 1)
        pend = []
        run = 0
    if run > 0 or pend:
        rw.eobrun += 1
        rw.bits.extend(pend)
        if rw.eobrun == 0x7FFF:
            rw.emit_eobrun()


def encode_jpeg_progressive(arr: np.ndarray, quality: int = 90, restart_interval: int = 0) -> bytes:
    """Encode HxWx3 / HxW uint8 as a PROGRESSIVE (SOF2) JPEG, 4:4:4.

    Scan script (exercises every Annex G decoder path):
      1. DC, interleaved, Al=1        3. DC refinement (raw bits), Al=0
      2. AC 1..63 per comp, Al=1      4. AC refinement per comp, Al=0

    ``restart_interval`` > 0 emits RSTn every N MCUs in every scan (with the
    per-scan EOBRUN + predictor reset the spec requires).
    """
    arr = np.asarray(arr, dtype=np.float64)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if gray:
        planes = [arr]
    else:
        r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    ql = _scale_quant(QUANT_LUMA, quality)
    qc = _scale_quant(QUANT_CHROMA, quality)
    quant_for = [ql] + [qc] * (len(planes) - 1)

    blocks_y, blocks_x = (h + 7) // 8, (w + 7) // 8
    zz_blocks: list[list[np.ndarray]] = []  # per comp: zigzag coef arrays
    for ci, p in enumerate(planes):
        pp = np.pad(p, ((0, blocks_y * 8 - h), (0, blocks_x * 8 - w)), mode="edge")
        blks = []
        for by in range(blocks_y):
            for bx in range(blocks_x):
                block = pp[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                qz = np.round((_C @ (block - 128.0) @ _C.T) / quant_for[ci]).astype(np.int64)
                blks.append(qz.reshape(-1)[ZIGZAG])
        zz_blocks.append(blks)

    out = bytearray(b"\xff\xd8")
    for tq, q in enumerate([ql] if gray else [ql, qc]):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + q.reshape(-1)[ZIGZAG].astype(np.uint8).tobytes()
    ncomp = len(planes)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for c in range(ncomp):
        sof += bytes([c + 1, 0x11, 0 if c == 0 else 1])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof
    tables = [(0x00, DC_LUMA_BITS, DC_LUMA_VALS), (0x10, FLAT_AC_BITS, FLAT_AC_VALS)]
    if not gray:
        tables += [(0x01, DC_CHROMA_BITS, DC_CHROMA_VALS), (0x11, FLAT_AC_BITS, FLAT_AC_VALS)]
    for tid, bits, vals in tables:
        payload = bytes([tid]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload

    dc_l = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    dc_c = _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    flat = _canonical_codes(FLAT_AC_BITS, FLAT_AC_VALS)
    dc_for = [dc_l] + [dc_c] * (ncomp - 1)
    ac_for = [flat] * ncomp

    def _sos(comps: list[int], ss, se, ah, al) -> bytes:
        body = bytes([len(comps)])
        for ci in comps:
            body += bytes([ci + 1, (0x00 if ci == 0 else 0x11) if ss == 0 else (0x00 if ci == 0 else 0x11)])
        body += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body

    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    rst_counter = [0]  # marker index shared across restarts within a scan

    def _maybe_restart(wtr: _BitWriter, unit: int, rw: "_RefineWriter | None", preds: list | None) -> None:
        if restart_interval and unit and unit % restart_interval == 0:
            if rw is not None:
                rw.emit_eobrun()  # EOBRUN must not span a restart
            wtr.flush()
            wtr.out += bytes([0xFF, 0xD0 + (rst_counter[0] % 8)])
            rst_counter[0] += 1
            if preds is not None:
                preds[:] = [0] * len(preds)

    # scan 1: DC first, interleaved, Al=1
    out += _sos(list(range(ncomp)), 0, 0, 0, 1)
    wtr = _BitWriter()
    preds = [0] * ncomp
    rst_counter[0] = 0
    for bi in range(blocks_y * blocks_x):
        _maybe_restart(wtr, bi, None, preds)
        for ci in range(ncomp):
            _encode_dc_first(wtr, dc_for[ci], zz_blocks[ci][bi][0], preds, ci, 1)
    wtr.flush()
    out += wtr.out
    # scan 2: AC first per comp, Al=1
    for ci in range(ncomp):
        out += _sos([ci], 1, 63, 0, 1)
        wtr = _BitWriter()
        rw = _RefineWriter(wtr, ac_for[ci])
        rst_counter[0] = 0
        for bi, blk in enumerate(zz_blocks[ci]):
            _maybe_restart(wtr, bi, rw, None)
            _encode_ac_first(rw, blk[1:], 1)
        rw.emit_eobrun()
        wtr.flush()
        out += wtr.out
    # scan 3: DC refinement, raw bits, Al=0
    out += _sos(list(range(ncomp)), 0, 0, 1, 0)
    wtr = _BitWriter()
    rst_counter[0] = 0
    for bi in range(blocks_y * blocks_x):
        _maybe_restart(wtr, bi, None, None)
        for ci in range(ncomp):
            wtr.write(int(zz_blocks[ci][bi][0]) & 1, 1)
    wtr.flush()
    out += wtr.out
    # scan 4: AC refinement per comp, Al=0
    for ci in range(ncomp):
        out += _sos([ci], 1, 63, 1, 0)
        wtr = _BitWriter()
        rw = _RefineWriter(wtr, ac_for[ci])
        rst_counter[0] = 0
        for bi, blk in enumerate(zz_blocks[ci]):
            _maybe_restart(wtr, bi, rw, None)
            _encode_ac_refine(rw, blk[1:], 0)
        rw.emit_eobrun()
        wtr.flush()
        out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)
