"""Pure-stdlib FLAC codec (decode + encode) for the multimodal asset reader.

Follows the published format spec (RFC 9639 / xiph.org FLAC format): metadata
blocks, frame headers with UTF-8-coded frame numbers and CRC-8, subframe
types CONSTANT / VERBATIM / FIXED(0-4) / LPC(1-32), partitioned Rice residual
coding (methods 0 and 1, escape partitions), wasted bits, and the four
stereo decorrelation modes (independent, left/side, right/side, mid/side),
frame CRC-16 and STREAMINFO MD5 verification.

The encoder emits a spec-conforming subset used by the round-trip tests:
fixed blocking, independent channels, CONSTANT / VERBATIM / FIXED subframes
with single-partition Rice residuals — enough to exercise every decoder path
except LPC (LPC frames are exercised by hand-built bitstreams in tests).

Like the JPEG/GIF codecs this is the zero-dependency fallback: at 100 TB a
native decoder (soundfile/libFLAC) is preferred when importable — see
``decode_audio`` in multimodal.py. FLAC decode is inherently serial per file;
parallelism comes from Spark partitioning over files, not intra-file.

Reference parity note: the reference's own audio reader is entirely commented
out (src/bears/reader/asset/audio/TorchAudioReader.py:1-9), so this whole
module is beyond-reference capability.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

FLAC_MAGIC = b"fLaC"

_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


# --------------------------------------------------------------------------
# CRCs (spec polynomials; computed over raw header/frame bytes)


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


# --------------------------------------------------------------------------
# Bit-level IO


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        while n > 0:
            if self.byte >= len(self.data):
                raise ValueError("FLAC: unexpected end of stream")
            avail = 8 - self.bit
            take = min(n, avail)
            cur = self.data[self.byte]
            v = (v << take) | ((cur >> (avail - take)) & ((1 << take) - 1))
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
            n -= take
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        n = 0
        while self.read(1) == 0:
            n += 1
        return n

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, value: int, n: int) -> None:
        self.write(value & ((1 << n) - 1), n)

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a 1

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


# --------------------------------------------------------------------------
# UTF-8-style coded numbers (frame header sample/frame index)


def _utf8_encode_num(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    for nbytes, first_max in ((2, 0x7FF), (3, 0xFFFF), (4, 0x1FFFFF), (5, 0x3FFFFFF), (6, 0x7FFFFFFF)):
        if n <= first_max:
            out = bytearray(nbytes)
            for i in range(nbytes - 1, 0, -1):
                out[i] = 0x80 | (n & 0x3F)
                n >>= 6
            # prefix byte: nbytes leading ones, a zero, then the top bits
            out[0] = (((1 << nbytes) - 1) << (8 - nbytes)) | n
            return bytes(out)
    raise ValueError("frame number too large")


def _utf8_decode_num(r: _BitReader) -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("FLAC: bad UTF-8 coded number")
    v = b0 & (0xFF >> (nbytes + 1))
    for _ in range(nbytes - 1):
        c = r.read(8)
        if (c & 0xC0) != 0x80:
            raise ValueError("FLAC: bad UTF-8 continuation")
        v = (v << 6) | (c & 0x3F)
    return v


# --------------------------------------------------------------------------
# Decoder


def _read_residual(r: _BitReader, block_size: int, predictor_order: int) -> list[int]:
    method = r.read(2)
    if method > 1:
        raise ValueError("FLAC: reserved residual coding method")
    param_bits, escape = (4, 0xF) if method == 0 else (5, 0x1F)
    part_order = r.read(4)
    n_parts = 1 << part_order
    if block_size % n_parts or (block_size >> part_order) <= predictor_order and n_parts > 1:
        # spec: block size must be divisible; first partition shortened by order
        pass
    out: list[int] = []
    for p in range(n_parts):
        n = (block_size >> part_order) - (predictor_order if p == 0 else 0)
        if n < 0:
            raise ValueError("FLAC: invalid partition layout")
        param = r.read(param_bits)
        if param == escape:
            raw_bits = r.read(5)
            if raw_bits == 0:
                out.extend([0] * n)
            else:
                out.extend(r.read_signed(raw_bits) for _ in range(n))
        else:
            for _ in range(n):
                q = r.read_unary()
                u = (q << param) | r.read(param) if param else q
                out.append((u >> 1) ^ -(u & 1))  # unfold zigzag
    return out


def _decode_subframe(r: _BitReader, block_size: int, bps: int) -> np.ndarray:
    if r.read(1):
        raise ValueError("FLAC: subframe padding bit set")
    stype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = 1 + r.read_unary()
        bps -= wasted
    if stype == 0:  # CONSTANT
        v = r.read_signed(bps)
        out = np.full(block_size, v, dtype=np.int64)
    elif stype == 1:  # VERBATIM
        out = np.fromiter((r.read_signed(bps) for _ in range(block_size)), dtype=np.int64, count=block_size)
    elif 8 <= stype <= 12:  # FIXED order 0-4
        order = stype - 8
        warm = [r.read_signed(bps) for _ in range(order)]
        resid = _read_residual(r, block_size, order)
        coeffs = _FIXED_COEFFS[order]
        samples = list(warm)
        for e in resid:
            pred = sum(c * samples[-1 - j] for j, c in enumerate(coeffs))
            samples.append(e + pred)
        out = np.asarray(samples, dtype=np.int64)
    elif stype >= 32:  # LPC order 1-32
        order = stype - 31
        warm = [r.read_signed(bps) for _ in range(order)]
        precision = r.read(4) + 1
        if precision == 16:
            raise ValueError("FLAC: invalid LPC precision")
        shift = r.read_signed(5)
        if shift < 0:
            raise ValueError("FLAC: negative LPC shift")
        coeffs = [r.read_signed(precision) for _ in range(order)]
        resid = _read_residual(r, block_size, order)
        samples = list(warm)
        for e in resid:
            pred = sum(c * samples[-1 - j] for j, c in enumerate(coeffs)) >> shift
            samples.append(e + pred)
        out = np.asarray(samples, dtype=np.int64)
    else:
        raise ValueError(f"FLAC: reserved subframe type {stype}")
    if wasted:
        out = out << wasted
    return out


_BLOCKSIZE_TABLE = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096, 13: 8192, 14: 16384, 15: 32768}
_RATE_TABLE = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050, 7: 24000,
               8: 32000, 9: 44100, 10: 48000, 11: 96000}
_BPS_TABLE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def decode_flac(data: bytes, verify_md5: bool = True) -> tuple[np.ndarray, int, int]:
    """Decode a FLAC stream -> (samples int32 [frames, channels],
    sample_rate, bits_per_sample). Verifies frame CRC-16s and (optionally)
    the STREAMINFO MD5 of the decoded PCM."""
    if data[:4] != FLAC_MAGIC:
        raise ValueError("not a FLAC stream")
    pos = 4
    streaminfo = None
    while True:
        hdr = data[pos : pos + 4]
        if len(hdr) < 4:
            raise ValueError("FLAC: truncated metadata")
        last = hdr[0] >> 7
        btype = hdr[0] & 0x7F
        length = int.from_bytes(hdr[1:4], "big")
        body = data[pos + 4 : pos + 4 + length]
        if btype == 0:
            if length < 34:
                raise ValueError("FLAC: short STREAMINFO")
            r = _BitReader(body)
            r.read(16)  # min block
            r.read(16)  # max block
            r.read(24)  # min frame
            r.read(24)  # max frame
            rate = r.read(20)
            channels = r.read(3) + 1
            bps = r.read(5) + 1
            total = r.read(36)
            md5 = body[18:34]
            streaminfo = (rate, channels, bps, total, md5)
        pos += 4 + length
        if last:
            break
    if streaminfo is None:
        raise ValueError("FLAC: missing STREAMINFO")
    rate, channels, bps, total_samples, want_md5 = streaminfo

    chans: list[list[int]] = [[] for _ in range(channels)]
    while pos < len(data):
        r = _BitReader(data, pos)
        sync = r.read(14)
        if sync != 0x3FFE:
            raise ValueError("FLAC: lost frame sync")
        if r.read(1):
            raise ValueError("FLAC: reserved frame bit")
        r.read(1)  # blocking strategy
        bs_code = r.read(4)
        rate_code = r.read(4)
        ch_code = r.read(4)
        bps_code = r.read(3)
        if r.read(1):
            raise ValueError("FLAC: reserved frame bit 2")
        _utf8_decode_num(r)
        if bs_code == 6:
            block_size = r.read(8) + 1
        elif bs_code == 7:
            block_size = r.read(16) + 1
        elif bs_code in _BLOCKSIZE_TABLE:
            block_size = _BLOCKSIZE_TABLE[bs_code]
        else:
            raise ValueError("FLAC: reserved block size code")
        if rate_code == 12:
            r.read(8)
        elif rate_code in (13, 14):
            r.read(16)
        elif rate_code != 0 and rate_code not in _RATE_TABLE:
            raise ValueError("FLAC: invalid sample rate code")
        frame_bps = bps if bps_code == 0 else _BPS_TABLE[bps_code]
        r.align()
        crc8_val = r.read(8)
        if _crc8(data[pos : r.byte - 1]) != crc8_val:
            raise ValueError("FLAC: frame header CRC-8 mismatch")

        if ch_code < 8:
            n_ch = ch_code + 1
            subs = [_decode_subframe(r, block_size, frame_bps) for _ in range(n_ch)]
        elif ch_code in (8, 9, 10):
            n_ch = 2
            if ch_code == 8:  # left/side
                left = _decode_subframe(r, block_size, frame_bps)
                side = _decode_subframe(r, block_size, frame_bps + 1)
                subs = [left, left - side]
            elif ch_code == 9:  # right/side
                side = _decode_subframe(r, block_size, frame_bps + 1)
                right = _decode_subframe(r, block_size, frame_bps)
                subs = [right + side, right]
            else:  # mid/side
                mid = _decode_subframe(r, block_size, frame_bps)
                side = _decode_subframe(r, block_size, frame_bps + 1)
                left = (((mid << 1) | (side & 1)) + side) >> 1
                subs = [left, left - side]
        else:
            raise ValueError("FLAC: reserved channel assignment")
        if n_ch != channels:
            raise ValueError("FLAC: channel count change mid-stream")
        r.align()
        crc = r.read(16)
        if _crc16(data[pos : r.byte - 2]) != crc:
            raise ValueError("FLAC: frame CRC-16 mismatch")
        for c in range(channels):
            chans[c].extend(int(v) for v in subs[c])
        pos = r.byte

    n = total_samples or len(chans[0])
    out = np.zeros((n, channels), dtype=np.int32)
    for c in range(channels):
        out[:, c] = np.asarray(chans[c][:n], dtype=np.int32)
    if verify_md5 and want_md5 != b"\x00" * 16:
        if _pcm_md5(out, bps) != want_md5:
            raise ValueError("FLAC: decoded PCM MD5 mismatch")
    return out, rate, bps


def _pcm_md5(samples: np.ndarray, bps: int) -> bytes:
    nbytes = (bps + 7) // 8
    inter = samples.astype(np.int64).reshape(-1)
    raw = bytearray()
    for v in inter:
        raw += int(v).to_bytes(nbytes, "little", signed=True)
    return hashlib.md5(bytes(raw)).digest()


# --------------------------------------------------------------------------
# Encoder (CONSTANT / VERBATIM / FIXED subframes, single-partition Rice)


def _best_fixed_order(x: np.ndarray, max_order: int = 4) -> int:
    best, best_cost = 0, None
    resid = x.astype(np.int64)
    for order in range(max_order + 1):
        if order > 0:
            resid = np.diff(resid)
        if len(resid) == 0:
            break
        cost = int(np.abs(resid).sum())
        if best_cost is None or cost < best_cost:
            best, best_cost = order, cost
    return best


def _rice_param(resid: np.ndarray) -> int:
    if len(resid) == 0:
        return 0
    mean = float(np.abs(resid).mean())
    k = 0
    while (1 << k) < mean and k < 14:
        k += 1
    return k


def _write_residual(w: _BitWriter, resid: np.ndarray) -> None:
    w.write(0, 2)  # method 0: 4-bit Rice params
    w.write(0, 4)  # partition order 0 -> single partition
    folded = np.where(resid >= 0, resid.astype(np.int64) << 1, ((-resid.astype(np.int64)) << 1) - 1)
    # escape to raw if Rice would blow up (quotients too large)
    k = _rice_param(resid)
    max_q = int(folded.max() >> k) if len(folded) else 0
    if max_q > 1000:
        bits = max(int(v).bit_length() for v in np.abs(resid)) + 1 if len(resid) else 1
        bits = min(bits, 31)
        w.write(0xF, 4)  # escape
        w.write(bits, 5)
        for v in resid:
            w.write_signed(int(v), bits)
        return
    w.write(k, 4)
    for u in folded:
        q, rem = int(u) >> k, int(u) & ((1 << k) - 1)
        w.write_unary(q)
        if k:
            w.write(rem, k)


def _encode_subframe(w: _BitWriter, x: np.ndarray, bps: int, method: str) -> None:
    w.write(0, 1)  # padding
    if method == "constant" or (method == "fixed" and len(np.unique(x)) == 1):
        w.write(0, 6)
        w.write(0, 1)  # no wasted bits
        w.write_signed(int(x[0]), bps)
        return
    if method == "verbatim":
        w.write(1, 6)
        w.write(0, 1)
        for v in x:
            w.write_signed(int(v), bps)
        return
    order = _best_fixed_order(x)
    w.write(8 + order, 6)
    w.write(0, 1)
    xx = x.astype(np.int64)
    for i in range(order):
        w.write_signed(int(xx[i]), bps)
    resid = xx.copy()
    for _ in range(order):
        resid = np.diff(resid)
    _write_residual(w, resid)


def encode_flac(
    samples: np.ndarray,
    sample_rate: int,
    bits_per_sample: int = 16,
    block_size: int = 4096,
    method: str = "fixed",
) -> bytes:
    """Encode int PCM [frames, channels] (or [frames]) as a FLAC stream.
    ``method``: 'fixed' (per-block best fixed predictor + Rice), 'verbatim',
    or 'constant' (only for constant signals)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, channels = samples.shape
    if channels > 8:
        raise ValueError("FLAC supports at most 8 channels")
    lo, hi = -(1 << (bits_per_sample - 1)), (1 << (bits_per_sample - 1)) - 1
    if samples.min() < lo or samples.max() > hi:
        raise ValueError("samples out of range for bits_per_sample")

    frames = bytearray()
    for fi, start in enumerate(range(0, n, block_size)):
        blk = samples[start : start + block_size]
        bs = len(blk)
        w = _BitWriter()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed blocking
        w.write(7, 4)  # 16-bit block size - 1 at end of header
        w.write(0, 4)  # sample rate from STREAMINFO
        w.write(channels - 1, 4)  # independent channels
        bps_code = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bits_per_sample]
        w.write(bps_code, 3)
        w.write(0, 1)
        for b in _utf8_encode_num(fi):
            w.write(b, 8)
        w.write(bs - 1, 16)
        w.align()
        hdr = w.bytes()
        frame = bytearray(hdr)
        frame.append(_crc8(hdr))
        w2 = _BitWriter()
        for c in range(channels):
            _encode_subframe(w2, blk[:, c], bits_per_sample, method)
        w2.align()
        frame += w2.bytes()
        frame += struct.pack(">H", _crc16(bytes(frame)))
        frames += frame

    si = _BitWriter()
    si.write(block_size, 16)  # min/max block size (last-block exemption per spec)
    si.write(block_size, 16)
    si.write(0, 24)  # min frame size unknown
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(bits_per_sample - 1, 5)
    si.write(n, 36)
    si.align()
    streaminfo = si.bytes() + _pcm_md5(samples, bits_per_sample)
    header = FLAC_MAGIC + bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo
    return header + bytes(frames)
