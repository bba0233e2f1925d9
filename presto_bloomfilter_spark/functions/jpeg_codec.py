"""Minimal pure-stdlib baseline JPEG (JFIF) codec — struct + numpy only.

The sibling of ``png_codec``: exists so the multimodal "real decode"
path covers the dominant crawl image format in containers without
Pillow.  Scope is baseline sequential DCT (SOF0), 8-bit, grayscale or
YCbCr with 4:4:4 / 4:2:2 / 4:2:0 subsampling, restart intervals, and
standard or custom huffman/quant tables; progressive (SOF2) and
arithmetic coding raise a clear ValueError.  When Pillow IS present,
``operators/multimodal.py`` prefers it — this module is the
dependency-free fallback, correctness-first (the huffman bit loop is
Python; fine for gate fixtures and thumbnails, not a bulk decoder).

Format reference: the public JPEG standard (ITU-T T.81 / ISO 10918-1)
and the JFIF specification.  The encoder emits baseline 4:4:4 (or
grayscale) with the Annex K example tables scaled by ``quality``, which
is what lets the test suite construct fixtures without any imaging
library; encode→decode reconstruction error is bounded by the
quantization step, asserted in tests.
"""

from __future__ import annotations

import struct

import numpy as np

# ---- shared tables -----------------------------------------------------------

ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int32)

# Annex K example quantization tables (luminance, chrominance)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32)

# Annex K example huffman tables: (bits[1..16], values)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
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
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
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
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

# orthonormal 8-point DCT-II basis: A @ block @ A.T = DCT coefficients
_K = np.arange(8)
_DCT_A = np.sqrt(2.0 / 8.0) * np.cos((2 * _K[None, :] + 1) * _K[:, None] * np.pi / 16.0)
_DCT_A[0] /= np.sqrt(2.0)


def _dct2(block: np.ndarray) -> np.ndarray:
    return _DCT_A @ block @ _DCT_A.T


def _idct2(coef: np.ndarray) -> np.ndarray:
    return _DCT_A.T @ coef @ _DCT_A


def _scale_quant(table: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, int(quality)))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = np.clip((table * s + 50) // 100, 1, 255)
    return q.astype(np.int32)


# ---- bit IO ------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    un-stuffing; stops cleanly at markers (RST handled by caller)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _HitRestart()
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_and_skip_restart(self) -> None:
        self.acc = 0
        self.nbits = 0
        # the 0xFFDx marker sits at pos (possibly after fill stopped on
        # it); T.81 permits any number of 0xFF fill bytes before the
        # marker code itself
        while self.data[self.pos] != 0xFF:
            self.pos += 1
        while self.data[self.pos + 1] == 0xFF:
            self.pos += 1
        if not (0xD0 <= self.data[self.pos + 1] <= 0xD7):
            raise ValueError(
                f"expected restart marker, found 0xFF{self.data[self.pos + 1]:02X}")
        self.pos += 2


class _HitRestart(Exception):
    pass


# ---- huffman -----------------------------------------------------------------


def _build_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """value → (code, length) per T.81 C.2 canonical code assignment."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decoder(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → value lookup for the bit-serial decoder."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _decode_symbol(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        v = table.get((length, code))
        if v is not None:
            return v
    raise ValueError("invalid huffman code in scan data")


def _extend(value: int, length: int) -> int:
    """T.81 F.2.2.1 EXTEND: map unsigned bits to the signed coefficient."""
    if length == 0:
        return 0
    return value if value >= (1 << (length - 1)) else value - (1 << length) + 1


def _magnitude(v: int) -> tuple[int, int]:
    """signed value → (ssss category, unsigned bits) for encoding."""
    if v == 0:
        return 0, 0
    a = abs(v)
    n = a.bit_length()
    return n, (v if v > 0 else v + (1 << n) - 1)


# ---- encoder -----------------------------------------------------------------


def jpeg_encode(arr: np.ndarray, quality: int = 90,
                restart_interval: int = 0) -> bytes:
    """Encode a uint8 array (h, w) or (h, w, 3) as baseline JFIF JPEG
    (grayscale or YCbCr 4:4:4, Annex K tables scaled by quality).
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs — mainly so the decoder's restart path has a generator."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in (1, 3):
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, w, ch = a.shape
    if ch == 3:  # RGB → YCbCr (JFIF / BT.601 full-range)
        f = a.astype(np.float64)
        r, g, b = f[..., 0], f[..., 1], f[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        planes = [y, cb, cr]
    else:
        planes = [a[..., 0].astype(np.float64)]

    qluma = _scale_quant(QUANT_LUMA, quality)
    qchroma = _scale_quant(QUANT_CHROMA, quality)
    qtabs = [qluma] if ch == 1 else [qluma, qchroma]

    out = bytearray(b"\xFF\xD8")  # SOI
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, q in enumerate(qtabs):
        out += b"\xFF\xDB" + struct.pack(">HB", 67, tid) + bytes(q.flatten()[ZIGZAG].astype(np.uint8))
    # SOF0
    ncomp = ch
    out += b"\xFF\xC0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci in range(ncomp):
        out += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])  # no subsampling
    # DHT
    hts = [(0x00, _DC_LUMA), (0x10, _AC_LUMA)]
    if ch == 3:
        hts += [(0x01, _DC_CHROMA), (0x11, _AC_CHROMA)]
    for tc_th, (bits, values) in hts:
        out += b"\xFF\xC4" + struct.pack(">HB", 19 + len(values), tc_th)
        out += bytes(bits) + bytes(values)
    if restart_interval:
        out += b"\xFF\xDD" + struct.pack(">HH", 4, restart_interval)
    # SOS
    out += b"\xFF\xDA" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        out += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    out += b"\x00\x3F\x00"

    dc_codes = [_build_codes(*_DC_LUMA), _build_codes(*_DC_CHROMA)]
    ac_codes = [_build_codes(*_AC_LUMA), _build_codes(*_AC_CHROMA)]
    bw = _BitWriter()
    prev_dc = [0] * ncomp
    blocks_h = (h + 7) // 8
    blocks_w = (w + 7) // 8
    mcu_count = 0
    for by in range(blocks_h):
        for bx in range(blocks_w):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                out += bw.out
                out += bytes([0xFF, 0xD0 + ((mcu_count // restart_interval - 1) % 8)])
                bw = _BitWriter()
                prev_dc = [0] * ncomp
            mcu_count += 1
            for ci in range(ncomp):
                tsel = 0 if ci == 0 else 1
                plane = planes[ci]
                block = np.empty((8, 8), np.float64)
                y0, x0 = by * 8, bx * 8
                sub = plane[y0:min(y0 + 8, h), x0:min(x0 + 8, w)]
                # edge replication padding
                block[:sub.shape[0], :sub.shape[1]] = sub
                if sub.shape[0] < 8:
                    block[sub.shape[0]:, :sub.shape[1]] = sub[-1:, :]
                if sub.shape[1] < 8:
                    block[:, sub.shape[1]:] = block[:, sub.shape[1] - 1: sub.shape[1]]
                coef = _dct2(block - 128.0)
                q = qtabs[tsel]
                zz = np.round(coef.flatten()[ZIGZAG] / q.flatten()[ZIGZAG]).astype(np.int64)
                # DC
                diff = int(zz[0]) - prev_dc[ci]
                prev_dc[ci] = int(zz[0])
                n, v = _magnitude(diff)
                code, length = dc_codes[tsel][n]
                bw.write(code, length)
                if n:
                    bw.write(v, n)
                # AC with run-lengths
                run = 0
                for k in range(1, 64):
                    if zz[k] == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, length = ac_codes[tsel][0xF0]  # ZRL
                        bw.write(code, length)
                        run -= 16
                    n, v = _magnitude(int(zz[k]))
                    code, length = ac_codes[tsel][(run << 4) | n]
                    bw.write(code, length)
                    bw.write(v, n)
                    run = 0
                if run:
                    code, length = ac_codes[tsel][0x00]  # EOB
                    bw.write(code, length)
    bw.flush()
    out += bw.out
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


def jpeg_encode_progressive(arr: np.ndarray, quality: int = 90) -> bytes:
    """Encode a uint8 array (h, w) or (h, w, 3) as PROGRESSIVE JFIF
    JPEG (SOF2, 4:4:4), exercising every Annex G decode path: an
    interleaved DC first scan at Al=1, per-component spectral-band AC
    first scans (1-5, then 6-63) at Al=1, a DC refinement scan, and
    per-component AC refinement scans (Ah=1→Al=0) with correction
    bits.  Uses the Annex K huffman tables, so EOB runs are emitted
    as per-block EOB0 (the longer EOBn symbols are absent from those
    tables — costs a little compression, changes no semantics).
    Pixel-identical to ``jpeg_encode`` at the same quality once
    decoded (same quantized coefficients, different scan order)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in (1, 3):
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, w, ch = a.shape
    if ch == 3:
        f = a.astype(np.float64)
        r, g, b = f[..., 0], f[..., 1], f[..., 2]
        planes = [0.299 * r + 0.587 * g + 0.114 * b,
                  128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
                  128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b]
    else:
        planes = [a[..., 0].astype(np.float64)]
    qluma = _scale_quant(QUANT_LUMA, quality)
    qchroma = _scale_quant(QUANT_CHROMA, quality)
    qtabs = [qluma] if ch == 1 else [qluma, qchroma]

    # quantized zigzag coefficients per component, block raster order
    blocks_h, blocks_w = (h + 7) // 8, (w + 7) // 8
    zz_all = []
    for ci in range(ch):
        q = qtabs[0 if ci == 0 else 1].flatten()[ZIGZAG]
        plane = planes[ci]
        comp = np.empty((blocks_h * blocks_w, 64), np.int64)
        i = 0
        for by in range(blocks_h):
            for bx in range(blocks_w):
                block = np.empty((8, 8), np.float64)
                y0, x0 = by * 8, bx * 8
                sub = plane[y0:min(y0 + 8, h), x0:min(x0 + 8, w)]
                block[:sub.shape[0], :sub.shape[1]] = sub
                if sub.shape[0] < 8:
                    block[sub.shape[0]:, :sub.shape[1]] = sub[-1:, :]
                if sub.shape[1] < 8:
                    block[:, sub.shape[1]:] = block[:, sub.shape[1] - 1: sub.shape[1]]
                coef = _dct2(block - 128.0)
                comp[i] = np.round(coef.flatten()[ZIGZAG] / q).astype(np.int64)
                i += 1
        zz_all.append(comp)

    out = bytearray(b"\xFF\xD8")
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, q in enumerate(qtabs):
        out += b"\xFF\xDB" + struct.pack(">HB", 67, tid) + bytes(q.flatten()[ZIGZAG].astype(np.uint8))
    out += b"\xFF\xC2" + struct.pack(">HBHHB", 8 + 3 * ch, 8, h, w, ch)  # SOF2
    for ci in range(ch):
        out += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    hts = [(0x00, _DC_LUMA), (0x10, _AC_LUMA)]
    if ch == 3:
        hts += [(0x01, _DC_CHROMA), (0x11, _AC_CHROMA)]
    for tc_th, (bits, values) in hts:
        out += b"\xFF\xC4" + struct.pack(">HB", 19 + len(values), tc_th)
        out += bytes(bits) + bytes(values)

    dc_codes = [_build_codes(*_DC_LUMA), _build_codes(*_DC_CHROMA)]
    ac_codes = [_build_codes(*_AC_LUMA), _build_codes(*_AC_CHROMA)]

    def sos(comp_ids: list[int], ss: int, se: int, ah: int, al: int,
            payload: bytearray) -> None:
        out.extend(b"\xFF\xDA" + struct.pack(">HB", 6 + 2 * len(comp_ids),
                                             len(comp_ids)))
        for cid in comp_ids:
            td = 0 if cid == 1 else 1
            out.append(cid)
            out.append((td << 4) | td)
        out.extend(bytes([ss, se, (ah << 4) | al]))
        out.extend(payload)

    # scan 1: interleaved DC first pass at Al=1
    bw = _BitWriter()
    prev = [0] * ch
    for bi in range(blocks_h * blocks_w):
        for ci in range(ch):
            dc = int(zz_all[ci][bi][0]) >> 1    # arithmetic shift per G.1.2.1
            diff = dc - prev[ci]
            prev[ci] = dc
            n, v = _magnitude(diff)
            code, length = dc_codes[0 if ci == 0 else 1][n]
            bw.write(code, length)
            if n:
                bw.write(v, n)
    bw.flush()
    sos(list(range(1, ch + 1)), 0, 0, 0, 1, bw.out)

    # scans 2-3: per-component AC first passes at Al=1, two spectral bands
    for ss, se in ((1, 5), (6, 63)):
        for ci in range(ch):
            codes = ac_codes[0 if ci == 0 else 1]
            bw = _BitWriter()
            for bi in range(blocks_h * blocks_w):
                zz = zz_all[ci][bi]
                vals = [int(np.sign(zz[k])) * (abs(int(zz[k])) >> 1)
                        for k in range(ss, se + 1)]
                if not any(vals):
                    code, length = codes[0x00]  # EOB0 (Annex K tables only)
                    bw.write(code, length)
                    continue
                run = 0
                for v in vals:
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, length = codes[0xF0]
                        bw.write(code, length)
                        run -= 16
                    n, vv = _magnitude(v)
                    code, length = codes[(run << 4) | n]
                    bw.write(code, length)
                    bw.write(vv, n)
                    run = 0
                if run:
                    code, length = codes[0x00]
                    bw.write(code, length)
            bw.flush()
            sos([ci + 1], ss, se, 0, 1, bw.out)

    # scan 4: interleaved DC refinement (Ah=1 → Al=0), raw bits
    bw = _BitWriter()
    for bi in range(blocks_h * blocks_w):
        for ci in range(ch):
            bw.write(int(zz_all[ci][bi][0]) & 1, 1)
    bw.flush()
    sos(list(range(1, ch + 1)), 0, 0, 1, 0, bw.out)

    # scan 5: per-component AC refinement (Ah=1 → Al=0) — the libjpeg
    # encode_mcu_AC_refine control flow with EOB runs capped at EOB0
    for ci in range(ch):
        codes = ac_codes[0 if ci == 0 else 1]
        bw = _BitWriter()
        for bi in range(blocks_h * blocks_w):
            zz = zz_all[ci][bi]
            absv = [abs(int(zz[k])) for k in range(64)]
            eob = 0
            for k in range(1, 64):
                if absv[k] == 1:
                    eob = k  # last NEWLY-nonzero coefficient
            r = 0
            br: list[int] = []
            k = 1
            while k <= 63:
                t = absv[k]
                if t == 0:
                    r += 1
                    k += 1
                    continue
                while r > 15 and k <= eob:
                    code, length = codes[0xF0]
                    bw.write(code, length)
                    r -= 16
                    for bit in br:
                        bw.write(bit, 1)
                    br = []
                if t > 1:  # already nonzero at Al=1: buffer correction bit
                    br.append(t & 1)
                    k += 1
                    continue
                code, length = codes[(r << 4) | 1]
                bw.write(code, length)
                bw.write(1 if zz[k] > 0 else 0, 1)
                for bit in br:
                    bw.write(bit, 1)
                br = []
                r = 0
                k += 1
            if r > 0 or br:
                code, length = codes[0x00]  # EOB0 + its correction bits
                bw.write(code, length)
                for bit in br:
                    bw.write(bit, 1)
        bw.flush()
        sos([ci + 1], 1, 63, 1, 0, bw.out)

    out += b"\xFF\xD9"
    return bytes(out)


# ---- decoder -----------------------------------------------------------------


def _check_ncomp(ncomp: int) -> None:
    if ncomp not in (1, 3):
        raise ValueError(
            f"{ncomp}-component JPEG (CMYK/unknown) not supported by the "
            f"baseline codec — install Pillow for these")


def jpeg_read_header(buf: bytes) -> tuple[int, int, str]:
    """(width, height, mode) from SOF0/1 without decoding scan data.
    Raises ValueError on non-JPEG, truncated, or unsupported streams."""
    try:
        return _read_header_impl(buf)
    except (IndexError, struct.error) as e:
        raise ValueError(f"truncated or malformed JPEG ({e})") from e


def _read_header_impl(buf: bytes) -> tuple[int, int, str]:
    if buf[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (bad SOI)")
    pos = 2
    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            raise ValueError("bad marker alignment in JPEG stream")
        marker = buf[pos + 1]
        if marker in (0xC0, 0xC1, 0xC2):  # baseline, ext. sequential, progressive
            h, w, ncomp = struct.unpack(">HHB", buf[pos + 5: pos + 10])
            _check_ncomp(ncomp)
            # mode names follow PIL's convention for decoded JPEGs
            # ("L" / "RGB"), so metadata is engine-independent
            return w, h, ("L" if ncomp == 1 else "RGB")
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        seg_len = struct.unpack(">H", buf[pos + 2: pos + 4])[0]
        pos += 2 + seg_len
    raise ValueError("no SOF marker found")


def jpeg_decode(buf: bytes):
    """Decode a baseline (SOF0/1) or progressive (SOF2) JFIF JPEG to a
    uint8 numpy array — (h, w) for grayscale, (h, w, 3) RGB otherwise.
    Progressive streams are decoded exactly per T.81 Annex G: spectral
    selection, successive approximation (DC + AC first/refinement
    passes with EOB-run correction bits), interleaved DC scans,
    restart intervals.  Raises ValueError on arithmetic/hierarchical/
    CMYK streams, truncation, or malformed data."""
    try:
        return _decode_impl(buf)
    except (IndexError, struct.error) as e:
        raise ValueError(f"truncated or malformed JPEG ({e})") from e


class _ProgressiveState:
    """Coefficient accumulator + scan decoders for SOF2 (T.81 Annex G).

    Coefficients accumulate per component as (blocks_y, blocks_x, 64)
    int64 arrays in ZIGZAG index space across scans; each scan refines
    a spectral band (Ss..Se) at a successive-approximation bit
    position (Ah→Al).  DC scans may interleave all components in MCU
    order; AC scans are single-component in the component's own block
    raster (T.81 G.1.1).  Restart intervals reset DC predictors and
    the EOB run.
    """

    def __init__(self, frame: dict):
        self.frame = frame
        comps = frame["comps"]
        self.hmax = max(c["h"] for c in comps)
        self.vmax = max(c["v"] for c in comps)
        h, w = frame["h"], frame["w"]
        self.mcus_x = -(-w // (8 * self.hmax))
        self.mcus_y = -(-h // (8 * self.vmax))
        self.coefs: dict[int, np.ndarray] = {}
        self.nblocks: dict[int, tuple[int, int]] = {}
        for c in comps:
            self.coefs[c["id"]] = np.zeros(
                (self.mcus_y * c["v"], self.mcus_x * c["h"], 64), np.int64)
            cw = -(-w * c["h"] // self.hmax)
            ch = -(-h * c["v"] // self.vmax)
            self.nblocks[c["id"]] = (-(-ch // 8), -(-cw // 8))

    def decode_scan(self, buf: bytes, pos: int, scan: list[dict],
                    ss: int, se: int, ah: int, al: int,
                    dc_tabs: dict, ac_tabs: dict, ri: int) -> int:
        reader = _BitReader(buf, pos)
        if ss == 0:
            if se != 0:
                raise ValueError("progressive scan mixes DC and AC bands")
            self._dc_scan(reader, scan, ah, al, dc_tabs, ri)
        else:
            if len(scan) != 1:
                raise ValueError(
                    "progressive AC scan must be single-component (T.81 G.1.1)")
            self._ac_scan(reader, scan[0], ss, se, ah, al, ac_tabs, ri)
        # snap past trailing pad bits / fill bytes to the next marker
        p = reader.pos
        while buf[p] != 0xFF or buf[p + 1] in (0x00, 0xFF):
            p += 1
        return p

    def _dc_scan(self, reader: _BitReader, scan: list[dict],
                 ah: int, al: int, dc_tabs: dict, ri: int) -> None:
        if len(scan) == 1:
            c = scan[0]
            by, bx = self.nblocks[c["id"]]
            mcus = [[(c, y, x)] for y in range(by) for x in range(bx)]
        else:
            mcus = [
                [(c, my * c["v"] + v, mx * c["h"] + hh)
                 for c in scan for v in range(c["v"]) for hh in range(c["h"])]
                for my in range(self.mcus_y) for mx in range(self.mcus_x)]
        pred = {c["id"]: 0 for c in scan}
        for count, mcu in enumerate(mcus):
            if ri and count and count % ri == 0:
                reader.align_and_skip_restart()
                pred = {c["id"]: 0 for c in scan}
            for c, y, x in mcu:
                blk = self.coefs[c["id"]][y, x]
                if ah == 0:
                    s = _decode_symbol(reader, dc_tabs[c["td"]])
                    pred[c["id"]] += _extend(reader.read_bits(s), s)
                    blk[0] = pred[c["id"]] << al
                elif reader.read_bit():
                    blk[0] |= 1 << al

    def _ac_scan(self, reader: _BitReader, c: dict, ss: int, se: int,
                 ah: int, al: int, ac_tabs: dict, ri: int) -> None:
        coefs = self.coefs[c["id"]]
        by, bx = self.nblocks[c["id"]]
        table = ac_tabs[c["ta"]]
        decode_block = self._ac_first if ah == 0 else self._ac_refine
        eobrun = 0
        count = 0
        for y in range(by):
            for x in range(bx):
                if ri and count and count % ri == 0:
                    reader.align_and_skip_restart()
                    eobrun = 0
                count += 1
                eobrun = decode_block(reader, coefs[y, x],
                                      ss, se, al, table, eobrun)

    @staticmethod
    def _ac_first(reader: _BitReader, blk: np.ndarray, ss: int, se: int,
                  al: int, table: dict, eobrun: int) -> int:
        """First AC pass (Ah=0): magnitudes at bit Al with EOB runs."""
        if eobrun > 0:
            return eobrun - 1
        k = ss
        while k <= se:
            rs = _decode_symbol(reader, table)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r < 15:  # EOBn: run of (1<<r)+extra blocks incl. this one
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += reader.read_bits(r)
                    return eobrun
                k += 16  # ZRL
                continue
            k += r
            if k > se:
                raise ValueError("AC coefficient index out of range")
            blk[k] = _extend(reader.read_bits(s), s) << al
            k += 1
        return 0

    @staticmethod
    def _ac_refine(reader: _BitReader, blk: np.ndarray, ss: int, se: int,
                   al: int, table: dict, eobrun: int) -> int:
        """AC refinement pass (Ah=Al+1): correction bits for already-
        nonzero coefficients interleave with new ±1<<Al coefficients
        and EOB runs (T.81 G.1.2.3; the libjpeg REFINE control flow)."""
        p1, m1 = 1 << al, -(1 << al)
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = _decode_symbol(reader, table)
                r, s = rs >> 4, rs & 0x0F
                val = 0
                if s:
                    if s != 1:
                        raise ValueError(
                            "refinement scan magnitude must be 1")
                    val = p1 if reader.read_bit() else m1
                elif r < 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read_bits(r)
                    break
                # advance r zero-history positions (16 for ZRL), reading
                # a correction bit at every nonzero-history one passed
                while k <= se:
                    if blk[k] != 0:
                        if reader.read_bit() and (blk[k] & p1) == 0:
                            blk[k] += p1 if blk[k] >= 0 else m1
                    else:
                        r -= 1
                        if r < 0:
                            break
                    k += 1
                if val and k <= se:
                    blk[k] = val
                k += 1
        if eobrun > 0:
            while k <= se:  # correction bits through the rest of the block
                if blk[k] != 0 and reader.read_bit() and (blk[k] & p1) == 0:
                    blk[k] += p1 if blk[k] >= 0 else m1
                k += 1
            eobrun -= 1
        return eobrun

    def idct_planes(self, qtabs: dict[int, np.ndarray]) -> dict[int, np.ndarray]:
        """Dequantize + vectorized per-block IDCT into full planes."""
        planes = {}
        for c in self.frame["comps"]:
            coef = self.coefs[c["id"]]
            by, bx, _ = coef.shape
            q_zig = qtabs[c["tq"]].flatten()[ZIGZAG].astype(np.int64)
            natural = np.zeros((by, bx, 64), np.float64)
            natural[:, :, ZIGZAG] = coef * q_zig
            blocks = natural.reshape(by, bx, 8, 8)
            out = np.einsum("ij,ybjk,kl->ybil", _DCT_A.T, blocks, _DCT_A)
            planes[c["id"]] = (
                out.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8) + 128.0)
        return planes


def _decode_impl(buf: bytes):
    if buf[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (bad SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    prog = None  # _ProgressiveState once the first progressive scan lands
    while True:
        if pos + 2 > len(buf):
            raise ValueError("truncated JPEG (no SOS)")
        if buf[pos] != 0xFF:
            raise ValueError("bad marker alignment in JPEG stream")
        marker = buf[pos + 1]
        pos += 2
        if marker == 0xD9:
            if prog is not None:
                break  # progressive: all scans consumed, reconstruct
            raise ValueError("EOI before scan data")
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:
            continue
        seg_len = struct.unpack(">H", buf[pos: pos + 2])[0]
        body = buf[pos + 2: pos + seg_len]
        pos += seg_len
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            b = 0
            while b < len(body):
                prec_id = body[b]
                if prec_id >> 4:
                    raise ValueError("16-bit quant tables not supported")
                zz = np.frombuffer(body[b + 1: b + 65], dtype=np.uint8).astype(np.int32)
                q = np.empty(64, np.int32)
                q[ZIGZAG] = zz
                qtabs[prec_id & 0x0F] = q.reshape(8, 8)
                b += 65
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            precision, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if precision != 8:
                raise ValueError(f"{precision}-bit JPEG not supported")
            _check_ncomp(ncomp)
            comps = []
            for i in range(ncomp):
                cid, hv, tq = body[6 + 3 * i: 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps,
                     "progressive": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"JPEG SOF 0x{marker:02X} not supported by the baseline codec")
        elif marker == 0xC4:  # DHT
            b = 0
            while b < len(body):
                tc_th = body[b]
                bits = list(body[b + 1: b + 17])
                nvals = sum(bits)
                values = list(body[b + 17: b + 17 + nvals])
                table = _build_decoder(bits, values)
                if tc_th >> 4:
                    ac_tabs[tc_th & 0x0F] = table
                else:
                    dc_tabs[tc_th & 0x0F] = table
                b += 17 + nvals
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ncomp = body[0]
            scan = []
            for i in range(ncomp):
                cs, tdta = body[1 + 2 * i: 3 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append({**comp, "td": tdta >> 4, "ta": tdta & 0x0F})
            if not frame.get("progressive"):
                break
            ss, se, ahal = body[1 + 2 * ncomp: 4 + 2 * ncomp]
            if prog is None:
                prog = _ProgressiveState(frame)
            pos = prog.decode_scan(buf, pos, scan, ss, se,
                                   ahal >> 4, ahal & 0x0F,
                                   dc_tabs, ac_tabs, restart_interval)
        # APPn / COM / others: skipped via seg_len

    h, w = frame["h"], frame["w"]
    if prog is not None:  # progressive: coefficients fully accumulated
        return _assemble(frame["comps"], prog.idct_planes(qtabs),
                         h, w, prog.hmax, prog.vmax)
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = {}
    for c in scan:
        pw, ph = mcus_x * 8 * c["h"], mcus_y * 8 * c["v"]
        planes[c["id"]] = np.zeros((ph, pw), np.float64)

    reader = _BitReader(buf, pos)
    prev_dc = {c["id"]: 0 for c in scan}
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.align_and_skip_restart()
                prev_dc = {c["id"]: 0 for c in scan}
            try:
                for c in scan:
                    q = qtabs[c["tq"]]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            zz = np.zeros(64, np.int64)
                            s = _decode_symbol(reader, dc_tabs[c["td"]])
                            diff = _extend(reader.read_bits(s), s)
                            prev_dc[c["id"]] += diff
                            zz[0] = prev_dc[c["id"]]
                            k = 1
                            while k < 64:
                                rs = _decode_symbol(reader, ac_tabs[c["ta"]])
                                r, s = rs >> 4, rs & 0x0F
                                if s == 0:
                                    if r == 15:
                                        k += 16
                                        continue
                                    break  # EOB
                                k += r
                                if k > 63:
                                    raise ValueError("AC coefficient index out of range")
                                zz[k] = _extend(reader.read_bits(s), s)
                                k += 1
                            coef = np.zeros(64, np.float64)
                            coef[ZIGZAG] = zz * q.flatten()[ZIGZAG]
                            block = _idct2(coef.reshape(8, 8)) + 128.0
                            y0 = (my * c["v"] + by) * 8
                            x0 = (mx * c["h"] + bx) * 8
                            planes[c["id"]][y0:y0 + 8, x0:x0 + 8] = block
            except _HitRestart:
                raise ValueError("restart marker mid-MCU: corrupt scan data") from None
            mcu_count += 1

    return _assemble(scan, planes, h, w, hmax, vmax)


def _assemble(comps: list[dict], planes: dict[int, np.ndarray],
              h: int, w: int, hmax: int, vmax: int):
    """Crop / chroma-upsample the component planes and convert to the
    output array — shared by the baseline and progressive paths."""
    if len(comps) == 1:
        out = planes[comps[0]["id"]][:h, :w]
        return np.clip(np.round(out), 0, 255).astype(np.uint8)
    # upsample chroma to full resolution, then YCbCr → RGB
    full = []
    for c in comps:
        p = planes[c["id"]]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
