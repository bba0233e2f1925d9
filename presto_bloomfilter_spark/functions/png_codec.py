"""Minimal pure-stdlib PNG codec (zlib + struct only).

Exists so the multimodal "real decode" path can run in containers
without Pillow: baseline 8-bit PNGs (gray / RGB / RGBA, no interlace)
decode to numpy arrays and encode back, covering the formats our own
fixtures and most ML-pipeline thumbnails use.  When Pillow IS present,
`operators/multimodal.py` prefers it (more formats, faster); this
module is the dependency-free fallback, not a PIL replacement.

Format reference: the public PNG specification (RFC 2083) — signature,
IHDR/IDAT/IEND chunks, per-scanline filter types 0-4.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_MODE_NAME = {0: "L", 2: "RGB", 4: "LA", 6: "RGBA"}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def png_encode(arr: np.ndarray) -> bytes:
    """Encode a uint8 array of shape (h, w) or (h, w, {1,2,3,4}) as PNG."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in (1, 2, 3, 4):
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, w, ch = a.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # filter type 0 (None) per scanline: prepend the filter byte
    raw = np.concatenate([np.zeros((h, 1), np.uint8), a.reshape(h, w * ch)], axis=1)
    idat = zlib.compress(raw.tobytes(), 6)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def png_read_header(buf: bytes) -> tuple[int, int, str]:
    """(width, height, mode) from IHDR without decoding pixel data."""
    if buf[:8] != _SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    try:
        length, tag = struct.unpack(">I4s", buf[8:16])
        if tag != b"IHDR" or length != 13:
            raise ValueError("malformed PNG (missing IHDR)")
        w, h, depth, color_type, _comp, _filt, interlace = struct.unpack(
            ">IIBBBBB", buf[16:29])
    except struct.error as e:
        raise ValueError("truncated PNG header") from e
    if depth != 8 or color_type not in _CHANNELS:
        raise ValueError(f"unsupported PNG (depth={depth}, color_type={color_type})")
    if interlace:
        raise ValueError("interlaced PNG not supported")
    return w, h, _MODE_NAME[color_type]


def png_decode(buf: bytes) -> np.ndarray:
    """Decode a baseline 8-bit PNG to a uint8 array (h, w, channels)."""
    w, h, mode = png_read_header(buf)
    ch = {"L": 1, "RGB": 3, "LA": 2, "RGBA": 4}[mode]
    # walk chunks, concatenate IDAT
    pos, idat = 8, []
    try:
        while pos < len(buf):
            length, tag = struct.unpack(">I4s", buf[pos : pos + 8])
            body = buf[pos + 8 : pos + 8 + length]
            if tag == b"IDAT":
                idat.append(body)
            elif tag == b"IEND":
                break
            pos += 12 + length
        raw = zlib.decompress(b"".join(idat))
    except (struct.error, zlib.error) as e:
        raise ValueError("corrupt PNG chunk data") from e
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel data has wrong length")
    lines = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    filters, data = lines[:, 0], lines[:, 1:]
    bad = set(np.unique(filters)) - {0, 1, 2, 3, 4}
    if bad:
        raise ValueError(f"unknown PNG filter type {bad.pop()}")
    # out stays uint8 (decoded values ARE bytes); arithmetic head-room
    # lives in per-row/per-group int32 temporaries, so peak memory is
    # ~the decoded image, not 4-8x it (matters inside Arrow-batch
    # executors decoding many images)
    out = np.zeros((h, stride), np.uint8)
    # Sub rows depend ONLY on themselves: recon[x] = sum of filt bytes
    # in the same channel lane mod 256 — reconstruct every Sub row in
    # the image with ONE lane-cumsum, no per-pixel Python
    sub_rows = np.nonzero(filters == 1)[0]
    if sub_rows.size:
        sub = data[sub_rows].astype(np.int32).reshape(-1, w, ch)
        np.cumsum(sub, axis=1, out=sub)
        out[sub_rows] = (sub & 0xFF).astype(np.uint8).reshape(-1, stride)
    none_rows = np.nonzero(filters == 0)[0]
    if none_rows.size:
        out[none_rows] = data[none_rows]
    zero = np.zeros(stride, np.uint8)
    for y in range(h):  # rows with an up-dependency are inherently sequential
        f = filters[y]
        if f <= 1:
            continue  # reconstructed above
        prev = out[y - 1] if y else zero
        if f == 2:  # Up: one vector add per row (uint8 wraps mod 256)
            out[y] = data[y] + prev
            continue
        # Average / Paeth: the x-recurrence (left neighbor feeds the
        # next pixel) has no closed form, so x stays a Python loop —
        # over PIXEL COLUMNS with all channels as one numpy lane, not
        # over bytes (w iterations/row, branchless channel-wide select)
        row = data[y].astype(np.int32).reshape(w, ch)
        pr = prev.astype(np.int32).reshape(w, ch)
        left = np.zeros(ch, np.int32)
        if f == 3:  # Average
            for x in range(w):
                left = (row[x] + ((left + pr[x]) >> 1)) & 0xFF
                row[x] = left
        else:  # Paeth
            upleft = np.zeros(ch, np.int32)
            for x in range(w):
                up = pr[x]
                p = left + up - upleft
                pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - upleft)
                pred = np.where((pa <= pb) & (pa <= pc), left,
                                np.where(pb <= pc, up, upleft))
                left = (row[x] + pred) & 0xFF
                row[x] = left
                upleft = up
        out[y] = row.astype(np.uint8).reshape(stride)
    return out.reshape(h, w, ch)


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize of (h, w, ch) to (height, width, ch)."""
    h, w = arr.shape[:2]
    ys = np.minimum((np.arange(height) * h) // height, h - 1)
    xs = np.minimum((np.arange(width) * w) // width, w - 1)
    return arr[ys][:, xs]
