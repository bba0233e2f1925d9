"""Dependency-free YUV4MPEG2 (.y4m) codec: stdlib parsing + numpy.

The video sibling of ``png_codec``/``wav_codec``.  Y4M is the
uncompressed interchange format (ffmpeg's ``-f yuv4mpeg``): one ASCII
stream header, then per frame an ASCII ``FRAME`` header followed by
raw planar YCbCr.  Supported colorspaces: C420 family (Y W*H, then
Cb/Cr at W/2*H/2 — C420, C420jpeg, C420mpeg2, C420paldv share the
layout), C422 (W/2*H chroma) and C444 (full-size chroma), plus Cmono.

Design for the sampling path: ``y4m_index`` computes the byte offset
of EVERY frame from the header geometry alone (frames are fixed-size,
frame headers are scanned, not decoded), so sampling 3 frames of a
10k-frame payload slices 3 planes out of the buffer and never
materializes the other 9,997 — the shape ``frame_sample_video``
needs when output rows << input bytes.
"""

from __future__ import annotations

import numpy as np

_CHROMA_DIV = {  # colorspace -> (x_div, y_div) for the Cb/Cr planes
    "420": (2, 2), "420jpeg": (2, 2), "420mpeg2": (2, 2),
    "420paldv": (2, 2), "422": (2, 1), "444": (1, 1),
}


def _parse_stream_header(blob: bytes) -> tuple[dict, int]:
    end = blob.find(b"\n", 0, 2048)
    if not blob.startswith(b"YUV4MPEG2") or end < 0:
        raise ValueError("not a YUV4MPEG2 payload")
    hdr = {"w": None, "h": None, "fps_num": None, "fps_den": None,
           "chroma": "420jpeg"}
    for tok in blob[9:end].split():
        t = tok.decode("ascii", "replace")
        if t[0] == "W":
            hdr["w"] = int(t[1:])
        elif t[0] == "H":
            hdr["h"] = int(t[1:])
        elif t[0] == "F":
            num, den = t[1:].split(":")
            hdr["fps_num"], hdr["fps_den"] = int(num), int(den)
        elif t[0] == "C":
            hdr["chroma"] = t[1:]
    if not hdr["w"] or not hdr["h"]:
        raise ValueError("missing W/H in YUV4MPEG2 header")
    c = hdr["chroma"]
    if c != "mono" and c not in _CHROMA_DIV:
        raise ValueError(f"unsupported colorspace C{c}")
    if c in _CHROMA_DIV:
        xd, yd = _CHROMA_DIV[c]
        if hdr["w"] % xd or hdr["h"] % yd:
            raise ValueError(
                f"dims {hdr['w']}x{hdr['h']} not divisible for C{c}")
    return hdr, end + 1


def _frame_bytes(hdr: dict) -> int:
    y = hdr["w"] * hdr["h"]
    if hdr["chroma"] == "mono":
        return y
    xd, yd = _CHROMA_DIV[hdr["chroma"]]
    return y + 2 * ((hdr["w"] // xd) * (hdr["h"] // yd))


def y4m_index(blob: bytes) -> tuple[dict, list[int]]:
    """(header, [plane-data offset of each frame]) — walks only the
    per-frame ASCII headers; O(n_frames) pointer arithmetic, no pixel
    reads."""
    hdr, pos = _parse_stream_header(blob)
    fsize = _frame_bytes(hdr)
    offsets = []
    while pos < len(blob):
        if blob[pos:pos + 5] != b"FRAME":
            raise ValueError(f"bad frame marker at offset {pos}")
        nl = blob.find(b"\n", pos, pos + 256)
        if nl < 0:
            raise ValueError("unterminated FRAME header")
        start = nl + 1
        if start + fsize > len(blob):
            raise ValueError("truncated frame payload")
        offsets.append(start)
        pos = start + fsize
    return hdr, offsets


def y4m_read_header(blob: bytes) -> dict:
    """{w, h, fps_num, fps_den, chroma, n_frames} without pixel reads."""
    hdr, offsets = y4m_index(blob)
    hdr["n_frames"] = len(offsets)
    return hdr


def y4m_decode_frame(blob: bytes, hdr: dict, offset: int):
    """(Y, Cb, Cr) uint8 planes for the frame at ``offset`` (from
    y4m_index); Cb/Cr are None for mono.  Zero-copy views of ``blob``."""
    w, h = hdr["w"], hdr["h"]
    y = np.frombuffer(blob, np.uint8, w * h, offset).reshape(h, w)
    if hdr["chroma"] == "mono":
        return y, None, None
    xd, yd = _CHROMA_DIV[hdr["chroma"]]
    cw, chh = w // xd, h // yd
    cb = np.frombuffer(blob, np.uint8, cw * chh,
                       offset + w * h).reshape(chh, cw)
    cr = np.frombuffer(blob, np.uint8, cw * chh,
                       offset + w * h + cw * chh).reshape(chh, cw)
    return y, cb, cr


def y4m_encode(frames, fps: tuple[int, int] = (30, 1),
               chroma: str = "420jpeg") -> bytes:
    """Encode a sequence of (Y, Cb, Cr) uint8 plane triples (Cb/Cr
    None for mono) into a .y4m payload — fixture generation."""
    frames = list(frames)
    if not frames:
        raise ValueError("need at least one frame")
    y0 = frames[0][0]
    h, w = y0.shape
    parts = [f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 "
             f"C{chroma}\n".encode()]
    mono = chroma == "mono"
    for y, cb, cr in frames:
        if y.shape != (h, w):
            raise ValueError("inconsistent frame dims")
        parts.append(b"FRAME\n")
        parts.append(np.ascontiguousarray(y, np.uint8).tobytes())
        if not mono:
            xd, yd = _CHROMA_DIV[chroma]
            for c in (cb, cr):
                if c.shape != (h // yd, w // xd):
                    raise ValueError("bad chroma plane dims")
                parts.append(np.ascontiguousarray(c, np.uint8).tobytes())
    return b"".join(parts)
