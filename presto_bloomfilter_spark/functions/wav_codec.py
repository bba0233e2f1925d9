"""Dependency-free RIFF/WAVE (WAV) codec: stdlib struct + numpy.

The audio sibling of ``png_codec``/``jpeg_codec`` — graduates the
multimodal audio path from stubbed decode to REAL decode without any
media library in the container.  Scope: canonical RIFF 'WAVE' files,
fmt tags 1 (integer PCM, 8/16/24/32-bit) and 3 (IEEE float 32/64),
any channel count, unknown chunks skipped per the RIFF rules (chunk
sizes are word-aligned: a chunk with an odd byte size is followed by
one pad byte).  Encoder emits integer PCM for fixture generation and
the resample write-back path.

Reference tie-in: the reference treats payloads it cannot parse as
opaque bytes end-to-end; this codec plus operators/multimodal.py keep
that contract (binary column in, typed columns out) while making the
decode real (SURVEY.md §2 multimodal plumbing).
"""

from __future__ import annotations

import struct

import numpy as np

_FMT_PCM = 1
_FMT_FLOAT = 3
_FMT_EXTENSIBLE = 0xFFFE

_INT_DTYPES = {8: np.uint8, 16: np.dtype("<i2"), 32: np.dtype("<i4")}
_FLOAT_DTYPES = {32: np.dtype("<f4"), 64: np.dtype("<f8")}


def _chunks(blob: bytes):
    """Yield (fourcc, start, size) for every top-level RIFF sub-chunk."""
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    while pos + 8 <= len(blob):
        fourcc = blob[pos:pos + 4]
        (size,) = struct.unpack_from("<I", blob, pos + 4)
        start = pos + 8
        if start + size > len(blob):
            raise ValueError(f"truncated {fourcc!r} chunk")
        yield fourcc, start, size
        pos = start + size + (size & 1)  # word alignment pad


def wav_read_header(blob: bytes) -> dict:
    """Parse fmt + data chunk sizes WITHOUT touching the samples:
    {n_channels, sample_rate, bits, fmt_tag, n_frames}."""
    fmt = None
    data_size = None
    for fourcc, start, size in _chunks(blob):
        if fourcc == b"fmt " and fmt is None:
            if size < 16:
                raise ValueError("fmt chunk too small")
            tag, ch, rate, _br, block, bits = struct.unpack_from(
                "<HHIIHH", blob, start)
            if tag == _FMT_EXTENSIBLE and size >= 40:
                # first 2 bytes of the SubFormat GUID carry the real tag
                (tag,) = struct.unpack_from("<H", blob, start + 24)
            fmt = (tag, ch, rate, block, bits)
        elif fourcc == b"data" and data_size is None:
            data_size = size
    if fmt is None or data_size is None:
        raise ValueError("missing fmt or data chunk")
    tag, ch, rate, block, bits = fmt
    if tag not in (_FMT_PCM, _FMT_FLOAT):
        raise ValueError(f"unsupported WAVE format tag {tag}")
    if ch < 1 or rate < 1 or bits not in (8, 16, 24, 32, 64):
        raise ValueError(f"bad fmt geometry: ch={ch} rate={rate} bits={bits}")
    if tag == _FMT_FLOAT and bits not in (32, 64):
        raise ValueError(f"float WAVE must be 32/64-bit, got {bits}")
    bytes_per_frame = ch * (bits // 8)
    if block and block != bytes_per_frame:
        raise ValueError(f"block align {block} != channels*bytes {bytes_per_frame}")
    return {
        "n_channels": ch,
        "sample_rate": rate,
        "bits": bits,
        "fmt_tag": tag,
        "n_frames": data_size // bytes_per_frame,
    }


def wav_decode(blob: bytes) -> tuple[np.ndarray, int]:
    """Decode to (samples, sample_rate); samples shape (n_frames,
    n_channels) in the container's NATIVE units — int8/16/24/32 PCM
    comes back as the signed integer values (24-bit widened to int32
    WITHOUT scaling), float comes back as-is.  Callers wanting [-1, 1]
    divide by 2**(bits-1) themselves; keeping native units makes the
    amplitude oracles integer-exact."""
    hdr = wav_read_header(blob)
    ch, bits, tag = hdr["n_channels"], hdr["bits"], hdr["fmt_tag"]
    for fourcc, start, size in _chunks(blob):
        if fourcc == b"data":
            raw = blob[start:start + size]
            break
    n = hdr["n_frames"] * ch
    if tag == _FMT_FLOAT:
        x = np.frombuffer(raw, _FLOAT_DTYPES[bits], n).astype(np.float64)
    elif bits == 24:
        b = np.frombuffer(raw, np.uint8, n * 3).reshape(n, 3).astype(np.int32)
        x = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        x = np.where(x >= 1 << 23, x - (1 << 24), x)
    elif bits == 8:
        # 8-bit WAV is UNSIGNED with 128 midpoint — recenter to signed
        x = np.frombuffer(raw, np.uint8, n).astype(np.int16) - 128
    else:
        x = np.frombuffer(raw, _INT_DTYPES[bits], n)
    return x.reshape(hdr["n_frames"], ch), hdr["sample_rate"]


def wav_encode(samples: np.ndarray, sample_rate: int, bits: int = 16) -> bytes:
    """Integer-PCM encoder (8/16/24/32-bit) for fixtures and resample
    write-back.  ``samples`` is (n_frames,) or (n_frames, n_channels)
    in native signed units (8-bit: signed -128..127, stored unsigned)."""
    x = np.asarray(samples)
    if x.ndim == 1:
        x = x[:, None]
    n_frames, ch = x.shape
    lim = 1 << (bits - 1)
    xi = np.rint(x).astype(np.int64)
    if (xi < -lim).any() or (xi >= lim).any():
        raise ValueError(f"sample out of {bits}-bit range")
    if bits == 8:
        raw = (xi + 128).astype(np.uint8).tobytes()
    elif bits == 24:
        u = (xi & 0xFFFFFF).astype(np.uint32).ravel()
        b = np.empty((u.size, 3), np.uint8)
        b[:, 0], b[:, 1], b[:, 2] = u & 0xFF, (u >> 8) & 0xFF, (u >> 16) & 0xFF
        raw = b.tobytes()
    elif bits in (16, 32):
        raw = xi.astype(_INT_DTYPES[bits]).tobytes()
    else:
        raise ValueError(f"unsupported encode bit depth {bits}")
    block = ch * (bits // 8)
    fmt = struct.pack("<HHIIHH", _FMT_PCM, ch, sample_rate,
                      sample_rate * block, block, bits)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(raw)) + raw
            + (b"\0" if len(raw) & 1 else b""))
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def resample_linear(samples: np.ndarray, rate_in: int, rate_out: int) -> np.ndarray:
    """Linear-interpolation resample per channel — the cheap real DSP
    (no windowed sinc; fine for feature pipelines, documented trade).
    Output length = round(n_frames * rate_out / rate_in)."""
    x = np.asarray(samples, np.float64)
    if x.ndim == 1:
        x = x[:, None]
    n_in = x.shape[0]
    n_out = int(round(n_in * rate_out / rate_in))
    if n_in == 0 or n_out == 0:
        return np.empty((0, x.shape[1]))
    t = np.linspace(0.0, n_in - 1, n_out)
    return np.stack([np.interp(t, np.arange(n_in), x[:, c])
                     for c in range(x.shape[1])], axis=1)
