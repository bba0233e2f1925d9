"""Unit tests for the stdlib baseline-PNG codec (no Spark needed)."""

import struct
import zlib

import numpy as np
import pytest

from presto_bloomfilter_spark.functions import png_codec as pc


@pytest.mark.parametrize("shape", [(7, 5), (7, 5, 1), (16, 9, 2), (8, 8, 3), (3, 11, 4)])
def test_round_trip(shape):
    rng = np.random.default_rng(42)
    arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
    buf = pc.png_encode(arr)
    out = pc.png_decode(buf)
    want = arr if arr.ndim == 3 else arr[:, :, None]
    np.testing.assert_array_equal(out, want)


def test_header_only_read():
    arr = np.zeros((12, 34, 3), np.uint8)
    w, h, mode = pc.png_read_header(pc.png_encode(arr))
    assert (w, h, mode) == (34, 12, "RGB")


def test_bad_signature_raises():
    with pytest.raises(ValueError, match="signature"):
        pc.png_decode(b"not a png at all....")


def _forward_filter(a: np.ndarray, ftype: int) -> np.ndarray:
    """Apply the PNG forward filter to raw scanlines (reference impl for
    testing the decoder's reconstruction of filter types 1-4)."""
    h, stride = a.shape[0], a.shape[1] * a.shape[2]
    ch = a.shape[2]
    flat = a.reshape(h, stride).astype(np.int32)
    out = np.zeros((h, stride), np.int32)
    for y in range(h):
        for x in range(stride):
            raw = flat[y, x]
            left = flat[y, x - ch] if x >= ch else 0
            up = flat[y - 1, x] if y else 0
            ul = flat[y - 1, x - ch] if (y and x >= ch) else 0
            if ftype == 1:
                out[y, x] = raw - left
            elif ftype == 2:
                out[y, x] = raw - up
            elif ftype == 3:
                out[y, x] = raw - ((left + up) >> 1)
            elif ftype == 4:
                p = left + up - ul
                pa, pb, pcc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pcc) else (up if pb <= pcc else ul)
                out[y, x] = raw - pred
    return (out & 0xFF).astype(np.uint8)


@pytest.mark.parametrize("ftype", [1, 2, 3, 4])
def test_decode_filtered_scanlines(ftype):
    """The decoder must reconstruct filters Sub/Up/Average/Paeth, which
    real encoders emit even though ours writes only filter 0."""
    rng = np.random.default_rng(ftype)
    arr = rng.integers(0, 256, size=(6, 4, 3), dtype=np.uint8)
    filtered = _forward_filter(arr, ftype)
    h, stride = filtered.shape
    raw = np.concatenate(
        [np.full((h, 1), ftype, np.uint8), filtered], axis=1).tobytes()
    ihdr = struct.pack(">IIBBBBB", 4, 6, 8, 2, 0, 0, 0)
    buf = (
        b"\x89PNG\r\n\x1a\n"
        + pc._chunk(b"IHDR", ihdr)
        + pc._chunk(b"IDAT", zlib.compress(raw))
        + pc._chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(pc.png_decode(buf), arr)


def test_decode_mixed_filters_per_row():
    """Real encoders pick a different filter per scanline; the decoder's
    batched Sub reconstruction must interleave correctly with rows whose
    Up/Average/Paeth recurrence reads the previous reconstructed row."""
    rng = np.random.default_rng(99)
    arr = rng.integers(0, 256, size=(10, 5, 3), dtype=np.uint8)
    ftypes = [0, 1, 2, 3, 4, 1, 4, 2, 1, 3]
    h, w, ch = arr.shape
    stride = w * ch
    flat = arr.reshape(h, stride).astype(np.int32)
    filtered = np.zeros((h, stride), np.int32)
    for y, ftype in enumerate(ftypes):
        for x in range(stride):
            raw_b = flat[y, x]
            left = flat[y, x - ch] if x >= ch else 0
            up = flat[y - 1, x] if y else 0
            ul = flat[y - 1, x - ch] if (y and x >= ch) else 0
            if ftype == 0:
                filtered[y, x] = raw_b
            elif ftype == 1:
                filtered[y, x] = raw_b - left
            elif ftype == 2:
                filtered[y, x] = raw_b - up
            elif ftype == 3:
                filtered[y, x] = raw_b - ((left + up) >> 1)
            else:
                p = left + up - ul
                pa, pb, pcc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pcc) else (up if pb <= pcc else ul)
                filtered[y, x] = raw_b - pred
    filtered = (filtered & 0xFF).astype(np.uint8)
    raw = np.concatenate(
        [np.array(ftypes, np.uint8)[:, None], filtered], axis=1).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    buf = (
        b"\x89PNG\r\n\x1a\n"
        + pc._chunk(b"IHDR", ihdr)
        + pc._chunk(b"IDAT", zlib.compress(raw))
        + pc._chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(pc.png_decode(buf), arr)


def test_resize_nearest():
    arr = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    out = pc.resize_nearest(arr, 3, 2)
    assert out.shape == (2, 3, 3)
    np.testing.assert_array_equal(out[0, 0], arr[0, 0])
    # nearest must pick source pixels, never interpolate
    flat = {tuple(p) for row in arr for p in row}
    assert all(tuple(p) in flat for row in out for p in row)


@pytest.mark.parametrize("buf", [
    b"\x89PNG\r\n\x1a\n",                     # signature only
    b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\x0dIHDR",  # truncated IHDR
    b"\x89PNG\r\n\x1a\n" + b"\x00" * 30,      # wrong chunk tag
])
def test_truncated_png_raises_value_error(buf):
    with pytest.raises(ValueError):
        pc.png_read_header(buf)
    with pytest.raises(ValueError):
        pc.png_decode(buf)
