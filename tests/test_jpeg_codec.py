"""Baseline JPEG codec: encode/decode roundtrip error bounds, marker
handling, restart intervals, loud rejection of unsupported streams, and
the Spark multimodal dispatch (PNG + JPEG by magic bytes)."""

import os

import numpy as np
import pytest

from presto_bloomfilter_spark.functions import jpeg_codec as jc


def _gradient(h, w, ch=3):
    gx = np.linspace(0, 255, w)[None, :]
    gy = np.linspace(0, 255, h)[:, None]
    if ch == 1:
        return np.broadcast_to((gx + gy) / 2, (h, w)).astype(np.uint8)
    return np.stack([np.broadcast_to(gx, (h, w)),
                     np.broadcast_to(gy, (h, w)),
                     np.broadcast_to((gx + gy) / 2, (h, w))], -1).astype(np.uint8)


def test_roundtrip_error_bounded_gray_and_rgb():
    for img, bound in [(_gradient(40, 56, 1), 3.0), (_gradient(40, 56, 3), 5.0)]:
        blob = jc.jpeg_encode(img, quality=90)
        w, h, mode = jc.jpeg_read_header(blob)
        assert (w, h) == (img.shape[1], img.shape[0])
        assert mode == ("L" if img.ndim == 2 else "RGB")
        dec = jc.jpeg_decode(blob)
        assert dec.shape == img.shape and dec.dtype == np.uint8
        assert np.abs(dec.astype(float) - img).mean() < bound


def test_odd_dimensions_and_noise():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (13, 17), dtype=np.uint8)  # worst case for DCT
    dec = jc.jpeg_decode(jc.jpeg_encode(img, quality=95))
    assert dec.shape == img.shape
    assert np.abs(dec.astype(float) - img).mean() < 20  # noise at q95


def test_quality_dial_monotone():
    img = _gradient(32, 32, 3)
    hi = jc.jpeg_encode(img, quality=95)
    lo = jc.jpeg_encode(img, quality=20)
    assert len(lo) < len(hi)
    err_hi = np.abs(jc.jpeg_decode(hi).astype(float) - img).mean()
    err_lo = np.abs(jc.jpeg_decode(lo).astype(float) - img).mean()
    assert err_hi <= err_lo


def test_restart_intervals_reset_dc():
    img = _gradient(40, 56, 3)
    for ri in (1, 3):
        blob = jc.jpeg_encode(img, quality=92, restart_interval=ri)
        assert b"\xFF\xDD" in blob  # DRI present
        dec = jc.jpeg_decode(blob)
        assert np.abs(dec.astype(float) - img).mean() < 5.0


def test_unsupported_streams_fail_loud():
    import struct

    with pytest.raises(ValueError, match="bad SOI"):
        jc.jpeg_decode(b"not a jpeg at all")
    # SOF2 header parses (progressive is supported since round 5); a
    # stream that ENDS there is truncated, not "unsupported"
    sof2 = (b"\xFF\xD8\xFF\xC2" + struct.pack(">H", 11)
            + b"\x08\x00\x10\x00\x10\x01\x01\x11\x00")
    assert jc.jpeg_read_header(sof2) == (16, 16, "L")
    with pytest.raises(ValueError):
        jc.jpeg_decode(sof2)  # no scans → truncated
    # lossless/arithmetic SOF markers stay loud
    sof3 = (b"\xFF\xD8\xFF\xC3" + struct.pack(">H", 11)
            + b"\x08\x00\x10\x00\x10\x01\x01\x11\x00")
    with pytest.raises(ValueError, match="not supported"):
        jc.jpeg_decode(sof3)
    # 4-component (CMYK-shaped) baseline: ValueError, not garbage RGB
    cmyk = (b"\xFF\xD8\xFF\xC0" + struct.pack(">H", 20)
            + b"\x08\x00\x10\x00\x10\x04"
            + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1, 4, 0x11, 1]))
    with pytest.raises(ValueError, match="component"):
        jc.jpeg_read_header(cmyk)
    with pytest.raises(ValueError, match="component"):
        jc.jpeg_decode(cmyk)


def test_progressive_roundtrip_identical_to_baseline():
    """The progressive scan script (interleaved DC first, spectral-band
    AC firsts, DC refinement, AC refinement with correction bits)
    carries the SAME quantized coefficients as the baseline stream, so
    the decodes must be pixel-identical — any drift in EOB runs,
    successive-approximation shifts, or refinement bit order breaks
    equality, not just an error bound."""
    rng = np.random.default_rng(7)
    for shape, q in [((16, 16), 90), ((24, 17, 3), 90), ((8, 8), 50),
                     ((33, 29, 3), 75), ((9, 9), 100)]:
        img = _gradient(shape[0], shape[1], 3 if len(shape) == 3 else 1)
        img = np.clip(img.astype(float)
                      + rng.normal(0, 12, img.shape), 0, 255).astype(np.uint8)
        blob = jc.jpeg_encode_progressive(img, quality=q)
        w, h, mode = jc.jpeg_read_header(blob)
        assert (w, h) == (img.shape[1], img.shape[0])
        assert mode == ("L" if img.ndim == 2 else "RGB")
        base = jc.jpeg_decode(jc.jpeg_encode(img, quality=q))
        prog = jc.jpeg_decode(blob)
        assert np.array_equal(prog, base), (shape, q)


def test_progressive_is_really_sof2_multiscan():
    blob = jc.jpeg_encode_progressive(_gradient(24, 24, 3), quality=90)
    assert b"\xFF\xC2" in blob and b"\xFF\xC0" not in blob
    # DC first + DC refine + (2 AC first bands + 1 AC refine) x 3 comps
    assert blob.count(b"\xFF\xDA") == 11


def test_truncated_jpeg_raises_valueerror_not_indexerror():
    img = _gradient(24, 24, 3)
    blob = jc.jpeg_encode(img, quality=90)
    for cut in (4, len(blob) // 3, len(blob) - 3):
        with pytest.raises(ValueError):
            jc.jpeg_decode(blob[:cut])
    with pytest.raises(ValueError):
        jc.jpeg_read_header(blob[:6])


# CPython ships a real-encoder-produced 4:2:0 JPEG in its own test
# data; resolve it relative to the running stdlib so the test is
# environment-agnostic (skips where the test suite isn't installed)
_REAL_JPEG = os.path.join(os.path.dirname(os.__file__),
                          "test", "imghdrdata", "python.jpg")


@pytest.mark.skipif(not os.path.exists(_REAL_JPEG),
                    reason="no independently-encoded JPEG on this host")
def test_decodes_independently_encoded_420_jpeg():
    """A real-world 4:2:0 JPEG (CPython test data, produced by a real
    encoder): header parses, chroma upsampling runs, pixels plausible —
    guards against encoder/decoder sharing a bug."""
    buf = open(_REAL_JPEG, "rb").read()
    w, h, mode = jc.jpeg_read_header(buf)
    assert (w, h, mode) == (16, 16, "RGB")
    arr = jc.jpeg_decode(buf)
    assert arr.shape == (16, 16, 3)
    # the 16x16 Python logo: dark corners, bright center
    assert arr[0, 0].mean() < 60 and arr[8, 8].mean() > 120


def test_spark_multimodal_jpeg_dispatch(spark):
    """extract_metadata_image and resize_image handle PNG and JPEG
    payloads in the same column, dispatched on magic bytes, through the
    Arrow-batched Spark dataflow."""
    from presto_bloomfilter_spark.functions import png_codec as pc
    from presto_bloomfilter_spark.operators import multimodal as mm

    img = _gradient(24, 30, 3)
    rows = [("j1", jc.jpeg_encode(img, quality=90), "image/jpeg"),
            ("p1", pc.png_encode(img), "image/png")]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    meta = {r.id: (r.width, r.height, r.mode)
            for r in mm.extract_metadata_image(media).collect()}
    assert meta["j1"] == (30, 24, "RGB")
    assert meta["p1"][0:2] == (30, 24)

    resized = {r.id: r for r in mm.resize_image(media, 8, 6).collect()}
    assert all(r.width == 8 and r.height == 6 for r in resized.values())
    if mm._pil() is None:
        # stdlib path re-encodes as PNG; verify decodability + dims
        arr = pc.png_decode(bytes(resized["j1"].resized))
        assert arr.shape[:2] == (6, 8)
        # native JPEG output too
        out_j = mm.resize_image(media, 8, 6, fmt="JPEG").collect()
        for r in out_j:
            assert jc.jpeg_read_header(bytes(r.resized))[:2] == (8, 6)
