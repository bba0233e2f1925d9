"""WAV + Y4M codecs and the real audio/video multimodal operators."""

import struct

import numpy as np
import pandas as pd
import pytest

from presto_bloomfilter_spark.functions import png_codec, wav_codec, y4m_codec
from presto_bloomfilter_spark.operators import multimodal as mm


# ---- WAV codec ---------------------------------------------------------------


@pytest.mark.parametrize("bits", [8, 16, 24, 32])
@pytest.mark.parametrize("channels", [1, 2])
def test_wav_roundtrip_int_pcm(bits, channels):
    rng = np.random.default_rng(bits * 10 + channels)
    lim = 1 << (bits - 1)
    x = rng.integers(-lim, lim, size=(400, channels), dtype=np.int64)
    blob = wav_codec.wav_encode(x, 16_000, bits)
    h = wav_codec.wav_read_header(blob)
    assert (h["n_channels"], h["sample_rate"], h["bits"], h["n_frames"]) \
        == (channels, 16_000, bits, 400)
    back, rate = wav_codec.wav_decode(blob)
    assert rate == 16_000
    assert np.array_equal(back.astype(np.int64), x)


def test_wav_float_decode():
    x = np.linspace(-1, 1, 100, dtype=np.float32)
    raw = x.tobytes()
    fmt = struct.pack("<HHIIHH", 3, 1, 8_000, 8_000 * 4, 4, 32)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(raw)) + raw)
    blob = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    back, rate = wav_codec.wav_decode(blob)
    assert rate == 8_000
    assert np.allclose(back[:, 0], x)


def test_wav_skips_unknown_chunks_and_pads():
    x = np.array([[1], [-2], [3]], np.int64)
    blob = wav_codec.wav_encode(x, 44_100, 16)
    # splice an odd-sized LIST chunk (plus its pad byte) before fmt
    inner = blob[12:]
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\0"
    spliced = (b"RIFF" + struct.pack("<I", 4 + len(extra) + len(inner))
               + b"WAVE" + extra + inner)
    back, rate = wav_codec.wav_decode(spliced)
    assert np.array_equal(back[:, 0], [1, -2, 3])


def test_wav_guards():
    with pytest.raises(ValueError):
        wav_codec.wav_read_header(b"garbage")
    with pytest.raises(ValueError):
        wav_codec.wav_read_header(b"RIFF\x04\x00\x00\x00WAVE")
    ok = wav_codec.wav_encode(np.zeros((4, 1)), 8_000, 16)
    # corrupt the format tag to an unsupported codec (e.g. 2 = ADPCM)
    bad = bytearray(ok)
    bad[20] = 2
    with pytest.raises(ValueError, match="format tag"):
        wav_codec.wav_read_header(bytes(bad))
    with pytest.raises(ValueError, match="range"):
        wav_codec.wav_encode(np.array([40_000.0]), 8_000, 16)
    with pytest.raises(ValueError, match="truncated"):
        wav_codec.wav_read_header(ok[:-3])


def test_resample_linear_exact_on_ramp():
    ramp = np.arange(11, dtype=np.float64)  # 0..10
    up = wav_codec.resample_linear(ramp, 1_000, 2_000)
    assert up.shape == (22, 1)
    # linear interp of a line is the line itself
    assert np.allclose(up[:, 0], np.linspace(0, 10, 22))
    assert wav_codec.resample_linear(np.empty(0), 8_000, 4_000).shape[0] == 0


# ---- Y4M codec ---------------------------------------------------------------


def _frames(n, w, h, chroma="420jpeg", seed=0):
    out = []
    for i in range(n):
        y = np.full((h, w), (seed + i * 13) % 256, np.uint8)
        if chroma == "mono":
            out.append((y, None, None))
        else:
            xd, yd = {"420jpeg": (2, 2), "422": (2, 1), "444": (1, 1)}[chroma]
            cb = np.full((h // yd, w // xd), 128, np.uint8)
            cr = np.full((h // yd, w // xd), 64, np.uint8)
            out.append((y, cb, cr))
    return out


@pytest.mark.parametrize("chroma", ["420jpeg", "422", "444", "mono"])
def test_y4m_roundtrip(chroma):
    frames = _frames(5, 16, 8, chroma, seed=7)
    blob = y4m_codec.y4m_encode(frames, fps=(25, 1), chroma=chroma)
    hdr = y4m_codec.y4m_read_header(blob)
    assert (hdr["w"], hdr["h"], hdr["n_frames"]) == (16, 8, 5)
    assert (hdr["fps_num"], hdr["fps_den"]) == (25, 1)
    h2, offsets = y4m_codec.y4m_index(blob)
    for i, off in enumerate(offsets):
        y, cb, cr = y4m_codec.y4m_decode_frame(blob, h2, off)
        assert np.array_equal(y, frames[i][0])
        if chroma == "mono":
            assert cb is None
        else:
            assert np.array_equal(cb, frames[i][1])
            assert np.array_equal(cr, frames[i][2])


def test_y4m_guards():
    with pytest.raises(ValueError):
        y4m_codec.y4m_read_header(b"not a video")
    blob = y4m_codec.y4m_encode(_frames(2, 8, 4))
    with pytest.raises(ValueError, match="truncated"):
        y4m_codec.y4m_read_header(blob[:-5])
    with pytest.raises(ValueError, match="divisible"):
        y4m_codec.y4m_read_header(b"YUV4MPEG2 W7 H4 F30:1 C420jpeg\n")
    with pytest.raises(ValueError, match="colorspace"):
        y4m_codec.y4m_read_header(b"YUV4MPEG2 W8 H4 F30:1 C410\n")


# ---- Spark operators ---------------------------------------------------------


def _audio_df(spark, n_docs=20):
    rows = []
    for i in range(n_docs):
        rate = 8_000 + (i % 3) * 4_000
        amp = (i % 50 + 1) * 300
        period = i % 7 + 2
        m = i % 20 + 4
        n_frames = 2 * period * m
        # square wave, both channels identical: rms == peak == amp exact,
        # sign flips every `period` frames
        t = np.arange(n_frames)
        sq = np.where((t // period) % 2 == 0, amp, -amp)
        ch = 1 + i % 2
        x = np.repeat(sq[:, None], ch, axis=1)
        rows.append((f"a{i}", wav_codec.wav_encode(x, rate, 16), rate, amp,
                     n_frames, ch, period))
    df = spark.createDataFrame(
        [(r[0], r[1]) for r in rows], "id string, media binary")
    return df, rows


def test_audio_metadata_and_features(spark):
    df, rows = _audio_df(spark)
    meta = {r.id: r for r in mm.extract_metadata_audio(df).collect()}
    feat = {r.id: r for r in mm.audio_features(df).collect()}
    for rid, _, rate, amp, n_frames, ch, period in rows:
        M, X = meta[rid], feat[rid]
        assert (M.sample_rate, M.n_channels, M.bits, M.n_frames) \
            == (rate, ch, 16, n_frames)
        assert M.duration_s == n_frames / rate
        assert X.rms == float(amp)        # square wave: exact
        assert X.peak == float(amp)
        crossings = n_frames // period - 1
        assert X.zcr == crossings / (n_frames - 1)


def test_resample_audio_halves_frames(spark):
    df, rows = _audio_df(spark, n_docs=4)
    out = {r.id: r for r in mm.resample_audio(df, 4_000).collect()}
    for rid, _, rate, _, n_frames, _, _ in rows:
        r = out[rid]
        assert r.sample_rate == 4_000
        assert r.n_frames == round(n_frames * 4_000 / rate)
        h = wav_codec.wav_read_header(bytes(r.media))
        assert h["sample_rate"] == 4_000 and h["n_frames"] == r.n_frames


def _video_df(spark, n_docs=8):
    rows = []
    for i in range(n_docs):
        w, h = (i % 5 + 2) * 2, (i % 3 + 2) * 2
        nf = i % 6 + 3
        blob = y4m_codec.y4m_encode(_frames(nf, w, h, seed=i), fps=(30, 1))
        rows.append((f"v{i}", blob, w, h, nf, i))
    df = spark.createDataFrame(
        [(r[0], r[1]) for r in rows], "id string, media binary")
    return df, rows


def test_video_metadata_and_frame_sampling(spark):
    df, rows = _video_df(spark)
    meta = {r.id: r for r in mm.extract_metadata_video(df).collect()}
    for rid, blob, w, h, nf, _ in rows:
        M = meta[rid]
        assert (M.width, M.height, M.n_frames, M.chroma) \
            == (w, h, nf, "420jpeg")
    samp = mm.frame_sample_video(df, every_n=2).collect()
    by_id = {}
    for r in samp:
        by_id.setdefault(r.id, []).append(r)
    for rid, blob, w, h, nf, seed in rows:
        got = sorted(by_id[rid], key=lambda r: r.frame_idx)
        assert [r.frame_idx for r in got] == list(range(0, nf, 2))
        for r in got:
            assert r.y_mean == float((seed + r.frame_idx * 13) % 256)
            assert r.cb_mean == 128.0 and r.cr_mean == 64.0


def test_frame_png_handoff_into_image_ops(spark):
    """Video frames → grayscale PNG → the IMAGE metadata operator: the
    cross-modality pipeline handoff is real end-to-end."""
    df, rows = _video_df(spark, n_docs=3)
    framed = mm.frame_sample_video(df, every_n=1, max_frames=2, to_png=True)
    media = framed.selectExpr(
        "concat(id, '#', CAST(frame_idx AS STRING)) AS id",
        "frame_png AS media")
    meta = {r.id: r for r in mm.extract_metadata_image(media).collect()}
    assert len(meta) == 6
    for rid, _, w, h, _, _ in rows:
        m = meta[f"{rid}#0"]
        assert (m.width, m.height) == (w, h)
        assert m.mode in ("L", "L;8", "gray", "GRAY")  # grayscale
    # pixel-exact: decode one PNG back and compare to the Y plane value
    one = framed.filter("frame_idx = 0").limit(1).collect()[0]
    arr = png_codec.png_decode(bytes(one.frame_png))
    assert int(arr.max()) == int(arr.min())  # constant plane survived


def test_audio_guard_on_garbage(spark):
    df = spark.createDataFrame([("x", b"not audio")], "id string, media binary")
    with pytest.raises(Exception, match="RIFF|WAVE"):
        mm.extract_metadata_audio(df).collect()
