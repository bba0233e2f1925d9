"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through Spark as ``binary`` columns with a
metadata struct; decode / feature-extraction runs as Arrow-batched
mapInPandas so bytes never round-trip through Python row objects.

Decode dispatch: when PIL is importable at runtime,
``extract_metadata_image`` / ``resize_image`` use it (all formats);
without it they fall back to the dependency-free baseline-PNG codec
(`functions/png_codec.py`, stdlib zlib+struct) — REAL decode/resize
for 8-bit gray/RGB/RGBA PNGs, which is what ML-pipeline thumbnails
and our fixtures use.  Non-PNG payloads without PIL raise
NotImplementedError per-batch.  The ``*_stub`` forms remain for
format-agnostic dataflow tests (deterministic fake dimensions).
"""

from __future__ import annotations

import hashlib
import io
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

from ..functions import jpeg_codec, png_codec, wav_codec, y4m_codec

MEDIA_SCHEMA = "id string, media binary, media_type string"
META_SCHEMA = "id string, n_bytes int, first_byte int, fake_width int, fake_height int"


def _pil():
    """PIL.Image when installed, else None — the runtime feature gate."""
    try:
        from PIL import Image  # noqa: PLC0415 — optional dependency

        return Image
    except ImportError:
        return None


def _decode_any(blob: bytes):
    """(width, height, mode) via PIL when present, else the stdlib
    codecs (PNG or baseline JPEG, dispatched on magic bytes)."""
    image_mod = _pil()
    if image_mod is not None:
        img = image_mod.open(io.BytesIO(blob))
        return img.width, img.height, img.mode
    if blob[:2] == b"\xFF\xD8":
        return jpeg_codec.jpeg_read_header(blob)
    return png_codec.png_read_header(blob)  # raises ValueError on non-PNG


def _decode_pixels(blob: bytes):
    """uint8 pixel array via the stdlib codecs (PNG / baseline JPEG)."""
    if blob[:2] == b"\xFF\xD8":
        return jpeg_codec.jpeg_decode(blob)
    return png_codec.png_decode(blob)


def _unsupported(blob: bytes) -> NotImplementedError:
    head = blob[:8].hex() if blob else "<empty>"
    return NotImplementedError(
        "payload is not a baseline PNG or baseline JPEG and Pillow (PIL) "
        f"is not installed (leading bytes {head}); install Pillow for "
        "other formats or use the *_stub forms for format-agnostic dataflow"
    )


def attach_media(df: DataFrame, payload_col: str, id_col: str = "doc_id",
                 media_type: str = "image/fake") -> DataFrame:
    """Wrap an existing column's bytes as an opaque media payload."""
    return df.select(
        F.col(id_col).cast("string").alias("id"),
        F.encode(F.col(payload_col), "utf-8").alias("media"),
        F.lit(media_type).alias("media_type"),
    )


def decode_stub(payload: bytes) -> tuple[int, int, int, int]:
    """Deterministic fake decode: (n_bytes, first_byte, width, height).

    A real implementation would call PIL/libav here and raise
    NotImplementedError on unsupported types; the fake keeps the
    dataflow testable without media libraries.
    """
    n = len(payload)
    first = payload[0] if n else 0
    return n, first, (n % 640) + 1, (n % 480) + 1


def extract_metadata(media_df: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction over binary payloads."""

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = [decode_stub(b if b is not None else b"") for b in pdf["media"]]
            arr = np.array(metas, dtype=np.int64).reshape(len(pdf), 4)
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "n_bytes": arr[:, 0],
                    "first_byte": arr[:, 1],
                    "fake_width": arr[:, 2],
                    "fake_height": arr[:, 3],
                }
            )

    return media_df.select("id", "media").mapInPandas(fn, META_SCHEMA)


def extract_metadata_image(media_df: DataFrame) -> DataFrame:
    """REAL image metadata — PIL when installed (all formats), else the
    stdlib baseline-PNG codec.  Same Arrow-batched dataflow as the
    stub; output (id, n_bytes, width, height, mode)."""

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ns, ws, hs, modes = [], [], [], []
            for blob in pdf["media"]:
                blob = bytes(blob) if blob is not None else b""
                try:
                    w, h, mode = _decode_any(blob)
                except ValueError as e:
                    raise _unsupported(blob) from e
                ns.append(len(blob))
                ws.append(w)
                hs.append(h)
                modes.append(mode)
            yield pd.DataFrame(
                {"id": pdf["id"], "n_bytes": ns, "width": ws, "height": hs, "mode": modes}
            )

    return media_df.select("id", "media").mapInPandas(
        fn, "id string, n_bytes int, width int, height int, mode string"
    )


def resize_image(media_df: DataFrame, width: int = 224, height: int = 224,
                 fmt: str = "PNG") -> DataFrame:
    """REAL image resize — PIL when installed (any input format, output
    ``fmt``), else stdlib decode (PNG or baseline JPEG, by magic bytes)
    → nearest-neighbor resample → re-encode.  Binary in, re-encoded
    fixed-dimension binary out — identical schema and batch shape to
    resize_stub, so pipelines swap decoder by function name only."""
    if _pil() is None and fmt.upper() not in ("PNG", "JPEG", "JPG"):
        raise NotImplementedError(
            f"output format {fmt!r} requires Pillow; PNG and baseline "
            f"JPEG are supported natively")

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        image_mod = _pil()
        for pdf in it:
            payloads = []
            for blob in pdf["media"]:
                blob = bytes(blob)
                if image_mod is not None:
                    img = image_mod.open(io.BytesIO(blob))
                    out = io.BytesIO()
                    img.resize((width, height)).save(out, format=fmt)
                    payloads.append(out.getvalue())
                else:
                    try:
                        arr = _decode_pixels(blob)
                    except ValueError as e:
                        raise _unsupported(blob) from e
                    resized = png_codec.resize_nearest(arr, width, height)
                    if fmt.upper() in ("JPEG", "JPG"):
                        payloads.append(jpeg_codec.jpeg_encode(resized))
                    else:
                        payloads.append(png_codec.png_encode(resized))
            yield pd.DataFrame(
                {"id": pdf["id"], "resized": payloads,
                 "width": np.full(len(pdf), width, dtype=np.int32),
                 "height": np.full(len(pdf), height, dtype=np.int32)}
            )

    return media_df.select("id", "media").mapInPandas(
        fn, "id string, resized binary, width int, height int"
    )


def frame_sample(media_df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' stub: one row per sampled offset with a
    deterministic fake frame hash — exercises the fan-out (explode)
    shape a video pipeline produces, where output rows >> input rows."""

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, offs, hashes = [], [], []
            for did, blob in zip(pdf["id"], pdf["media"]):
                blob = blob or b""
                for off in range(0, max(len(blob), 1), every_n_bytes):
                    chunk = blob[off : off + every_n_bytes]
                    ids.append(did)
                    offs.append(off)
                    # process-independent hash (builtin hash() is salted)
                    hashes.append(int.from_bytes(hashlib.md5(chunk).digest()[:8], "little") >> 1)
            yield pd.DataFrame({"id": ids, "frame_off": offs, "frame_hash": hashes})

    return media_df.select("id", "media").mapInPandas(
        fn, "id string, frame_off int, frame_hash long"
    )


def extract_metadata_audio(media_df: DataFrame) -> DataFrame:
    """REAL audio metadata via the stdlib WAV codec (functions/
    wav_codec.py — RIFF/WAVE, PCM + IEEE float): header-only parse, no
    sample reads.  Output (id, n_bytes, sample_rate, n_channels, bits,
    n_frames, duration_s)."""

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k: [] for k in
                    ("n_bytes", "sample_rate", "n_channels", "bits",
                     "n_frames", "duration_s")}
            for blob in pdf["media"]:
                blob = bytes(blob) if blob is not None else b""
                h = wav_codec.wav_read_header(blob)
                rows["n_bytes"].append(len(blob))
                rows["sample_rate"].append(h["sample_rate"])
                rows["n_channels"].append(h["n_channels"])
                rows["bits"].append(h["bits"])
                rows["n_frames"].append(h["n_frames"])
                rows["duration_s"].append(h["n_frames"] / h["sample_rate"])
            yield pd.DataFrame({"id": pdf["id"], **rows})

    return media_df.select("id", "media").mapInPandas(
        fn, "id string, n_bytes int, sample_rate int, n_channels int, "
            "bits int, n_frames long, duration_s double")


def audio_features(media_df: DataFrame) -> DataFrame:
    """REAL audio feature extraction: decode (stdlib WAV codec) →
    vectorized numpy kernels per payload.  Features are in NATIVE
    sample units (int16 amplitudes stay integers) so fixture oracles
    are exact: rms = sqrt(mean(x^2)) over all channels, peak =
    max |x|, zcr = sign-change rate of channel 0 over frames
    (crossings/(n_frames-1); 0 when < 2 frames).  Output (id,
    duration_s, rms, peak, zcr)."""

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            durs, rmss, peaks, zcrs = [], [], [], []
            for blob in pdf["media"]:
                x, rate = wav_codec.wav_decode(bytes(blob))
                xf = x.astype(np.float64, copy=False)
                n = x.shape[0]
                durs.append(n / rate)
                rmss.append(float(np.sqrt(np.mean(xf * xf))) if n else 0.0)
                peaks.append(float(np.abs(xf).max()) if n else 0.0)
                if n >= 2:
                    c0 = xf[:, 0]
                    # a crossing is a strict sign flip; zeros carry the
                    # previous sign (np.sign(0)=0 would double-count)
                    s = np.sign(c0)
                    zero = s == 0
                    if zero.any():
                        idx = np.arange(n)
                        last = np.maximum.accumulate(
                            np.where(~zero, idx, -1))
                        s = np.where(last >= 0, s[np.maximum(last, 0)], 0.0)
                    zcrs.append(float(np.count_nonzero(
                        s[1:] * s[:-1] < 0)) / (n - 1))
                else:
                    zcrs.append(0.0)
            yield pd.DataFrame({"id": pdf["id"], "duration_s": durs,
                                "rms": rmss, "peak": peaks, "zcr": zcrs})

    return media_df.select("id", "media").mapInPandas(
        fn, "id string, duration_s double, rms double, peak double, "
            "zcr double")


def resample_audio(media_df: DataFrame, rate_out: int,
                   bits: int = 16) -> DataFrame:
    """Decode → linear-interp resample → re-encode (integer PCM) —
    binary in, binary out, like resize_image for audio.  Output (id,
    media, sample_rate, n_frames)."""

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs, n_out = [], []
            for blob in pdf["media"]:
                x, rate = wav_codec.wav_decode(bytes(blob))
                y = wav_codec.resample_linear(x, rate, rate_out)
                lim = float(1 << (bits - 1))
                y = np.clip(np.rint(y), -lim, lim - 1)
                blobs.append(wav_codec.wav_encode(y, rate_out, bits))
                n_out.append(y.shape[0])
            yield pd.DataFrame({
                "id": pdf["id"], "media": blobs,
                "sample_rate": np.full(len(pdf), rate_out, np.int32),
                "n_frames": np.asarray(n_out, np.int64)})

    return media_df.select("id", "media").mapInPandas(
        fn, "id string, media binary, sample_rate int, n_frames long")


def extract_metadata_video(media_df: DataFrame) -> DataFrame:
    """REAL video metadata via the stdlib Y4M codec (functions/
    y4m_codec.py): frame COUNT comes from the O(n_frames) offset walk,
    no pixel reads.  Output (id, n_bytes, width, height, fps_num,
    fps_den, chroma, n_frames)."""

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k: [] for k in ("n_bytes", "width", "height",
                                    "fps_num", "fps_den", "chroma",
                                    "n_frames")}
            for blob in pdf["media"]:
                blob = bytes(blob) if blob is not None else b""
                h = y4m_codec.y4m_read_header(blob)
                rows["n_bytes"].append(len(blob))
                rows["width"].append(h["w"])
                rows["height"].append(h["h"])
                rows["fps_num"].append(h["fps_num"])
                rows["fps_den"].append(h["fps_den"])
                rows["chroma"].append(h["chroma"])
                rows["n_frames"].append(h["n_frames"])
            yield pd.DataFrame({"id": pdf["id"], **rows})

    return media_df.select("id", "media").mapInPandas(
        fn, "id string, n_bytes int, width int, height int, "
            "fps_num int, fps_den int, chroma string, n_frames int")


def frame_sample_video(media_df: DataFrame, every_n: int = 1,
                       max_frames: int | None = None,
                       to_png: bool = False) -> DataFrame:
    """REAL video frame sampling (the fan-out shape: output rows >>
    input rows): frames 0, every_n, 2*every_n, ... are sliced straight
    out of the payload via the frame-offset index — unsampled frames
    are never touched, so sampling 3 of 10k frames reads 3 planes.
    Output (id, frame_idx, width, height, y_mean, cb_mean, cr_mean
    [, frame_png]); ``to_png=True`` re-encodes each sampled Y plane as
    a grayscale PNG — the handoff into the image operators
    (extract_metadata_image / resize_image / feature extraction)."""
    if every_n < 1:
        raise ValueError("every_n must be >= 1")

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in ("id", "frame_idx", "width", "height",
                                   "y_mean", "cb_mean", "cr_mean")}
            pngs = []
            for did, blob in zip(pdf["id"], pdf["media"]):
                blob = bytes(blob)
                hdr, offsets = y4m_codec.y4m_index(blob)
                take = offsets[::every_n]
                idxs = range(0, len(offsets), every_n)
                if max_frames is not None:
                    take = take[:max_frames]
                for fi, off in zip(idxs, take):
                    y, cb, cr = y4m_codec.y4m_decode_frame(blob, hdr, off)
                    out["id"].append(did)
                    out["frame_idx"].append(fi)
                    out["width"].append(hdr["w"])
                    out["height"].append(hdr["h"])
                    out["y_mean"].append(float(y.mean()))
                    out["cb_mean"].append(
                        float(cb.mean()) if cb is not None else None)
                    out["cr_mean"].append(
                        float(cr.mean()) if cr is not None else None)
                    if to_png:
                        pngs.append(png_codec.png_encode(y))
            if to_png:
                out["frame_png"] = pngs
            yield pd.DataFrame(out)

    schema = ("id string, frame_idx int, width int, height int, "
              "y_mean double, cb_mean double, cr_mean double")
    if to_png:
        schema += ", frame_png binary"
    return media_df.select("id", "media").mapInPandas(fn, schema)


def resize_stub(media_df: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """'Resize' stub: emits a deterministic fixed-size payload per input
    (resampled byte grid), preserving the real pipeline's shape — binary
    in, fixed-size binary out, constant output row width so downstream
    batch sizes are predictable.  A real implementation swaps the byte
    resample for PIL/libvips; the Spark-side schema, Arrow batching and
    size accounting are what this exercises.
    """
    out_len = width * height // 64  # keep the fake payload small

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for blob in pdf["media"]:
                blob = blob or b"\0"
                src = np.frombuffer(blob, dtype=np.uint8)
                idx = np.linspace(0, len(src) - 1, out_len).astype(np.int64)
                payloads.append(src[idx].tobytes())
            yield pd.DataFrame(
                {"id": pdf["id"], "resized": payloads,
                 "width": np.full(len(pdf), width, dtype=np.int32),
                 "height": np.full(len(pdf), height, dtype=np.int32)}
            )

    return media_df.select("id", "media").mapInPandas(
        fn, "id string, resized binary, width int, height int"
    )


def feature_stub(media_df: DataFrame, dim: int = 16) -> DataFrame:
    """'Feature extraction' stub: deterministic pseudo-embedding per
    payload (hash-seeded), array<float> out — the handoff shape into
    the similarity operators (cosine_topk / ivf_topk)."""

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for blob in pdf["media"]:
                seed = int.from_bytes(hashlib.md5(blob or b"").digest()[:8], "little")
                rng = np.random.default_rng(seed)
                feats.append(rng.standard_normal(dim).astype(float).tolist())
            yield pd.DataFrame({"id": pdf["id"], "feature": feats})

    return media_df.select("id", "media").mapInPandas(
        fn, "id string, feature array<double>"
    )
