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

from ..functions import jpeg_codec, png_codec

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
