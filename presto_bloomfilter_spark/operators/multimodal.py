"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through Spark as ``binary`` columns with a
metadata struct; decode / feature-extraction runs as Arrow-batched
mapInPandas so bytes never round-trip through Python row objects.

The actual media decode is STUBBED (no image/audio libs in this
container): ``decode_stub`` derives deterministic fake dimensions from
the payload so the Spark-side plumbing — schema, batch shape, UDF
signatures, partitioning — is real and testable end-to-end.  Swapping
in a real decoder is a one-function change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = "id string, media binary, media_type string"
META_SCHEMA = "id string, n_bytes int, first_byte int, fake_width int, fake_height int"


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
