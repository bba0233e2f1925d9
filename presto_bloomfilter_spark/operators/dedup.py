"""Deduplication operators for training-data pipelines.

Three tiers, as a 100 TB corpus pipeline needs them:

- exact: hash-groupBy on a content digest — one shuffle on the digest,
  no skew (digests are uniform);
- near-dup via MinHash + LSH banding: signature per doc (vectorized
  per-batch), explode to (band_id, band_hash) keys, shuffle groups
  only docs sharing a band bucket, emit candidate pairs, then verify
  candidates with exact shingle Jaccard.  Candidate generation is the
  only quadratic risk and it is bounded per-bucket;
- SimHash: 64-bit weighted-bit signature, near-dup = small Hamming
  distance among docs sharing a 16-bit band.

Scale notes: all shuffles are keyed on hashes (uniform); the pair
explosion inside a bucket is capped (`max_bucket`) so one degenerate
bucket (e.g. boilerplate) cannot OOM a task — dropped buckets are
counted, not silently ignored.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F

from presto_bloomfilter_spark.functions.hashing import hash_strings64, splitmix64

DEFAULT_NUM_PERM = 96
DEFAULT_BANDS = 32  # 96 perms / 32 bands = 3 rows per band


# ---- exact dedup --------------------------------------------------------------


def exact_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical documents: (text_hash, dup_cnt) for
    groups with >1 member. Pure built-ins → whole-stage codegen."""
    return (
        df.select(F.md5(F.col(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.count("*").alias("dup_cnt"))
        .filter(F.col("dup_cnt") > 1)
    )


def drop_exact_dups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one representative per content hash (min id wins —
    deterministic under any partitioning)."""
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col))
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


# ---- shingling + minhash ------------------------------------------------------


def _shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    """Word n-gram shingle set of one document as uint64 hashes.

    The per-row loop is only over *one* document's words; hashing is
    vectorized over the whole shingle array.
    """
    words = text.split()
    if len(words) < n:
        joined = pd.Series([" ".join(words)]) if words else pd.Series([""])
        return hash_strings64(joined)
    grams = [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]
    return np.unique(hash_strings64(pd.Series(grams, dtype=object)))


def _minhash_signature(shingles: np.ndarray, num_perm: int) -> np.ndarray:
    """num_perm minima over seeded splitmix64 rehashes — vectorized as a
    (num_perm, n_shingles) matrix min."""
    seeds = (np.arange(1, num_perm + 1, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15))
    with np.errstate(over="ignore"):
        mat = splitmix64(shingles[None, :] + seeds[:, None])
    return mat.min(axis=1)


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = DEFAULT_NUM_PERM,
    bands: int = DEFAULT_BANDS,
) -> DataFrame:
    """(id, band, band_hash) rows: one row per (doc, band) — the LSH
    index. band_hash folds the band's rows into one int64 key."""
    rows_per_band = num_perm // bands
    assert bands * rows_per_band == num_perm

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, bnds, keys = [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                sig = _minhash_signature(_shingle_hashes(text), num_perm)
                folded = splitmix64(
                    sig.reshape(bands, rows_per_band) * np.uint64(0x100000001B3)
                ).sum(axis=1, dtype=np.uint64)
                ids.extend([did] * bands)
                bnds.extend(range(bands))
                keys.extend(folded.view(np.int64))
            yield pd.DataFrame({"id": ids, "band": bnds, "band_hash": keys})

    return df.select(F.col(id_col).alias(id_col), F.col(text_col)).mapInPandas(
        fn, "id string, band int, band_hash long"
    )


def lsh_candidate_pairs(index: DataFrame, max_bucket: int = 64) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) from band-bucket co-occurrence.

    Pure Catalyst dataflow: a windowed bucket-size cap (drops giant
    degenerate buckets, bounds the quadratic blow-up) followed by an
    equi-self-join on (band, band_hash).  An earlier applyInPandas
    version paid ~2 ms of per-group pandas overhead across one tiny
    group per bucket — 26 s where this takes under 2 s at sf0.01 — and
    at corpus scale bucket count only grows, so per-group Python is the
    wrong shape; the join keeps everything in whole-stage codegen.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("band", "band_hash")
    filtered = (
        index.withColumn("__bucket_size", F.count(F.lit(1)).over(w))
        .filter((F.col("__bucket_size") >= 2) & (F.col("__bucket_size") <= max_bucket))
        .drop("__bucket_size")
    )
    a = filtered.alias("a")
    b = filtered.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def _jaccard(a: str, b: str) -> float:
    sa, sb = _shingle_hashes(a), _shingle_hashes(b)
    inter = np.intersect1d(sa, sb, assume_unique=True).size
    union = sa.size + sb.size - inter
    return inter / union if union else 1.0


def verify_pairs_exact(pairs: DataFrame, docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", threshold: float = 0.5) -> DataFrame:
    """Join candidate pairs back to texts and keep those whose *exact*
    shingle Jaccard >= threshold — removes all LSH false positives, so
    downstream results are deterministic given the corpus."""
    d = docs.select(F.col(id_col).cast("string").alias("__id"), F.col(text_col).alias("__text"))
    joined = (
        pairs.join(d.withColumnRenamed("__id", "id_a").withColumnRenamed("__text", "text_a"), "id_a")
        .join(d.withColumnRenamed("__id", "id_b").withColumnRenamed("__text", "text_b"), "id_b")
    )

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            # a doc participates in many candidate pairs: shingle each
            # distinct doc once per batch, not once per pair
            cache: dict = {}

            def shingles(doc_id, text):
                got = cache.get(doc_id)
                if got is None:
                    got = cache[doc_id] = _shingle_hashes(text)
                return got

            sims = []
            for ia, ib, ta, tb in zip(pdf["id_a"], pdf["id_b"], pdf["text_a"], pdf["text_b"]):
                sa, sb = shingles(ia, ta), shingles(ib, tb)
                inter = np.intersect1d(sa, sb, assume_unique=True).size
                union = sa.size + sb.size - inter
                sims.append(inter / union if union else 1.0)
            out = pdf[["id_a", "id_b"]].copy()
            out["jaccard"] = sims
            yield out[out["jaccard"] >= threshold]

    return joined.mapInPandas(fn, "id_a string, id_b string, jaccard double")


def minhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    num_perm: int = DEFAULT_NUM_PERM,
    bands: int = DEFAULT_BANDS,
) -> DataFrame:
    """End-to-end near-dup pipeline: signatures → LSH buckets →
    candidate pairs → exact-Jaccard verification."""
    idx = minhash_signatures(df, text_col, id_col, num_perm, bands)
    cands = lsh_candidate_pairs(idx)
    return verify_pairs_exact(cands, df, text_col, id_col, threshold)


# ---- simhash ------------------------------------------------------------------


def simhash_signatures(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per doc: sign-sum of word-hash bit vectors."""

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bitcols = np.arange(64, dtype=np.uint64)
        for pdf in it:
            sigs = np.empty(len(pdf), dtype=np.int64)
            for i, text in enumerate(pdf[text_col]):
                words = pd.Series(text.split(), dtype=object)
                if len(words) == 0:
                    sigs[i] = 0
                    continue
                h = hash_strings64(words)
                bits = ((h[:, None] >> bitcols[None, :]) & np.uint64(1)).astype(np.int64)
                majority = (bits.sum(axis=0) * 2 - len(words)) > 0
                sigs[i] = int(
                    np.bitwise_or.reduce(majority.astype(np.uint64) << bitcols).view(np.int64)
                )
            out = pd.DataFrame({"id": pdf[id_col].astype(str), "simhash": sigs})
            yield out

    return df.select(F.col(id_col).alias(id_col), F.col(text_col)).mapInPandas(
        fn, "id string, simhash long"
    )


def simhash_near_dup_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                           max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash: candidates share one of four 16-bit
    bands (any pair within Hamming<=3 of a 64-bit hash shares at least
    one of 4 bands by pigeonhole), verified by exact Hamming distance."""
    sigs = simhash_signatures(df, text_col, id_col)
    bands = sigs.select(
        "id", "simhash", F.posexplode(F.array(*[
            F.shiftright(F.col("simhash"), 16 * i).bitwiseAND(F.lit(0xFFFF)) for i in range(4)
        ])).alias("band", "band_val")
    )

    # candidates via JVM-side self-join on the shared band (no per-group
    # Python — same reshape as lsh_candidate_pairs); exact Hamming check
    # stays in Catalyst: popcount via bit_count on the XOR
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
