"""Byte-level BPE tokenizer: train a merges table on a bounded sample,
apply it corpus-wide with a vectorized Arrow-batch kernel.

The reference repo ships no tokenizer (its unit of work is the already-
hashed element, BloomFilter.java put/mightContain); this module supplies
the piece a training-data pipeline needs IN FRONT of those sketches —
the real merges-table BPE that turns raw ``documents.text`` into the
``tokens array<int32>`` / ``n_tok`` shape the corpus tables, packing,
and quantile operators consume.  ``text.token_count_bpe``'s regex is
the pre-tokenizer of this algorithm; this module runs the actual merge
phase (Sennrich et al. 2016, arXiv:1508.07909; byte-level
pre-tokenization in the GPT-2 style).

Scale posture:
- training runs driver-side over a BOUNDED sample (same stance as
  pq_train / spherical_kmeans): chunk counting is a distributed
  groupBy, only the capped unique-chunk histogram is collected;
- apply is one map-only pass: JVM regex pre-tokenization feeds an
  Arrow-batch numpy kernel that merges the whole batch's byte stream
  at once (one vectorized scan per merge rank, chunk boundaries
  enforced by id), with zero per-row Python;
- the merges table is a few KB — a closure broadcast, never a join.

Correctness anchors: merges applied in rank order over a flat stream
are equivalent to the classic per-word lowest-rank-first loop (a pair
involving the symbol born at rank k can only have rank > k, so earlier
ranks never become newly applicable), and leftmost-first overlap
resolution within runs (``aaa`` under merge ``a+a``) is done with a
vectorized run-parity mask.  ``encode_chunk_reference`` is the
independent per-chunk implementation the tests and the DuckDB-side
gate oracle check the kernel against; ``detokenize_bpe`` restores the
original text byte-exactly because the pre-tokenizer spans the whole
string (spaces ride along as chunk prefixes).
"""

from __future__ import annotations

import json
from collections import Counter
from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, functions as F

from presto_bloomfilter_spark.operators.text import BPE_ISH_PATTERN

_BYTE_VOCAB = 256


class BPEMerges:
    """An ordered merges table.  Rank ``r`` merges the pair
    ``merges[r] = (a, b)`` into the new symbol id ``256 + r``; ids
    0-255 are the raw bytes."""

    def __init__(self, merges: list[tuple[int, int]]):
        self.merges = [(int(a), int(b)) for a, b in merges]
        for r, (a, b) in enumerate(self.merges):
            top = _BYTE_VOCAB + r
            if not (0 <= a < top and 0 <= b < top):
                raise ValueError(f"merge {r} refers to symbol not yet defined: {(a, b)}")
        self._rank = {p: r for r, p in enumerate(self.merges)}

    @property
    def vocab_size(self) -> int:
        return _BYTE_VOCAB + len(self.merges)

    def vocab_bytes(self) -> list[bytes]:
        """id → its byte string (raw bytes, then merged concatenations)."""
        out = [bytes([i]) for i in range(_BYTE_VOCAB)]
        for a, b in self.merges:
            out.append(out[a] + out[b])
        return out

    def to_json(self) -> str:
        return json.dumps({"merges": self.merges})

    @classmethod
    def from_json(cls, s: str) -> "BPEMerges":
        return cls([tuple(p) for p in json.loads(s)["merges"]])

    def encode_chunk_reference(self, chunk: bytes) -> list[int]:
        """Independent reference encoder: the classic per-chunk loop —
        repeatedly merge the LOWEST-rank pair present, leftmost-first.
        Used by tests and the gate oracle to validate the vectorized
        kernel; not a production path."""
        syms = list(chunk)
        while len(syms) > 1:
            best, best_i = None, -1
            for i in range(len(syms) - 1):
                r = self._rank.get((syms[i], syms[i + 1]))
                if r is not None and (best is None or r < best):
                    best, best_i = r, i
            if best is None:
                break
            a, b = self.merges[best]
            nid = _BYTE_VOCAB + best
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(nid)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms


def train_from_counts(chunk_counts: dict[bytes, int], n_merges: int) -> BPEMerges:
    """Train a merges table from a pre-tokenized chunk histogram —
    the engine-free core shared by ``bpe_train`` and the gate oracle.
    Deterministic: the most frequent pair wins each round, ties broken
    by the smallest (a, b).  Stops early when no pair repeats."""
    words = [(list(chunk), int(cnt)) for chunk, cnt in sorted(chunk_counts.items())]
    merges: list[tuple[int, int]] = []
    for r in range(n_merges):
        pairs: Counter = Counter()
        for syms, cnt in words:
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += cnt
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        (a, b) = best[0]
        nid = _BYTE_VOCAB + r
        merges.append((a, b))
        for syms, _ in words:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == a and syms[i + 1] == b:
                    syms[i : i + 2] = [nid]
                else:
                    i += 1
        words = [(s, c) for s, c in words if len(s) > 1]
    return BPEMerges(merges)


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_merges: int = 384,
    sample_rows: int = 256,
    max_unique_chunks: int = 65_536,
) -> BPEMerges:
    """Train merges on a bounded sample of the corpus.

    The sample is the first ``sample_rows`` docs by ``id_col``
    (deterministic, engine-reproducible); pre-tokenization and chunk
    counting run IN SPARK (JVM regex + groupBy), and only the top
    ``max_unique_chunks`` (count desc, chunk asc) histogram rows reach
    the driver — the same bounded-sample posture as pq_train.  The
    pair-merge loop itself is driver-side python over that histogram,
    which is O(unique_chunks · chunk_len · n_merges), independent of
    corpus size."""
    sample = df.orderBy(F.col(id_col)).limit(sample_rows)
    hist = (
        sample.select(
            F.explode(
                F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_PATTERN), 0)
            ).alias("chunk")
        )
        .groupBy("chunk")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("chunk"))
        .limit(max_unique_chunks)
        .collect()
    )
    counts = {r.chunk.encode("utf-8"): r.cnt for r in hist}
    return train_from_counts(counts, n_merges)


def _string_values_bytes(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(byte_stream uint8, offsets int64) of a string/large_string Array,
    honoring any slice offset — zero-copy views into the Arrow buffers."""
    if len(arr) == 0:
        return np.empty(0, np.uint8), np.zeros(1, np.int64)
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], dtype=off_dtype)[arr.offset : arr.offset + len(arr) + 1]
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
    return data[offs[0] : offs[-1]], (offs - offs[0]).astype(np.int64)


def _list_offsets(arr: pa.Array) -> tuple[np.ndarray, pa.Array]:
    """(per-row value offsets int64, flat values Array) of a
    list/large_list Array, honoring any slice offset."""
    if len(arr) == 0:
        return np.zeros(1, np.int64), arr.values.slice(0, 0)
    off_dtype = np.int64 if pa.types.is_large_list(arr.type) else np.int32
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], dtype=off_dtype)[arr.offset : arr.offset + len(arr) + 1]
    values = arr.values.slice(int(offs[0]), int(offs[-1] - offs[0]))
    return (offs - offs[0]).astype(np.int64), values


def _merge_stream(tok: np.ndarray, chunk_id: np.ndarray,
                  merges: list[tuple[int, int]]):
    """Apply the merges table in rank order over a flat token stream.
    One vectorized scan per rank; ``chunk_id`` blocks merges across
    pre-token boundaries; leftmost-first overlap resolution via the
    run-parity mask.  Returns the compacted (tok, chunk_id)."""
    if not len(tok):
        return tok, chunk_id
    present = np.zeros(_BYTE_VOCAB + len(merges), dtype=bool)
    present[np.unique(tok)] = True
    for r, (a, b) in enumerate(merges):
        if not (present[a] and present[b]):
            continue
        mask = (tok[:-1] == a) & (tok[1:] == b) & (chunk_id[:-1] == chunk_id[1:])
        idx = np.flatnonzero(mask)
        if not len(idx):
            continue
        if a == b:
            # runs like "aaa": keep leftmost-first alternating matches
            brk = np.empty(len(idx), dtype=bool)
            brk[0] = True
            brk[1:] = idx[1:] != idx[:-1] + 1
            run_start = idx[brk][np.cumsum(brk) - 1]
            idx = idx[((idx - run_start) % 2) == 0]
        nid = _BYTE_VOCAB + r
        tok[idx] = nid
        keep = np.ones(len(tok), dtype=bool)
        keep[idx + 1] = False
        tok = tok[keep]
        chunk_id = chunk_id[keep]
        present[nid] = True
    return tok, chunk_id


def tokenize_bpe(
    df: DataFrame,
    merges: BPEMerges,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize a text column with a trained merges table →
    DataFrame[id string, tokens array<int>, n_tok int].

    Pre-tokenization (the GPT-2-style regex) runs JVM-side; the merge
    phase is an Arrow-batch numpy kernel over the batch's whole byte
    stream (see ``_merge_stream``) — no per-row Python anywhere.  The
    output token arrays decode back to the input text byte-exactly
    (``detokenize_bpe``), which is what makes ``n_tok`` derivable from
    raw text instead of assumed."""
    mg = merges.merges

    pre = df.select(
        F.col(id_col).cast("string").alias("id"),
        F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_PATTERN), 0).alias("chunks"),
    )

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            n_docs = batch.num_rows
            if not n_docs:
                continue
            ids = batch.column(0)
            doc_offs, chunk_values = _list_offsets(batch.column(1))
            byte_stream, chunk_offs = _string_values_bytes(chunk_values)
            tok = byte_stream.astype(np.int32)
            n_chunks = len(chunk_offs) - 1
            chunk_lens = np.diff(chunk_offs)
            chunk_id = np.repeat(np.arange(n_chunks, dtype=np.int64), chunk_lens)
            tok, chunk_id = _merge_stream(tok, chunk_id, mg)
            # tokens → docs: chunk → doc via the list offsets
            doc_of_chunk = np.repeat(np.arange(n_docs, dtype=np.int64),
                                     np.diff(doc_offs))
            doc_ix = doc_of_chunk[chunk_id] if len(chunk_id) else chunk_id
            n_tok = np.bincount(doc_ix, minlength=n_docs).astype(np.int32)
            tok_offsets = np.zeros(n_docs + 1, dtype=np.int32)
            np.cumsum(n_tok, out=tok_offsets[1:])
            tokens_arr = pa.ListArray.from_arrays(
                pa.array(tok_offsets, pa.int32()), pa.array(tok, pa.int32()))
            yield pa.RecordBatch.from_arrays(
                [ids, tokens_arr, pa.array(n_tok, pa.int32())],
                ["id", "tokens", "n_tok"],
            )

    return pre.mapInArrow(kernel, "id string, tokens array<int>, n_tok int")


def detokenize_bpe(
    df: DataFrame,
    merges: BPEMerges,
    tokens_col: str = "tokens",
    id_col: str = "id",
) -> DataFrame:
    """Decode token arrays back to text → DataFrame[id string, text
    string].  Byte-exact inverse of ``tokenize_bpe`` because the
    pre-tokenizer partitions the whole input (spaces ride along as
    chunk prefixes).  The per-token byte gather is one vectorized
    fancy-index over the concatenated vocab buffer."""
    vocab = merges.vocab_bytes()
    vlens = np.array([len(v) for v in vocab], dtype=np.int64)
    vstarts = np.zeros(len(vocab) + 1, dtype=np.int64)
    np.cumsum(vlens, out=vstarts[1:])
    vbuf = np.frombuffer(b"".join(vocab), dtype=np.uint8)

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            n_docs = batch.num_rows
            if not n_docs:
                continue
            ids = batch.column(0)
            doc_offs, flat = _list_offsets(batch.column(1))
            tok = flat.to_numpy(zero_copy_only=False).astype(np.int64)
            if np.any(tok < 0) or np.any(tok >= len(vocab)):
                raise ValueError("token id outside vocabulary")
            lens = vlens[tok]
            total = int(lens.sum())
            # output byte i pulls from vbuf[start_of_its_token + i_within]
            ends = np.cumsum(lens)
            within = np.arange(total, dtype=np.int64) - np.repeat(ends - lens, lens)
            out_bytes = vbuf[np.repeat(vstarts[tok], lens) + within]
            doc_ix = np.repeat(np.arange(n_docs, dtype=np.int64), np.diff(doc_offs))
            doc_bytes = np.zeros(n_docs, dtype=np.int64)
            if len(tok):
                np.add.at(doc_bytes, doc_ix, lens)
            bounds = np.zeros(n_docs + 1, dtype=np.int64)
            np.cumsum(doc_bytes, out=bounds[1:])
            buf = out_bytes.tobytes()
            texts = [buf[bounds[i]:bounds[i + 1]].decode("utf-8")
                     for i in range(n_docs)]
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(texts, pa.string())], ["id", "text"])

    return df.select(F.col(id_col).cast("string").alias("id"), tokens_col) \
             .mapInArrow(kernel, "id string, text string")
