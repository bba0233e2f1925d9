"""Real merges-table BPE: trainer determinism, vectorized kernel vs the
independent reference encoder, byte-exact detokenize roundtrip, and the
token_count_bpe re-expression."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from presto_bloomfilter_spark.operators import bpe
from presto_bloomfilter_spark.operators.bpe import (
    BPEMerges, _merge_stream, train_from_counts)


def _toy_merges() -> BPEMerges:
    counts = {b" low": 5, b" lower": 2, b" newest": 6, b" widest": 3,
              b"aaa": 4, b"aaaa": 2, b"  double  space": 3}
    return train_from_counts(counts, 64)


def test_train_deterministic_and_early_stop():
    m1, m2 = _toy_merges(), _toy_merges()
    assert m1.merges == m2.merges and len(m1.merges) > 0
    # early stop: no pair repeats → zero merges
    assert train_from_counts({b"ab": 1, b"cd": 1}, 100).merges == []
    # saturation: asking for more merges than exist stops early
    assert len(train_from_counts({b"abab": 5}, 1000).merges) < 1000


def test_merges_json_roundtrip_and_validation():
    m = _toy_merges()
    back = BPEMerges.from_json(m.to_json())
    assert back.merges == m.merges
    with pytest.raises(ValueError, match="not yet defined"):
        BPEMerges([(999, 0)])  # symbol 999 doesn't exist at rank 0


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(codec="utf-8"), max_size=40))
def test_kernel_matches_reference_on_arbitrary_chunks(s):
    m = _toy_merges()
    chunk = s.encode("utf-8")
    ref = m.encode_chunk_reference(chunk)
    tok = np.frombuffer(chunk, np.uint8).astype(np.int32)
    got, _ = _merge_stream(tok.copy(), np.zeros(len(tok), np.int64), m.merges)
    assert list(got) == ref
    # decode restores the exact bytes
    vocab = m.vocab_bytes()
    assert b"".join(vocab[t] for t in got) == chunk


def test_kernel_blocks_cross_chunk_merges():
    m = train_from_counts({b"ab": 5}, 8)
    assert (ord("a"), ord("b")) in m.merges
    tok = np.array([ord("a"), ord("b")], np.int32)
    merged, _ = _merge_stream(tok.copy(), np.array([0, 0], np.int64), m.merges)
    split, _ = _merge_stream(tok.copy(), np.array([0, 1], np.int64), m.merges)
    assert len(merged) == 1 and len(split) == 2


def test_overlap_runs_resolve_leftmost_first():
    m = BPEMerges([(ord("a"), ord("a"))])
    for n in range(1, 9):
        chunk = b"a" * n
        ref = m.encode_chunk_reference(chunk)
        tok = np.frombuffer(chunk, np.uint8).astype(np.int32)
        got, _ = _merge_stream(tok.copy(), np.zeros(n, np.int64), m.merges)
        assert list(got) == ref, n


def test_spark_tokenize_roundtrip_and_reference_parity(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(64)
    m = bpe.bpe_train(docs, n_merges=128, sample_rows=64)
    toks = bpe.tokenize_bpe(docs, m)
    dec = bpe.detokenize_bpe(toks, m).withColumnRenamed("text", "decoded")
    orig = docs.select(F.col("doc_id").cast("string").alias("id"),
                       F.col("text").alias("orig"))
    joined = toks.join(dec, "id").join(orig, "id").collect()
    assert len(joined) == 64
    ref_rows = {r.id: r.orig for r in joined}
    for r in joined:
        assert r.decoded == ref_rows[r.id]          # byte-exact roundtrip
        assert r.n_tok == len(r.tokens) and r.n_tok > 0
    # spot-check the distributed kernel against the reference encoder
    import re as _re  # chunking via Spark to mirror kernel input
    chunks_df = docs.select(
        F.col("doc_id").cast("string").alias("id"),
        F.regexp_extract_all("text", F.lit(bpe.BPE_ISH_PATTERN), 0).alias("ch"))
    got = {r.id: list(r.tokens) for r in toks.collect()}
    for r in chunks_df.limit(8).collect():
        ref = []
        for c in r.ch:
            ref.extend(m.encode_chunk_reference(c.encode("utf-8")))
        assert got[r.id] == ref


def test_spark_unicode_and_empty_docs(spark):
    rows = [(0, "héllo wörld 🙂 héllo"), (1, ""), (2, "  "), (3, "日本語 テスト 日本語")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    m = bpe.bpe_train(df, n_merges=64, sample_rows=4)
    toks = bpe.tokenize_bpe(df, m)
    dec = {r.id: r.text for r in bpe.detokenize_bpe(toks, m).collect()}
    for doc_id, txt in rows:
        assert dec[str(doc_id)] == txt
    n_tok = {r.id: r.n_tok for r in toks.collect()}
    assert n_tok["1"] == 0


def test_token_count_bpe_real_merges_path(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(32)
    from presto_bloomfilter_spark.operators import text as text_ops
    m = bpe.bpe_train(docs, n_merges=128, sample_rows=32)
    real = {r.id: r.n_bpe_tokens
            for r in text_ops.token_count_bpe(docs, merges=m).collect()}
    via_tokens = {r.id: r.n_tok for r in bpe.tokenize_bpe(docs, m).collect()}
    assert real == via_tokens
    # regex fallback still works and counts chunks (>= merged counts... not
    # necessarily comparable; just shape-check it)
    proxy = text_ops.token_count_bpe(docs).collect()
    assert len(proxy) == 32 and all(r.n_bpe_tokens > 0 for r in proxy)
