"""Training-data-prep workload driver — the pipeline-operator sibling
of tools/run_workload.py (which drives the sketch north star).

Chains the corpus-prep operators end-to-end over the documents table,
the way a pretraining data pipeline composes them:

  1. quality filter (min length) + Gopher repetition cut + CCNet-style
     bigram-LM perplexity cut (operators/ranking.lm_score, worst
     decile dropped);
  2. PII scrub (map-only regexp pass);
  3. exact dedup (md5 digest, first doc per digest wins), then
     exact-substring strip (cross-doc repeated boilerplate removed at
     8-word-window granularity, operators/substring);
  4. near-dup clustering (MinHash-LSH candidates -> exact-Jaccard
     verify -> connected components), keep the BEST doc per cluster
     (longest text, ties by id — dedup.keep_best_per_cluster);
  5. per-source quota cap + mixture rebalance (deterministic md5),
     then DSIR importance selection (hashed-ngram weights toward a
     target source, deterministic Gumbel top-k — operators/selection);
  6. leakage-free train/val/test split by source group (map-only;
     only the train split flows on to shuffling/packing);
  7. deterministic global shuffle;
  8. REAL BPE tokenize (merges trained on a bounded sample of the
     train split, vectorized apply kernel — operators/bpe), pack into
     fixed-length sequences, write the partitioned position-sorted
     training shards.

Every stage is shuffle-bounded the way the module docstrings promise
(map-only scrub/pack, digest-only dedup shuffle, banded LSH, bucketed
shuffle), so the same script is the 100 TB shape with a different
--master. Prints ONE JSON metrics line.

Usage:  python tools/run_data_prep.py [--sf-dir ...] [--cpus N]
        (or spark-submit --py-files, same as run_workload.py)
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("ARROW_DEFAULT_MEMORY_POOL", "system")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--cpus", type=int, default=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--out", default="")
    ap.add_argument("--seq-len", type=int, default=256)
    ap.add_argument("--cap-per-source", type=int, default=10_000)
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    from presto_bloomfilter_spark.operators import (
        bpe, dedup, packing, ranking, sampling, selection, shuffle,
        substring, text)

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("pbs-data-prep")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = args.out or tempfile.mkdtemp(prefix="pbs-shards-")
    t0 = time.time()
    docs = spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet"))
    n_in = docs.count()

    # 0: mixture audit (operators/stats.py) — per-source unigram KL to
    # the corpus mixture plus the minimum pairwise JSD; a near-zero JSD
    # pair is a duplicated feed entering under two source labels, the
    # cheapest red flag to raise BEFORE spending the pipeline on it.
    # Word semantics = repo-wide str.split() (contamination.split_words)
    from presto_bloomfilter_spark.operators import stats
    from presto_bloomfilter_spark.operators.contamination import split_words

    words = docs.select("source", split_words("text").alias("w"))
    word_counts = stats.unigram_counts(words, "w").persist()
    src_kl = {r.source: r.kl_corpus
              for r in stats.source_token_divergence(
                  words, "w", counts=word_counts).collect()}
    jsd_rows = stats.source_pairwise_jsd(
        words, "w", counts=word_counts).collect()
    # a single-source corpus has no pairs — the audit then only reports KL
    min_jsd = min(jsd_rows, key=lambda r: r.jsd) if jsd_rows else None
    word_counts.unpersist()

    # 1-2: quality + repetition cut, then a CCNet-style bigram-LM
    # perplexity cut (drop the worst 10% by nll; the LM trains on the
    # deterministic md5 sample), then PII scrub (map-only)
    q = text.quality_filter(docs, min_words=5)
    rep = text.repetition_metrics(q).filter(F.col("dup_gram_frac") <= 0.8)
    q = q.join(rep.select(F.col("id").alias("doc_id")).withColumn(
        "doc_id", F.col("doc_id").cast(docs.schema["doc_id"].dataType)), "doc_id")
    nll = ranking.lm_score(q, sample_percent=20).filter(~F.isnan("nll"))
    p90 = nll.agg(F.percentile_approx("nll", 0.9).alias("p")).collect()[0]["p"]
    keep_ids = nll.filter(F.col("nll") <= p90).select(
        F.col("id").cast(docs.schema["doc_id"].dataType).alias("doc_id"))
    q = q.join(keep_ids, "doc_id")
    scrubbed = text.pii_scrub(q)

    # 3: exact dedup — first doc per md5(text) — then strip substrings
    # repeated ACROSS surviving docs (boilerplate the doc-level dedup
    # can't see); stripping before near-dup keeps shared boilerplate
    # from manufacturing spurious near-dup pairs
    exact = dedup.drop_exact_dups(scrubbed, "text", "doc_id")
    id_type = docs.schema["doc_id"].dataType
    stripped = substring.strip_duplicated_spans(
        exact, "text", "doc_id", min_len=8, cross_doc_only=True)
    exact = exact.drop("text").join(
        stripped.select(F.col("id").cast(id_type).alias("doc_id"), "text"),
        "doc_id")

    # 4: near-dup clusters -> keep the BEST member per cluster (the
    # longest text; ties by id), not an arbitrary one — cluster ids are
    # stringified doc_ids, so align types for the keep-best join
    pairs = dedup.minhash_near_dup_pairs(exact, "text", "doc_id", threshold=0.7)
    comp = dedup.components_from_pairs(pairs)
    comp = comp.select(F.col("id").cast(id_type).alias("id"),
                       F.col("component").cast(id_type).alias("component"))
    # persist the deduped survivors: every downstream stage AND the
    # metrics counts read from here — without the cache each count
    # would re-run the whole scan→scrub→LSH chain and the published
    # wall-clock would measure redundant recomputation
    uniq = dedup.keep_best_per_cluster(
        exact, comp, [F.length("text").desc()], id_col="doc_id").persist()

    # 5: per-source quota + mixture rebalance
    capped = sampling.cap_per_key(uniq, "source", args.cap_per_source, "doc_id")
    sources = [r[0] for r in capped.select("source").distinct().collect()]
    mixed = sampling.sample_mixture(
        capped, {s: (50 if s == "web" else 100) for s in sources})

    # 5b: DSIR importance selection (arXiv:2302.03169) — keep the 90%
    # of survivors that look most like the lexicographically-first
    # source's distribution (a stand-in for "my high-quality target
    # set"); hashed-ngram weights + deterministic Gumbel top-k
    tgt_source = sorted(sources)[0]
    n_pre_sel = mixed.count()
    sel = selection.dsir_select(
        mixed, mixed.filter(F.col("source") == tgt_source),
        k=max(1, (n_pre_sel * 9) // 10), buckets=1024)
    selected = mixed.join(
        sel.filter("selected").select(
            F.col("id").cast(id_type).alias("doc_id")), "doc_id")

    # 6: leakage-free split — every source lands wholly in one split,
    # so near-dups sharing a source can't straddle train/eval
    split = sampling.split_by_group(
        selected, "source", {"train": 0.8, "val": 0.1, "test": 0.1}, seed=5)
    train = split.filter(F.col("split") == "train").drop("split")

    # 7: deterministic shuffle (train split only)
    shuffled = shuffle.deterministic_shuffle(train, "doc_id", seed=1, buckets=64)

    # 8: REAL BPE tokenize (merges trained on a bounded sample of the
    # train split; n_tok derives from raw text, not assumed) + pack +
    # write.  Packing concatenates in partition-arrival order, so the
    # stream MUST be sorted by (bucket, pos) within each partition
    # after the repartition — otherwise shuffle-fetch order
    # (nondeterministic) would decide sequence composition and defeat
    # step 6 entirely
    merges = bpe.bpe_train(train, "text", "doc_id",
                           n_merges=512, sample_rows=512)
    tokids = bpe.tokenize_bpe(shuffled, merges, "text", "doc_id")
    tok = (
        shuffled.select(F.col("doc_id").cast("string").alias("id"),
                        "shuffle_bucket", "shuffle_pos")
        .join(tokids, "id")
        .select("shuffle_bucket", "shuffle_pos", "tokens")
    )
    packed = packing.pack_concat_chunks(
        tok.repartition(args.cpus, "shuffle_bucket")
        .sortWithinPartitions("shuffle_bucket", "shuffle_pos"),
        args.seq_len, eos_id=merges.vocab_size)  # EOS = first free id
    packed.write.mode("overwrite").parquet(out_dir)

    shards = spark.read.parquet(out_dir)
    n_seq = shards.count()
    n_tok = shards.agg(F.sum("n_tok")).collect()[0][0] or 0
    wall = time.time() - t0
    # counts after the clock stops: docs_after_dedup/docs_packed read
    # the persisted `uniq` (cheap), docs_after_quality re-runs only the
    # map-side filter scan; split metrics recompute from `uniq` too, so
    # the published wall-clock times only the pipeline itself
    n_mixed = mixed.count()
    n_selected = selected.count()
    split_counts = {r["split"]: r["c"] for r in split.groupBy("split").agg(
        F.count("*").alias("c")).collect()}
    print(json.dumps({
        "metric": "data_prep_wall_sec", "value": round(wall, 3), "unit": "sec",
        "sf_dir": args.sf_dir, "docs_in": n_in,
        "source_kl_to_corpus": src_kl,
        "min_source_jsd": (
            {"pair": [min_jsd.source_a, min_jsd.source_b],
             "jsd": min_jsd.jsd,
             "duplicated_feed_suspect": bool(min_jsd.jsd < 0.05)}
            if min_jsd is not None else None),
        "docs_after_quality": q.count(), "docs_after_dedup": uniq.count(),
        "docs_mixed": n_mixed, "docs_selected": n_selected,
        "docs_by_split": split_counts,
        "docs_packed": split_counts.get("train", 0),
        "sequences": n_seq,
        "tokens_packed": int(n_tok), "seq_len": args.seq_len,
        "docs_per_sec": round(n_in / wall, 1), "out": out_dir,
    }))
    uniq.unpersist()
    if not args.out:
        shutil.rmtree(out_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
