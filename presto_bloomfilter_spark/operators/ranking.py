"""Relevance ranking and statistical-LM quality scoring.

Two standard training-data-pipeline passes the text operators did not
yet cover:

- ``bm25_topk``: Okapi BM25 ranking of a document corpus against a
  small term query — the workhorse for "find the k most on-topic docs"
  retrieval passes (topic filtering, eval-set mining, dedup triage).
- ``lm_score``: bigram language-model scoring — train add-alpha
  smoothed counts on a deterministic held-out sample of the corpus,
  score every document by its per-word negative log-likelihood.  The
  KenLM-perplexity-filter shape (CCNet, Wenzek et al. 2020): docs the
  in-domain LM finds surprising are boilerplate/garble candidates.

Scale posture: nothing per-token ever shuffles.  BM25 is two map-only
scans (one single-row stats aggregate, one codegen'd scoring
projection) finished by a TakeOrderedAndProject top-k; every per-term
tf/df expression is a pure JVM built-in over the shared
``split_words`` column, so the hot path is whole-stage codegen with
zero Python.  The LM trains on a hash-predicate sample (bounded,
deterministic), broadcasts the count tables as pandas hash maps, and
scores with one Arrow-batched mapInPandas whose word splitting is the
Arrow C kernel and whose lookups are C-level map joins — no explode of
the corpus, no join, no per-row Python.

Word semantics are the repo-wide ``str.split()`` definition
(contamination.split_words), so the DuckDB oracles compute the exact
same words.
"""

from __future__ import annotations

import math
from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from pyspark.sql import DataFrame, functions as F


def bm25_topk(df: DataFrame, terms: Sequence[str], k: int = 50,
              text_col: str = "text", id_col: str = "doc_id",
              k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Top-``k`` documents by Okapi BM25 score against ``terms``.

    Returns DataFrame[id string, score double], descending score, ties
    broken by id.  idf is the Robertson/Sparck-Jones form
    ``ln(1 + (N - df + 0.5) / (df + 0.5))`` (always positive); tf is
    the exact word-occurrence count under ``str.split()`` semantics.

    Plan shape (the 100 TB path): one aggregate scan producing a SINGLE
    row of corpus stats (N, total words, per-term document frequency —
    the only driver-side data), then one map-only scoring projection
    with every constant folded in as a literal, finished by
    ``orderBy().limit(k)``, which Spark executes as per-partition
    top-k + k-row merge (TakeOrderedAndProject) — no global sort.
    Cross-engine parity: scores involve ``ln`` so the last ulp
    (~1e-16 relative) can differ from an oracle's libm; the gate
    driver rounds floats to 9 decimals, orders of magnitude coarser.
    Ranking is unaffected: docs with identical (tf…, dl) tie exactly
    and break by id; distinct ones differ by far more than an ulp.
    """
    if not terms:
        raise ValueError("bm25_topk needs at least one query term")
    if len(set(terms)) != len(terms):
        raise ValueError(f"duplicate query terms: {sorted(terms)}")
    from presto_bloomfilter_spark.operators.contamination import split_words

    base = df.select(
        F.col(id_col).cast("string").alias("id"),
        split_words(text_col).alias("__words"),
    ).withColumn("__dl", F.size("__words"))

    stats = base.agg(
        F.count("*").alias("n"),
        F.sum("__dl").alias("sumdl"),
        *[F.sum(F.array_contains("__words", t).cast("long")).alias(f"df_{i}")
          for i, t in enumerate(terms)],
    ).collect()[0]
    n = stats["n"]
    if not n:
        raise ValueError("empty corpus")
    # explicit sum/count (not avg) so the oracle's CAST(SUM AS DOUBLE)/COUNT
    # reproduces it bit-exactly — integer sums are exact in IEEE doubles
    avgdl = stats["sumdl"] / n

    score = F.lit(0.0)
    for i, t in enumerate(terms):
        dft = stats[f"df_{i}"] or 0
        idf = math.log(1.0 + (n - dft + 0.5) / (dft + 0.5))
        tf = F.size(F.filter("__words", lambda w: w == F.lit(t))).cast("double")
        denom = tf + F.lit(k1) * (
            F.lit(1.0 - b) + F.lit(b) * F.col("__dl").cast("double") / F.lit(avgdl))
        score = score + F.lit(idf) * tf * F.lit(k1 + 1.0) / denom

    return (base.select("id", score.alias("score"))
            .filter(F.col("score") > 0)
            .orderBy(F.desc("score"), "id")
            .limit(k))


def tfidf_topk(df: DataFrame, k: int = 5, text_col: str = "text",
               id_col: str = "doc_id", min_df: int = 1,
               max_df_frac: float = 1.0) -> DataFrame:
    """Per-document top-``k`` terms by TF-IDF — the standard keyword
    extraction / topic-tagging pass (and the feature side of sparse
    retrieval indexes).

    tf = exact occurrence count under ``str.split()`` word semantics;
    idf = ``ln((N + 1) / (df + 1)) + 1`` (the smoothed sklearn form,
    always positive); terms with document frequency below ``min_df``
    or above ``max_df_frac * N`` (corpus-ubiquitous stopwords) are
    excluded BEFORE ranking.  Returns DataFrame[id string, term
    string, tf int, df_docs int, score double, rank int] with
    ``rank ∈ [1, k]`` ordered by (score desc, term asc) per doc.

    Plan shape (the 100 TB path): ONE O(total tokens) explode whose
    (id, term) counts partial-aggregate map-side, a vocabulary-bounded
    document-frequency aggregate reusing the same shuffle output, one
    join of tf against the (filtered, vocab-bounded) df table — AQE
    broadcasts it when it fits, else it is a key-balanced shuffle join
    — and a per-doc window Spark executes as WindowGroupLimit
    (per-partition top-k truncation before the final rank filter).
    No global sort, no Python, no driver-side tables; N is the only
    scalar collected.  Cross-engine parity: the ulp argument of
    ``bm25_topk`` applies — exact ties happen only for identical
    (tf, df) pairs, which tie in any engine and break by term.
    """
    from pyspark.sql import Window

    from presto_bloomfilter_spark.operators.contamination import split_words

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    n_docs = df.count()
    if not n_docs:
        raise ValueError("empty corpus")
    terms = df.select(
        F.col(id_col).cast("string").alias("id"),
        F.explode(split_words(text_col)).alias("term"),
    )
    tf = terms.groupBy("id", "term").agg(F.count("*").alias("tf"))
    dfreq = (tf.groupBy("term").agg(F.count("*").alias("df_docs"))
             .filter((F.col("df_docs") >= min_df)
                     & (F.col("df_docs") <= float(max_df_frac) * n_docs)))
    idf = F.log((F.lit(float(n_docs)) + 1.0)
                / (F.col("df_docs").cast("double") + 1.0)) + 1.0
    scored = (tf.join(dfreq, "term")
              .withColumn("score", F.col("tf").cast("double") * idf))
    w = Window.partitionBy("id").orderBy(F.desc("score"), "term")
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("id", "term", F.col("tf").cast("int").alias("tf"),
                    F.col("df_docs").cast("int").alias("df_docs"),
                    "score", F.col("rank").cast("int").alias("rank")))


# ---- bigram LM quality scoring -------------------------------------------------


def _lm_train(df: DataFrame, sample_percent: int, text_col: str, id_col: str,
              min_count: int, max_table_rows: int | None,
              ) -> tuple[pd.Series, pd.Series]:
    """Train the bounded bigram-LM count tables (see ``lm_score``).

    Returns ``(uni, bi)`` pandas Series keyed by word / \\x1f-joined
    pair.  Pruning runs IN SPARK before the collect, so the driver
    never holds more than ``max_table_rows`` entries per table: count
    floor first (``HAVING count >= min_count`` shape), then
    deterministic top-M by (count DESC, key ASC) — executed as
    TakeOrderedAndProject, no global sort.
    """
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    if max_table_rows is not None and max_table_rows < 1:
        raise ValueError(f"max_table_rows must be >= 1, got {max_table_rows}")
    from presto_bloomfilter_spark.operators.text import hash_sample

    def bounded(counts: DataFrame, key: str) -> list:
        if min_count > 1:
            counts = counts.filter(F.col("count") >= min_count)
        if max_table_rows is not None:
            counts = counts.orderBy(F.desc("count"), key).limit(max_table_rows)
        return counts.collect()

    words_col = F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
    sample = hash_sample(df, id_col, sample_percent)
    uni_rows = bounded(sample.select(F.explode(words_col).alias("w"))
                       .groupBy("w").count(), "w")
    if not uni_rows:
        raise ValueError(
            f"lm_score: the {sample_percent}% training sample is empty (after "
            f"min_count={min_count} pruning) — raise sample_percent, lower "
            "min_count, or check the corpus")
    # bigrams via shifted zip_with: pairing stays map-side, only the
    # sample's pair rows shuffle for the count.  \x1f (unit separator)
    # joins the pair — non-whitespace so it can't appear inside a word
    # of any corpus whose words exclude control chars, and unlike \x00
    # it is representable in every engine a parity oracle might use
    n_pairs = F.greatest(F.size(words_col) - 1, F.lit(0))
    pairs = sample.select(F.explode(F.zip_with(
        F.slice(words_col, 1, n_pairs),
        F.slice(words_col, 2, n_pairs),
        lambda a, b: F.concat(a, F.lit("\x1f"), b),
    )).alias("p"))
    bi_rows = bounded(pairs.groupBy("p").count(), "p")

    uni = pd.Series({r["w"]: float(r["count"]) for r in uni_rows})
    bi = pd.Series({r["p"]: float(r["count"]) for r in bi_rows}, dtype=float)
    return uni, bi


def lm_score(df: DataFrame, sample_percent: int = 20, alpha: float = 0.1,
             text_col: str = "text", id_col: str = "doc_id",
             min_count: int = 1,
             max_table_rows: int | None = 10_000_000) -> DataFrame:
    """Per-document bigram-LM negative log-likelihood (lower = more
    in-domain).  Returns DataFrame[id string, n_words int, nll double]
    where nll is the mean over word positions 2..n of
    ``-ln((c(prev, cur) + alpha) / (c(prev) + alpha * V))``; docs with
    fewer than 2 words get NULL nll (nothing to condition on).

    Train/score split: the model trains on the deterministic md5
    ``sample_percent`` sample (hash_sample semantics — reproducible,
    engine-portable, so the DuckDB oracle selects the identical
    training set) and every doc is scored, including training docs
    (standard for a quality FILTER; use a disjoint sample for held-out
    perplexity).  Unknown words hit the alpha floor.

    Driver-table bound (KenLM-style count pruning): bigram TYPE count
    grows near-linearly with sample tokens, so the count tables are
    pruned IN SPARK before anything reaches the driver.  ``min_count``
    drops uni/bigram types seen fewer times (KenLM's ``--prune``);
    ``max_table_rows`` then hard-caps each table at the top-M types by
    (count DESC, key ASC) — a total order, so the cut is deterministic
    and an oracle can replay it.  Executed as TakeOrderedAndProject
    (per-partition top-M + M-row merge, no global sort).  A pruned
    type scores through the same alpha floor as an unseen one, and V
    is the PRUNED unigram type count — the model the executors see is
    exactly the model the parameters describe.  The driver therefore
    holds at most ``2 * max_table_rows`` entries regardless of corpus
    or sample size; the default caps the tables at roughly a few
    hundred MB, the same bound a filtered KenLM table imposes.

    Scale posture: training explodes and shuffles only the SAMPLE's
    (word, count) pairs — bounded by sample size, never the corpus.
    The pruned count tables ship to executors as a REAL
    ``sc.broadcast`` (torrent-distributed once per executor, not
    re-pickled into every task closure).  Scoring is ONE Arrow-batched
    mapInPandas pass: word splitting is the Arrow C kernel
    (utf8_split_whitespace — identical semantics to str.split()),
    lookups are C-level pandas map joins, per-doc means are bincount
    segment sums.  No explode of the corpus, no join, no per-row
    Python.
    """
    uni, bi = _lm_train(df, sample_percent, text_col, id_col,
                        min_count, max_table_rows)
    vocab = float(len(uni))
    a = float(alpha)
    model_bc = df.sparkSession.sparkContext.broadcast((uni, bi))
    del uni, bi  # keep the tables out of the task closure

    def score(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        uni, bi = model_bc.value
        for pdf in it:
            arr = pa.array(pdf[text_col].fillna(""), type=pa.string())
            sp = pc.utf8_split_whitespace(arr)
            flat = pc.list_flatten(sp)
            parents = pc.list_parent_indices(sp)
            # arrow keeps leading/trailing empties that str.split() drops
            keep = pc.not_equal(flat, "")
            flat = flat.filter(keep)
            parents = (parents.filter(keep)
                       .to_numpy(zero_copy_only=False).astype(np.int64))
            lens = np.bincount(parents, minlength=len(pdf))
            nll = np.full(len(pdf), np.nan)
            if len(flat):
                first = np.ones(len(parents), dtype=bool)
                first[1:] = parents[1:] != parents[:-1]
                idx = np.flatnonzero(~first)  # positions with an in-doc prev
                if idx.size:
                    words = flat.to_pandas().astype(object)
                    prev_w = words.iloc[idx - 1].reset_index(drop=True)
                    cur_w = words.iloc[idx].reset_index(drop=True)
                    prev_c = prev_w.map(uni).fillna(0.0).to_numpy()
                    pair_c = ((prev_w + "\x1f" + cur_w)
                              .map(bi).fillna(0.0).to_numpy())
                    logp = np.log((pair_c + a) / (prev_c + a * vocab))
                    seg = parents[idx]
                    sums = np.bincount(seg, weights=-logp, minlength=len(pdf))
                    cnts = np.bincount(seg, minlength=len(pdf))
                    nll = np.where(cnts > 0, sums / np.maximum(cnts, 1), np.nan)
            yield pd.DataFrame({
                "id": pdf[id_col].astype(str),
                "n_words": lens.astype(np.int32),
                "nll": nll,
            })

    return df.select(F.col(id_col).alias(id_col), F.col(text_col)).mapInPandas(
        score, "id string, n_words int, nll double")
