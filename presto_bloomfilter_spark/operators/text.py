"""Text-analysis operators for training-data pipelines.

Everything here that feeds a correctness oracle is built from Spark
SQL built-ins (JVM-side, whole-stage codegen, no Python) so the same
expression is computable in ANSI SQL; the heuristics that SQL cannot
express (language ID, winnowing fingerprints) are Arrow-batched
mapInPandas with vectorized numpy hashing inside.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

STOPWORDS = ("the", "a", "of", "and", "to")


def text_quality(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Quality metrics per doc, pure built-in expressions:
    word count, average word length, stopword ratio.  Words follow the
    repo-wide ``str.split()`` semantics (whitespace runs, no empties —
    contamination.split_words), so 'a  b' is 2 words, not 3."""
    from presto_bloomfilter_spark.operators.contamination import split_words

    words = split_words(text_col)
    n_words = F.size(words)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop_arr, w)))
    # sum of the words' own lengths — not chars-minus-separators, which
    # silently assumed single-space joining
    word_chars = F.aggregate(
        words, F.lit(0), lambda acc, w: acc + F.length(w))
    return df.select(
        F.col(id_col).cast("string").alias("id"),
        n_words.cast("int").alias("n_words"),
        (word_chars.cast("double") / n_words).alias("avg_word_len"),
        (n_stop.cast("double") / n_words).alias("stopword_ratio"),
    )


def token_count(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace-regex token counting (the cheap proxy for a BPE pass)."""
    return df.select(
        F.col(id_col).cast("string").alias("id"),
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("int").alias("n_tokens"),
    )


# GPT-2-style pre-tokenizer shape: contraction suffixes, letter runs,
# digit runs, punctuation runs (each optionally space-prefixed), plus a
# trailing whitespace-run catch-all so the alternation PARTITIONS the
# whole string (GPT-2 uses \s+(?!\S) lookahead for this; RE2 has no
# lookahead, so multi-space runs keep all their spaces in one chunk
# instead of donating the last one to the next word — still lossless,
# which is what detokenize-roundtrip requires).  The same
# RE2-compatible pattern runs JVM-side here and in the DuckDB oracle,
# so counts are engine-comparable.
BPE_ISH_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def token_count_bpe(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                    merges=None) -> DataFrame:
    """BPE token counting.  With a trained ``merges`` table
    (operators/bpe.bpe_train) this counts REAL merges-table BPE tokens
    via the vectorized kernel; without one it falls back to counting
    pre-tokenizer chunks (the regexp_extract_all pass that feeds the
    merge phase) — a cheap JVM-only upper-ish proxy."""
    if merges is not None:
        from presto_bloomfilter_spark.operators.bpe import tokenize_bpe

        return tokenize_bpe(df, merges, text_col, id_col).select(
            "id", F.col("n_tok").alias("n_bpe_tokens"))
    return df.select(
        F.col(id_col).cast("string").alias("id"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_PATTERN), 0))
        .cast("int")
        .alias("n_bpe_tokens"),
    )


def quality_filter(df: DataFrame, text_col: str = "text", min_words: int = 10,
                   max_stopword_ratio: float | None = None) -> DataFrame:
    """Filter low-quality docs; predicates stay JVM-side so they push
    into the scan pipeline.  Words follow the repo-wide ``str.split()``
    semantics (whitespace runs, no empties).  ``max_stopword_ratio``
    (None = off) drops docs whose stopword fraction EXCEEDS the bound —
    it was previously accepted and silently ignored."""
    from presto_bloomfilter_spark.operators.contamination import split_words

    words = split_words(text_col)
    out = df.filter(F.size(words) >= min_words)
    if max_stopword_ratio is not None:
        stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
        n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop_arr, w)))
        out = out.filter(
            (n_stop.cast("double") / F.size(words)) <= max_stopword_ratio)
    return out


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
_BULLETS = ("•", "-", "*")

C4_POLICY_PHRASES = ("terms of use", "privacy policy", "cookie policy",
                     "uses cookies", "use of cookies", "use cookies")
C4_TERMINALS = (".", "!", "?", '"')


def c4_rules(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
             min_line_words: int = 3, min_sentences: int = 5) -> DataFrame:
    """C4 cleaning rules (Raffel et al. 2020 §2.2) as one map-only
    codegen'd projection — the line-level sibling of ``gopher_rules``.

    Line filters (a line survives only if ALL hold):
      * ends in a terminal punctuation mark (``. ! ? "`` after rtrim),
      * has at least ``min_line_words`` whitespace-run words,
      * does not contain the word ``javascript`` (case-folded), and
      * does not contain any boilerplate policy phrase
        (``C4_POLICY_PHRASES``, case-folded substring match).
    Document verdict: ``passes`` iff the ORIGINAL text contains
    neither ``lorem ipsum`` (case-folded) nor a ``{`` brace and the
    CLEANED text still has ≥ ``min_sentences`` sentences (counted as
    ``.``/``!``/``?`` characters — deterministic and engine-portable,
    no sentence-splitter model).

    Returns DataFrame[id, text (cleaned, surviving lines re-joined
    with '\\n'; '' when none survive), n_lines int, n_kept int,
    n_sentences int, has_lorem bool, has_brace bool, passes bool].

    Scale shape: zero shuffles, zero Python — ``split``/``filter``/
    higher-order lambdas all whole-stage codegen, so the pass streams
    at scan speed and composes with predicate pushdown.  The identical
    expressions run in ANSI SQL (``list_filter``), so the gate's
    oracle replays every line decision and the verdict.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))  # NULL text = empty doc
    lines = F.split(t, F.lit("\n"), -1)

    def _keep(l):
        r = F.rtrim(l)
        ends = F.endswith(r, F.lit(C4_TERMINALS[0]))
        for p in C4_TERMINALS[1:]:
            ends = ends | F.endswith(r, F.lit(p))
        low = F.lower(l)
        wc = F.size(F.filter(F.split(l, r"\s+"), lambda w: w != ""))
        bad = F.contains(low, F.lit("javascript"))
        for ph in C4_POLICY_PHRASES:
            bad = bad | F.contains(low, F.lit(ph))
        return ends & (wc >= min_line_words) & ~bad

    kept = F.filter(lines, _keep)
    clean = F.concat_ws("\n", kept)

    def _count_char(col, ch):
        return F.length(col) - F.length(F.replace(col, F.lit(ch), F.lit("")))

    n_sentences = (_count_char(clean, ".") + _count_char(clean, "!")
                   + _count_char(clean, "?"))
    has_lorem = F.contains(F.lower(t), F.lit("lorem ipsum"))
    has_brace = F.contains(t, F.lit("{"))
    out = df.select(
        F.col(id_col).cast("string").alias("id"),
        clean.alias("text"),
        F.size(lines).cast("int").alias("n_lines"),
        F.size(kept).cast("int").alias("n_kept"),
        n_sentences.cast("int").alias("n_sentences"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
    )
    passes = (~F.col("has_lorem") & ~F.col("has_brace")
              & (F.col("n_sentences") >= min_sentences))
    return out.withColumn("passes", F.coalesce(passes, F.lit(False)))


def line_repetition(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", sep: str = "\n",
                    max_dup_line_frac: float = 0.30,
                    max_dup_char_frac: float = 0.20) -> DataFrame:
    """The Gopher repetition rules ``repetition_metrics`` does not
    cover (Rae et al. 2021 §A1.1 rows 1-2): the fraction of LINES that
    are duplicates of another line in the same document, and the
    fraction of CHARACTERS falling in such duplicated lines — both
    counting every occurrence of a duplicated line (the DataTrove /
    NeMo-Curator convention).  Template spam repeats whole lines;
    word-level metrics under-fire on it.

    Returns DataFrame[id, n_lines int, dup_line_frac double,
    dup_char_frac double, passes bool] — ``passes`` iff both fractions
    are within bounds; a doc with no characters scores 0.0 on both
    (emptiness is ``gopher_rules``'s job).  NULL text = empty doc.

    Scale shape: one map-only codegen'd projection — lines never
    explode, so nothing shuffles.  The duplicate scan is O(L²) in the
    per-doc LINE count (JVM-local array lambdas, not rows); crawl docs
    have hundreds of lines, where L² beats an explode+window shuffle
    by orders of magnitude.  For pathological inputs dedupe first with
    ``dedup.line_dedup`` (the exploded O(L) form).  The identical
    nested-lambda expressions run in ANSI SQL, so the gate's oracle
    replays every fraction and the verdict.
    """
    import re

    t = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.split(t, F.lit(re.escape(sep)), -1)
    n_lines = F.size(lines)
    dup_lines = F.filter(
        lines, lambda x: F.size(F.filter(lines, lambda y: y == x)) > 1)
    chars = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0), lambda a, l: a + F.length(l))
    tot_chars = chars(lines)
    dup_line_frac = F.size(dup_lines).cast("double") / n_lines
    dup_char_frac = F.when(
        tot_chars > 0, chars(dup_lines).cast("double") / tot_chars
    ).otherwise(F.lit(0.0))
    out = df.select(
        F.col(id_col).cast("string").alias("id"),
        n_lines.cast("int").alias("n_lines"),
        dup_line_frac.alias("dup_line_frac"),
        dup_char_frac.alias("dup_char_frac"),
    )
    passes = ((F.col("dup_line_frac") <= max_dup_line_frac)
              & (F.col("dup_char_frac") <= max_dup_char_frac))
    return out.withColumn("passes", F.coalesce(passes, F.lit(False)))


def char_entropy(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id",
                 min_entropy: float = 2.0) -> DataFrame:
    """Per-document Shannon entropy over unicode code points — the
    cheap proxy for the compression-ratio quality filter (low-entropy
    text is repetitive boilerplate / generated spam; natural prose
    sits around 4-5 bits/char).

    Returns DataFrame[id, n_chars int, distinct_chars int,
    entropy double (bits/char, 0.0 for empty text),
    max_char_frac double (modal code-point frequency share, 0.0 for
    empty), passes bool (entropy >= min_entropy)].

    Fully batch-vectorized mapInPandas: the batch's code points are
    flattened into ONE int64 array keyed ``doc_idx * 2^21 + cp``
    (code points < 2^21), a single ``np.unique`` produces all per-doc
    histograms at once, and the entropy/modal reductions are
    ``np.add.reduceat`` / ``np.maximum.reduceat`` over the sorted key
    runs — no per-document Python.  Map-only: zero shuffles, streams
    at scan speed; the exploded-groupBy alternative would shuffle
    O(total chars).
    """
    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = len(pdf)
            if not n:
                continue
            texts = pdf[text_col].fillna("")
            # one C-side pass: utf-32 gives fixed-width code points
            joined = "".join(texts)
            cps = np.frombuffer(
                joined.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
            lens = texts.str.len().to_numpy().astype(np.int64)
            doc_of = np.repeat(np.arange(n, dtype=np.int64), lens)
            keys = doc_of * (1 << 21) + cps
            uniq, counts = np.unique(keys, return_counts=True)
            udoc = uniq >> 21
            ent = np.zeros(n)
            mx = np.zeros(n)
            dis = np.zeros(n, dtype=np.int64)
            if len(uniq):
                starts = np.flatnonzero(
                    np.r_[True, udoc[1:] != udoc[:-1]])
                docs = udoc[starts]
                tot = lens[docs].astype(np.float64)
                p = counts / tot[np.searchsorted(docs, udoc)]
                # 0.0 - x, not -x: keeps the zero-entropy case +0.0 so
                # the oracle's `0.0 + (-sum(...))` hashes identically
                ent[docs] = 0.0 - np.add.reduceat(p * np.log2(p), starts)
                mx[docs] = np.maximum.reduceat(p, starts)
                dis[docs] = np.add.reduceat(
                    np.ones(len(uniq), dtype=np.int64), starts)
            yield pd.DataFrame({
                "id": pdf[id_col].astype(str),
                "n_chars": lens,
                "distinct_chars": dis,
                "entropy": ent,
                "max_char_frac": mx,
                "passes": ent >= min_entropy,
            })

    return df.select(F.col(id_col).alias(id_col), F.col(text_col)).mapInPandas(
        fn,
        "id string, n_chars int, distinct_chars int, entropy double, "
        "max_char_frac double, passes boolean",
    )


def gopher_rules(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id",
                 min_words: int = 50, max_words: int = 100_000,
                 min_mean_word_len: float = 3.0,
                 max_mean_word_len: float = 10.0,
                 max_symbol_ratio: float = 0.1,
                 max_bullet_frac: float = 0.9,
                 max_ellipsis_frac: float = 0.3,
                 min_alpha_frac: float = 0.8,
                 min_stopwords: int = 2) -> DataFrame:
    """Gopher/MassiveWeb document quality rules (Rae et al. 2021
    §A1.1) as one map-only codegen'd projection: word-count bounds,
    mean-word-length bounds, symbol-to-word ratio ('#' chars plus
    non-overlapping '...'/'…' occurrences), fraction of lines starting
    with a bullet (•,-,* after left-trim), fraction of lines ending
    with an ellipsis, fraction of words containing an ASCII letter,
    and the distinct-stopword floor (exact word match, no case
    folding — deterministic and engine-portable).  Words follow the
    repo-wide ``str.split()`` semantics; lines split on '\\n'.

    Returns per-doc metrics plus ``passes`` (the conjunction; ratios
    are NULL — and passes false — for word-less docs).  No explode, no
    shuffle, no Python; the identical expressions run in ANSI SQL, so
    the gate's oracle replays every metric and verdict."""
    from presto_bloomfilter_spark.operators.contamination import split_words

    t = F.col(text_col)
    words = split_words(text_col)
    n_words = F.size(words)
    nw = F.nullif(n_words.cast("double"), F.lit(0.0))
    word_chars = F.aggregate(words, F.lit(0), lambda acc, w: acc + F.length(w))
    n_hash = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    n_dots = (F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))) / 3
    n_uell = F.length(t) - F.length(F.replace(t, F.lit("…"), F.lit("")))
    lines = F.split(t, F.lit("\n"), -1)
    n_lines = F.size(lines)
    def _is_bullet(l):
        c = F.startswith(F.ltrim(l), F.lit(_BULLETS[0]))
        for b in _BULLETS[1:]:
            c = c | F.startswith(F.ltrim(l), F.lit(b))
        return c

    bullet = F.size(F.filter(lines, _is_bullet))
    ellip = F.size(F.filter(lines, lambda l: F.endswith(F.rtrim(l), F.lit("..."))
                            | F.endswith(F.rtrim(l), F.lit("…"))))
    alpha = F.size(F.filter(words, lambda w: w.rlike("[a-zA-Z]")))
    stop_arr = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    n_stop = F.size(F.array_intersect(F.array_distinct(words), stop_arr))
    out = df.select(
        F.col(id_col).cast("string").alias("id"),
        n_words.cast("int").alias("n_words"),
        (word_chars.cast("double") / nw).alias("mean_word_len"),
        ((n_hash + n_dots + n_uell).cast("double") / nw).alias("symbol_ratio"),
        (bullet.cast("double") / n_lines).alias("bullet_line_frac"),
        (ellip.cast("double") / n_lines).alias("ellipsis_line_frac"),
        (alpha.cast("double") / nw).alias("alpha_word_frac"),
        n_stop.cast("int").alias("n_stopwords"),
    )
    passes = (
        F.col("n_words").between(min_words, max_words)
        & F.col("mean_word_len").between(min_mean_word_len, max_mean_word_len)
        & (F.col("symbol_ratio") <= max_symbol_ratio)
        & (F.col("bullet_line_frac") <= max_bullet_frac)
        & (F.col("ellipsis_line_frac") <= max_ellipsis_frac)
        & (F.col("alpha_word_frac") >= min_alpha_frac)
        & (F.col("n_stopwords") >= min_stopwords)
    )
    return out.withColumn("passes", F.coalesce(passes, F.lit(False)))


def nfc_normalize(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Unicode NFC normalization of a text column — the canonical-form
    pass crawl pipelines run before hashing/dedup so that composed
    ('é') and decomposed ('e' + U+0301) encodings of the SAME text
    stop producing distinct digests.

    Returns DataFrame[id, text (NFC), changed bool] — ``changed`` flags
    rows whose bytes differed, so the usual pattern is normalize →
    md5 → drop_exact_dups and the flag audits how much of the corpus
    was non-canonical.

    Engine parity: CPython's ``unicodedata.normalize('NFC', ...)``
    matches DuckDB's ``nfc_normalize`` byte-for-byte (verified), so
    the oracle replays exactly.  (pyarrow's ``utf8_normalize`` is NOT
    used: in this build its NFC form fails to compose — NFD works,
    NFC is a no-op — so it cannot implement the contract.)

    Map-only and batch-vectorized despite the C-API shape: the whole
    batch is joined on a NUL separator and normalized with ONE
    unicodedata call (NUL has combining class 0 and composes with
    nothing, so normalization never crosses the boundary), then split
    back — no shuffle, no per-row Python except the final split.
    Rows that themselves contain NUL fall back to per-row normalize
    (pathological input, correctness preserved).
    """
    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import unicodedata

        for pdf in it:
            if not len(pdf):
                continue
            texts = pdf[text_col].fillna("").astype(str)
            if texts.str.contains("\x00", regex=False).any():
                norm = texts.map(lambda t: unicodedata.normalize("NFC", t))
            else:
                joined = unicodedata.normalize("NFC", "\x00".join(texts))
                norm = pd.Series(joined.split("\x00"), index=texts.index)
            yield pd.DataFrame({
                "id": pdf[id_col].astype(str),
                "text": norm,
                "changed": (norm != texts).to_numpy(),
            })

    return df.select(id_col, text_col).mapInPandas(
        fn, "id string, text string, changed boolean")


def boilerplate_lines(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", source_col: str = "source",
                      min_docs: int = 2, frac: float = 0.3,
                      sep: str = "\n") -> DataFrame:
    """Source-level boilerplate removal — the nav/footer/cookie-banner
    cleaner: a line is boilerplate within a source when it occurs in at
    least ``min_docs`` distinct documents AND in at least ``frac`` of
    the source's documents; boilerplate lines are dropped and each
    document reassembled from its surviving lines in original order.

    Complements line_dedup (GLOBAL first-occurrence exact dedup): here
    repetition is measured per source against a document-frequency
    threshold, which is how template chrome is actually detected —
    a footer is boilerplate because MOST docs of the domain carry it,
    not because it appeared once before.

    Returns DataFrame[id, source, text, n_lines int, n_kept int].
    Byte-exact line identity (no normalization), so the oracle replays
    the contract verbatim; text = '' when every line was boilerplate.

    Scale shape: posexplode → one shuffle keyed on (source, md5(line))
    for distinct-doc counts → the line stream joins that df table on
    the SAME key (co-partitioned, no extra exchange) → per-source doc
    totals arrive by broadcast → one shuffle back on doc id for
    ordered reassembly.  O(total lines), no Python.
    """
    import re

    lines = df.select(
        F.col(id_col).cast("string").alias("id"),
        F.col(source_col).alias("source"),
        F.posexplode(F.split(F.col(text_col), F.lit(re.escape(sep)), -1))
         .alias("pos", "line"),
    ).withColumn("__lh", F.md5(F.col("line")))
    line_df = lines.groupBy("source", "__lh").agg(
        F.countDistinct("id").alias("__df"))
    n_docs = df.groupBy(F.col(source_col).alias("source")).agg(
        F.countDistinct(F.col(id_col).cast("string")).alias("__nd"))
    marked = (
        lines.join(line_df, ["source", "__lh"])
        .join(F.broadcast(n_docs), "source")
        .withColumn(
            "__keep",
            ~((F.col("__df") >= min_docs)
              & (F.col("__df") >= F.lit(frac) * F.col("__nd"))),
        )
    )
    assembled = (marked.groupBy("id", "source")
                 .agg(F.array_sort(F.collect_list(
                          F.when(F.col("__keep"),
                                 F.struct("pos", "line")))).alias("ls"),
                      F.count("*").alias("n_lines"),
                      F.sum(F.col("__keep").cast("int")).alias("n_kept")))
    return assembled.select(
        "id", "source",
        F.concat_ws(sep, F.transform(F.col("ls"), lambda s: s["line"]))
         .alias("text"),
        F.col("n_lines").cast("int").alias("n_lines"),
        F.col("n_kept").cast("int").alias("n_kept"),
    )


def ngram_novelty(df: DataFrame, ref_df: DataFrame, n: int = 3,
                  text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document n-gram novelty against a reference corpus: the
    fraction of the document's DISTINCT word n-grams that occur nowhere
    in the reference corpus.  The scoring dual of contamination
    (contamination.py flags overlap; this measures freshness) — the
    standard memorization / near-duplication-pressure signal when
    curating new training data against an already-trained corpus.

    Returns (id, n_grams, novel_grams, novelty) where novelty is the
    single division novel_grams / n_grams (bit-exact across engines).
    Documents shorter than ``n`` words contribute their whole word
    sequence as one gram, mirroring ngram_jaccard_pairs.

    Pure Catalyst: gram construction = split → sliding concat →
    array_distinct (whole-stage codegen); the reference side is
    dedup'd to distinct grams BEFORE the join, so the join's build
    side is |unique ref grams|, not |ref corpus|.  100 TB posture:
    two shuffles keyed on gram (dedup + join — uniform except
    stop-gram hotspots; AQE broadcasts the deduped side when small)
    plus one keyed on doc id for the final per-doc count.  Word
    semantics = repo-wide str.split().
    """
    def grams_expr():
        words = F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
        return F.array_distinct(
            F.when(
                F.size(words) >= n,
                F.transform(
                    F.sequence(F.lit(0), F.size(words) - n),
                    lambda i: F.concat_ws(
                        " ", *[F.element_at(words, i + j + 1) for j in range(n)]),
                ),
            ).otherwise(F.array(F.concat_ws(" ", words)))
        )

    doc_grams = df.select(
        F.col(id_col).cast("string").alias("id"), F.explode(grams_expr()).alias("g"))
    ref_grams = ref_df.select(F.explode(grams_expr()).alias("g")).distinct() \
                      .withColumn("__seen", F.lit(1))
    return (
        doc_grams.join(ref_grams, "g", "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum((F.col("__seen").isNull()).cast("long")).alias("novel_grams"),
        )
        .withColumn("novelty", F.col("novel_grams") / F.col("n_grams"))
    )


def hash_sample(df: DataFrame, key_col: str, percent: int) -> DataFrame:
    """Deterministic hash sampling: keep rows whose md5(key) bucket
    (first 8 hex digits mod 100) falls below ``percent``.

    The pipeline-correct alternative to rand()-based sampling: the
    sample is a pure function of the key, so it is reproducible across
    runs/engines/partitionings, stable under retries, and consistent
    across tables sampled on the same key (joinable samples).  md5 is
    engine-portable (identical hex in Spark and ANSI SQL), so the same
    predicate defines the same sample everywhere.  Pure built-ins ⇒
    whole-stage codegen, pushes into the scan."""
    from presto_bloomfilter_spark.operators.sampling import md5_bucket

    return df.filter(md5_bucket(key_col, 100) < percent)


def repetition_metrics(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                       n: int = 2) -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al. 2021
    §A1.1: "repetitious documents are low quality"): per doc, the
    fraction of words that are repeats of an earlier word and the
    fraction of word n-grams that are repeats.  Boilerplate, keyword
    stuffing, and template spam all spike these.

    Pure built-in expressions (split / array_distinct / size), so the
    whole thing is one map-only codegen'd projection over the scan —
    no explode, no shuffle, no Python — and the identical computation
    runs in the DuckDB oracle (list_distinct over the same split).
    Word and gram construction are the SHARED column builders
    (contamination.split_words / word_grams) — one definition of word
    semantics and the gram recipe across operators and oracles.
    """
    from presto_bloomfilter_spark.operators.contamination import (
        split_words,
        word_grams,
    )

    words = split_words(text_col)
    n_words = F.size(words)
    grams = word_grams(text_col, n)
    n_grams = F.size(grams)
    return df.select(
        F.col(id_col).cast("string").alias("id"),
        n_words.cast("int").alias("n_words"),
        ((n_words - F.size(F.array_distinct(words))).cast("double") / n_words)
        .alias("word_rep_frac"),
        ((n_grams - F.size(F.array_distinct(grams))).cast("double") / n_grams)
        .alias("dup_gram_frac"),
    )


# ---- language ID (heuristic, not SQL-expressible) -----------------------------

# character trigram profiles per language — tiny, deterministic, built
# once; a real pipeline would learn these from labeled data.
_LANG_PROFILES = {
    "en": ("the", "ing", "ion", "and", "ent"),
    "de": ("der", "ein", "ich", "sch", "und"),
    "fr": ("les", "ent", "que", "ion", "eur"),
    "es": ("que", "ión", "los", "ado", "ent"),
    "zh": ("的", "是", "了", "在", "我"),
}


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """n-gram-overlap language guess per doc: (id, pred_lang, score)."""
    langs = list(_LANG_PROFILES)

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            texts = pdf[text_col].fillna("")
            scores = np.zeros((len(pdf), len(langs)))
            for j, lang in enumerate(langs):
                for tri in _LANG_PROFILES[lang]:
                    scores[:, j] += texts.str.count(tri).to_numpy()
            lens = texts.str.len().to_numpy().clip(min=1)
            scores /= lens[:, None]
            best = scores.argmax(axis=1)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype(str),
                    "pred_lang": [langs[b] for b in best],
                    "score": scores[np.arange(len(pdf)), best],
                }
            )

    return df.select(F.col(id_col).alias(id_col), F.col(text_col)).mapInPandas(
        fn, "id string, pred_lang string, score double"
    )


# ---- document fingerprinting (winnowing) --------------------------------------


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                k: int = 5, window: int = 8) -> DataFrame:
    """Winnowing fingerprint (Schleimer et al. 2003): min hash in each
    sliding window over k-gram hashes → compact set per doc.
    Returns (id, fingerprint array<long>) — stable under formatting-
    preserving edits, used for plagiarism-style containment checks.

    Fully batch-vectorized: gram hashing is one Arrow split + one
    string-hash pass (the dedup gram kernel), then ONE sliding-window
    min over the whole batch's flat gram array — windows that straddle
    a doc boundary are masked out rather than looped over — and a
    single lexsort dedups the selected minima per doc.  The only
    per-doc Python is the final np.split into list cells."""
    from presto_bloomfilter_spark.operators.dedup import _gram_stream_batch

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            g, gdoc, ndocs = _gram_stream_batch(pdf[text_col], k)
            counts = np.bincount(gdoc, minlength=ndocs)
            offsets = np.concatenate(([0], np.cumsum(counts)))
            n = len(g)
            # every window minimum over the FLAT array in one pass; a
            # window starting at s belongs to doc d = gdoc[s] iff it
            # lies fully inside d's segment
            if n >= window:
                wmin = np.lib.stride_tricks.sliding_window_view(g, window).min(axis=1)
                starts = np.arange(n - window + 1)
                sdoc = gdoc[starts]
                valid = starts + window <= offsets[sdoc + 1]
                long_doc, long_val = sdoc[valid], wmin[valid]
            else:
                long_doc = long_val = np.empty(0, dtype=np.int64)
            # docs shorter than one window contribute their whole-segment
            # min.  reduceat segments run start-to-next-start, so it
            # must see EVERY non-empty doc's offset (skipping a long doc
            # would fuse it into the preceding short one); the short
            # rows are selected afterwards.
            short = (counts > 0) & (counts < window)
            if short.any():
                nonempty = counts > 0
                segmin = np.minimum.reduceat(g, offsets[:-1][nonempty])[short[nonempty]]
                short_doc = np.flatnonzero(short)
            else:
                segmin = short_doc = np.empty(0, dtype=np.int64)
            all_doc = np.concatenate([long_doc, short_doc])
            all_val = np.concatenate([long_val.astype(g.dtype, copy=False),
                                      segmin.astype(g.dtype, copy=False)])
            order = np.lexsort((all_val, all_doc))
            d_s, v_s = all_doc[order], all_val[order]
            keep = np.ones(len(d_s), dtype=bool)
            keep[1:] = (d_s[1:] != d_s[:-1]) | (v_s[1:] != v_s[:-1])
            d_u, v_u = d_s[keep], v_s[keep].view(np.int64)
            bounds = np.cumsum(np.bincount(d_u, minlength=ndocs))[:-1]
            prints = np.split(v_u, bounds)
            yield pd.DataFrame({"id": pdf[id_col].astype(str).to_numpy(), "fingerprint": prints})

    return df.select(F.col(id_col).alias(id_col), F.col(text_col)).mapInPandas(
        fn, "id string, fingerprint array<long>"
    )


# ---- PII scrubbing --------------------------------------------------------------

# (name, regex, replacement) — patterns restricted to syntax that means
# the same thing in Java regex (Spark) and RE2 (DuckDB): character
# classes, bounded repetition, \b word boundaries; NO lookarounds or
# backreferences, so the DuckDB oracle runs the identical expressions
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
)


def pii_scrub(df: DataFrame, text_col: str = "text",
              patterns: tuple[tuple[str, str, str], ...] = PII_PATTERNS) -> DataFrame:
    """Redact PII-shaped spans (emails, IPv4s, phone-shaped numbers)
    from a text column — the standard scrub pass before training-data
    release.  Replaces ``text_col`` with the redacted text and adds
    ``n_redactions`` (int: total spans replaced across patterns).

    All-JVM: chained ``regexp_replace`` + ``regexp_count`` built-ins,
    so the whole pass is one map-only codegen'd projection over the
    scan — no Python, no shuffle, scales as a pure map at any corpus
    size.  Patterns are deliberately conservative (see PII_PATTERNS);
    swap in stricter ones per deployment policy.
    """
    scrubbed = F.col(text_col)
    counts = F.lit(0)
    for _name, pat, repl in patterns:
        # coalesce: NULL text must count as 0 redactions, not poison
        # the sum into NULL (the scrubbed text itself stays NULL)
        counts = counts + F.coalesce(F.regexp_count(scrubbed, F.lit(pat)), F.lit(0))
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return df.withColumn("n_redactions", counts.cast("int")).withColumn(
        text_col, scrubbed)
