"""Exact-substring dedup: find (and strip) text spans that occur more
than once across the corpus — the dedup family document-level
MinHash/SimHash/exact-hash cannot express (Lee et al. 2022,
arXiv:2107.06499, the "deduplicating training data" suffix-array
method; this is the hashed-window formulation of the same detector).

Method: every length-``min_len`` word window is hashed JVM-side
(sequence/slice/concat_ws/xxhash64 — pure Catalyst, no Python);
windows whose hash occurs ≥2 times globally (or in ≥2 distinct docs
with ``cross_doc_only``) are duplicated; overlapping/adjacent marked
windows merge into maximal spans per doc with one window-function
island pass.  Any duplicated substring of ≥ min_len words contains at
least one duplicated window, so spans cover exactly the repeated
regions at window granularity.

Scale posture: one shuffle keyed on the (uniform) 64-bit window hash
for the occurrence count, one shuffle-join back to positions, one
per-doc window pass for island merge — all row counts are O(total
words), the same order a distributed suffix array pays, with no
per-row Python anywhere.  Hash collisions (xxhash64, ~2^-64 per pair)
can only over-mark a span, never crash; pass ``verify=True`` on
``duplicated_spans`` to re-check candidate windows on the exact gram
string (one extra join keyed on the same hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _words(text_col: str):
    """str.split() semantics as a Column: split on whitespace runs and
    drop empties — Spark's trim() removes only 0x20 spaces, so a
    leading tab/newline would otherwise emit an empty first word and
    shift every span index off the documented word numbering."""
    return F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")


def _word_grams(df: DataFrame, text_col: str, id_col: str, min_len: int) -> DataFrame:
    """(id, pos, h): xxhash64 of each length-min_len word window.
    Word semantics = the repo-wide str.split() (whitespace runs, no
    empties); docs shorter than min_len words emit nothing."""
    d = (
        df.select(F.col(id_col).cast("string").alias("id"),
                  _words(text_col).alias("w"))
        .filter(F.size("w") >= min_len)
    )
    gram_expr = (
        f"transform(sequence(0, size(w) - {min_len}), "
        f"i -> concat_ws(' ', slice(w, i + 1, {min_len})))"
    )
    return d.select(
        "id", F.posexplode(F.expr(gram_expr)).alias("pos", "g")
    ).select("id", "pos", F.xxhash64("g").alias("h"), "g")


def duplicated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 8,
    cross_doc_only: bool = False,
    verify: bool = False,
) -> DataFrame:
    """Maximal duplicated spans per doc →
    DataFrame[id string, start int, end int] (word indices, end
    exclusive): every returned span is a run of words entirely covered
    by length-``min_len`` windows that occur ≥2 times in the corpus
    (``cross_doc_only``: in ≥2 distinct docs).  Overlapping or exactly
    adjacent windows merge into one span.

    ``verify=True`` re-joins candidate positions on the exact gram
    string (not just the hash) before marking — eliminates the ~2^-64
    hash-collision over-mark at the cost of shipping gram strings
    through one extra shuffle."""
    grams = _word_grams(df, text_col, id_col, min_len)
    key = ["h", "g"] if verify else ["h"]
    occ = grams.groupBy(*key).agg(
        F.count("*").alias("cnt"),
        F.countDistinct("id").alias("ndoc"),
    )
    dup = occ.filter(
        (F.col("ndoc") >= 2) if cross_doc_only else (F.col("cnt") >= 2)
    ).select(*key)
    marked = grams.join(dup, key).select("id", "pos")

    w = Window.partitionBy("id").orderBy("pos")
    prev_end = F.max(F.col("pos") + min_len).over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    islands = marked.withColumn(
        "new_island",
        (F.col("pos") > F.coalesce(prev_end, F.lit(-1))).cast("int"),
    ).withColumn("island", F.sum("new_island").over(w))
    return (
        islands.groupBy("id", "island")
        .agg(F.min("pos").alias("start"),
             (F.max("pos") + min_len).alias("end"))
        .select("id", F.col("start").cast("int"),
                F.col("end").cast("int"))
    )


def maximal_exact_matches(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 8,
    max_occurrences: int = 256,
    verify: bool = False,
) -> DataFrame:
    """Every maximal exact match (MEM) of ≥ ``min_len`` words between
    two positions of the corpus → DataFrame[id_a string, pos_a int,
    id_b string, pos_b int, len_w int]: the words
    ``a[pos_a : pos_a+len_w] == b[pos_b : pos_b+len_w]`` and the match
    cannot be extended one word left or right at both occurrences
    simultaneously (or hits a document boundary).  This is the exact
    per-repeat output of Lee et al.'s suffix-array pass
    (arXiv:2107.06499) that ``duplicated_spans`` cannot express: the
    window form reports fused per-doc coverage, while MEMs pin the
    precise boundary and the partner occurrence of EACH repeat — two
    distinct repeats that happen to be adjacent in one document stay
    two rows with their own partners and lengths.

    Method (suffix-array-free but equivalent on bounded-frequency
    grams): two overlapping equal ``min_len``-word windows compose to
    an equal ``min_len+1``-word window, so a run of r consecutive
    window matches on one (id_a, id_b, pos_b-pos_a) diagonal is
    exactly an equality of ``min_len + r - 1`` words, and a maximal
    run is a maximal match (the extending window pair would belong to
    the same diagonal run).  Dataflow: one gram-hash shuffle for
    occurrence counts, one hash-keyed self-join producing occurrence
    pairs, one diagonal-keyed window pass for run detection — all
    shuffles keyed on uniform 64-bit hashes.

    Scale posture: a gram value with f occurrences yields f(f-1)/2
    pairs, so grams with more than ``max_occurrences`` occurrences
    (web boilerplate) are EXCLUDED from pairing — that bounds the
    self-join at f_cap·n_dup rows but under-reports matches whose
    every alignment routes through a super-cap window (their coverage
    is still fully captured by ``duplicated_spans``, which has no
    frequency cap; raise ``max_occurrences`` when exactness matters
    more than the shuffle bound).  ``verify=True`` keys every
    join/count on the gram STRING as well as the hash, removing the
    ~2^-64 per-pair collision risk."""
    grams = _word_grams(df, text_col, id_col, min_len)
    key = ["h", "g"] if verify else ["h"]
    occ = grams.groupBy(*key).agg(F.count("*").alias("cnt"))
    dup = occ.filter(
        (F.col("cnt") >= 2) & (F.col("cnt") <= max_occurrences)
    ).select(*key)
    marked = grams.join(dup, key).select("id", "pos", *key)
    a = marked.select(
        F.col("id").alias("id_a"), F.col("pos").alias("pos_a"), *key)
    b = marked.select(
        F.col("id").alias("id_b"), F.col("pos").alias("pos_b"),
        *[F.col(k).alias(f"{k}_b") for k in key])
    cond = [F.col(k) == F.col(f"{k}_b") for k in key]
    pairs = a.join(b, cond).filter(
        (F.col("id_a") < F.col("id_b"))
        | ((F.col("id_a") == F.col("id_b"))
           & (F.col("pos_a") < F.col("pos_b")))
    ).select("id_a", "pos_a", "id_b", "pos_b",
             (F.col("pos_b") - F.col("pos_a")).alias("diag"))
    w = Window.partitionBy("id_a", "id_b", "diag").orderBy("pos_a")
    chains = pairs.withColumn(
        "new_chain",
        F.when(F.col("pos_a") - F.lag("pos_a").over(w) == 1,
               F.lit(0)).otherwise(F.lit(1)),
    ).withColumn("chain", F.sum("new_chain").over(w))
    return (
        chains.groupBy("id_a", "id_b", "diag", "chain")
        .agg(F.min("pos_a").alias("start_a"),
             F.min("pos_b").alias("start_b"),
             (F.count("*") + min_len - 1).alias("len_w"))
        .select("id_a", F.col("start_a").cast("int").alias("pos_a"),
                "id_b", F.col("start_b").cast("int").alias("pos_b"),
                F.col("len_w").cast("int"))
    )


def strip_duplicated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 8,
    cross_doc_only: bool = False,
) -> DataFrame:
    """Remove every duplicated span from every doc →
    DataFrame[id string, text string] (docs with no duplicated span
    pass through unchanged).

    NOTE on semantics: this strips ALL occurrences of repeated
    material (the conservative contamination-removal stance); Lee et
    al.'s keep-one-occurrence policy is expressible by exempting one
    doc per duplicate cluster before stripping.  Rebuild is pure
    Catalyst: filter the word array against the doc's span list, no
    Python."""
    spans = duplicated_spans(df, text_col, id_col, min_len, cross_doc_only)
    span_lists = spans.groupBy("id").agg(
        F.collect_list(F.struct("start", "end")).alias("spans"))
    base = df.select(F.col(id_col).cast("string").alias("id"),
                     F.col(text_col).alias("__orig"),
                     _words(text_col).alias("w"))
    joined = base.join(span_lists, "id", "left")
    kept = F.expr(
        "filter(transform(w, (x, i) -> struct(x as x, i as i)), "
        "s -> spans is null or not exists(spans, "
        "sp -> sp.start <= s.i and s.i < sp.end))"
    )
    return joined.select(
        "id",
        F.when(F.col("spans").isNull(), F.col("__orig"))
         .otherwise(F.concat_ws(" ", F.transform(kept, lambda s: s.x)))
         .alias("text"),
    )
