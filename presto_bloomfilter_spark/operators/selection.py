"""DSIR-style data selection: hashed n-gram importance resampling.

Xie, Santurkar, Ma & Liang, "Data Selection for Language Models via
Importance Resampling" (NeurIPS 2023, arXiv:2302.03169): estimate bag
of hashed n-gram multinomials on a TARGET corpus (the distribution you
want more of) and on the RAW corpus, weight every raw document by its
log importance ratio, then draw a fixed-size sample without
replacement proportional to the weights via the Gumbel top-k trick
(Vieira 2014).  This is the standard published recipe for "pick the k
web documents that look most like my high-quality target set".

Everything is engine-portable and deterministic:

- words are the repo-wide ``str.split()`` semantics
  (contamination.split_words); features are unigrams + bigrams
  (bigrams joined with ``\\x1f``, the lm_score convention);
- the feature hash is the repo-wide md5 hex-prefix bucket
  (sampling.hex_prefix_bucket) so a DuckDB oracle reproduces every
  bucket exactly;
- Gumbel noise is a pure function of the document id
  (``-ln(-ln(u))`` with ``u = (first-13-md5-hex-digits + 0.5)/2^52``
  of ``id \\x1f 'gumbel'``), so the "random" sample is reproducible
  across runs, engines, partitionings, and task retries.

Scale posture (the 100 TB path): the two multinomial fits are
explode → groupBy(bucket) aggregations whose map-side partials top out
at ``buckets`` groups per task, so only O(partitions x buckets) count
rows ever shuffle regardless of corpus size.  The per-bucket
log-ratio table is <= ``buckets`` rows and broadcast-joined.  Scoring
is one explode + broadcast-join + groupBy(id) whose map-side partial
aggregation reduces each task's output to ~one row per document before
the shuffle.  Selection never sorts globally: the k-th order statistic
comes from Spark's per-partition top-k merge (TakeOrderedAndProject)
and only the single boundary row reaches the driver; the selected flag
is then a map-only comparison.  No per-row Python anywhere — the whole
operator is JVM built-ins under whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# 2^52 — u is built from 13 md5 hex digits (52 bits), +0.5 keeps it
# strictly inside (0, 1) so ln(u) and ln(-ln(u)) are always finite
_U52 = float(1 << 52)
_GUMBEL_SALT = "\x1fgumbel"


def _grams(text_col: str) -> Column:
    """Unigrams + bigrams with multiplicity (str.split() words;
    bigrams \\x1f-joined, the lm_score convention)."""
    from presto_bloomfilter_spark.operators.contamination import split_words

    words = split_words(text_col)
    n_pairs = F.greatest(F.size(words) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(words, 1, n_pairs),
        F.slice(words, 2, n_pairs),
        lambda a, b: F.concat(a, F.lit("\x1f"), b),
    )
    return F.concat(words, bigrams)


def gumbel_key(id_col: str) -> Column:
    """Deterministic per-id Gumbel(0, 1) draw: ``-ln(-ln(u))`` with
    ``u`` from the first 13 md5 hex digits of ``id || '\\x1fgumbel'``
    (salted so it is independent of the md5_bucket sampling
    predicates that hash the bare id)."""
    from presto_bloomfilter_spark.operators.sampling import hex_prefix_bucket  # noqa: F401  (doc cross-link)

    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(id_col).cast("string"), F.lit(_GUMBEL_SALT))),
                1, 13),
            16, 10).cast("long").cast("double") + F.lit(0.5)
    ) / F.lit(_U52)
    return -F.log(-F.log(u))


def _bucket_counts(df: DataFrame, text_col: str, buckets: int) -> DataFrame:
    """(bucket, c) gram counts — explode + groupBy whose map-side
    partials are capped at ``buckets`` groups per task."""
    from presto_bloomfilter_spark.operators.sampling import hex_prefix_bucket

    return (df.select(F.explode(_grams(text_col)).alias("g"))
            .select(hex_prefix_bucket(F.md5("g"), buckets).alias("bucket"))
            .groupBy("bucket").agg(F.count("*").alias("c")))


def dsir_log_ratios(
    target_df: DataFrame,
    raw_df: DataFrame,
    buckets: int = 4096,
    smoothing: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """Per-bucket log importance ratio table (one row for EVERY bucket
    in [0, buckets), so scoring never misses a key):

        llr[b] = ln((tc[b] + s) / (T + s*B)) - ln((rc[b] + s) / (R + s*B))

    with tc/rc the hashed-gram counts of the target/raw corpora and
    T/R their totals — two add-``smoothing`` multinomials, the paper's
    bag-of-hashed-ngrams generative model.  Declarative end to end:
    the totals ride along as a crossJoin of two 1-row aggregates, so
    nothing is collected to the driver.

    Each count table feeds TWO plan branches (the per-bucket join and
    its own total); Catalyst does not share subplans across branches,
    so the tables are ``persist()``-ed (<= ``buckets`` rows each — the
    stats.py small-intermediate contract, LRU-evicted) to keep the fit
    at ONE scan per corpus instead of two.
    """
    if buckets <= 0:
        raise ValueError("buckets must be positive")
    if smoothing <= 0:
        raise ValueError("smoothing must be positive (unseen buckets "
                         "need mass on both sides)")
    spark = raw_df.sparkSession
    tc = _bucket_counts(target_df, text_col, buckets).persist()
    rc = _bucket_counts(raw_df, text_col, buckets).persist()
    totals = (tc.agg(F.sum("c").alias("t_total"))
              .crossJoin(rc.agg(F.sum("c").alias("r_total"))))
    s, b = float(smoothing), float(buckets)
    grid = spark.range(buckets).select(F.col("id").alias("bucket"))
    return (grid
            .join(F.broadcast(tc.withColumnRenamed("c", "tc")), "bucket", "left")
            .join(F.broadcast(rc.withColumnRenamed("c", "rc")), "bucket", "left")
            .crossJoin(F.broadcast(totals))
            .select(
                "bucket",
                (F.log((F.coalesce(F.col("tc"), F.lit(0)) + F.lit(s))
                       / (F.coalesce(F.col("t_total"), F.lit(0)) + F.lit(s * b)))
                 - F.log((F.coalesce(F.col("rc"), F.lit(0)) + F.lit(s))
                         / (F.coalesce(F.col("r_total"), F.lit(0)) + F.lit(s * b)))
                 ).alias("llr"),
            ))


def dsir_log_weights(
    df: DataFrame,
    llr_df: DataFrame,
    buckets: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document log importance weight: the sum of its grams'
    bucket log-ratios.  Returns DataFrame[id string, n_grams int,
    log_weight double]; a document with no words keeps a row with
    n_grams 0 and log_weight 0.0 (explode_outer keeps it alive as a
    null gram that the sum ignores).
    """
    from presto_bloomfilter_spark.operators.sampling import hex_prefix_bucket

    exploded = (df.select(F.col(id_col).cast("string").alias("id"),
                          F.explode_outer(_grams(text_col)).alias("g"))
                .select("id", hex_prefix_bucket(F.md5("g"), buckets)
                        .alias("bucket")))
    return (exploded.join(F.broadcast(llr_df), "bucket", "left")
            .groupBy("id")
            .agg(F.count("llr").cast("int").alias("n_grams"),
                 F.coalesce(F.sum("llr"), F.lit(0.0)).alias("log_weight")))


def dsir_select(
    df: DataFrame,
    target_df: DataFrame,
    k: int,
    buckets: int = 4096,
    smoothing: float = 0.5,
    temperature: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR selection: flag the ``k`` documents sampled without
    replacement with probability proportional to
    ``exp(log_weight / temperature)`` via deterministic Gumbel top-k
    (selection key ``log_weight / temperature + Gumbel(id)``; ties —
    measure-zero with continuous keys — break toward smaller id).

    Returns DataFrame[id string, n_grams int, log_weight double,
    selected boolean] with one row per input document, so the caller
    can inspect the weights of dropped rows too; ``k >= n`` selects
    everything.  ``temperature → 0`` approaches hard top-k by weight;
    the paper's default is 1.

    Only the k-th boundary row is ever collected: the top-k runs as
    per-partition heaps + a k-row merge (TakeOrderedAndProject), is
    reduced to one (key, id) row by an aggregate, and the flag is a
    map-only comparison against that broadcast boundary.

    The weight table (one ~50 B row per document — orders of magnitude
    smaller than the text corpus it derives from) is ``persist()``-ed
    before the boundary collect: that collect executes the full
    two-corpus fit + scoring pipeline, and without materialization the
    returned DataFrame would RE-RUN it on the caller's first action —
    2x corpus scans (4x counting both fits).  MEMORY_AND_DISK (the
    DataFrame default) spills cleanly when the table outgrows executor
    memory.  Eviction follows the repo's stats.py contract: the cache
    stays valid for the returned lazy plan's lifetime and is dropped by
    Spark's LRU (or explicitly via
    ``spark.catalog.clearCache()``) — recomputation after eviction is
    correct, just slower.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    if temperature <= 0:
        raise ValueError("temperature must be positive")
    llr = dsir_log_ratios(target_df, df, buckets, smoothing, text_col)
    weights = (dsir_log_weights(df, llr, buckets, text_col, id_col)
               .withColumn("__gkey",
                           F.col("log_weight") / F.lit(float(temperature))
                           + gumbel_key("id"))
               .persist())
    bound = (weights.orderBy(F.desc("__gkey"), "id").limit(k)
             .agg(F.max(F.struct((-F.col("__gkey")).alias("ng"),
                                 F.col("id").alias("bid"))).alias("b"))
             .collect()[0]["b"])
    if bound is None:  # empty corpus
        return weights.select("id", "n_grams", "log_weight",
                              F.lit(False).alias("selected"))
    bkey, bid = -bound["ng"], bound["bid"]
    selected = (F.col("__gkey") > F.lit(bkey)) | (
        (F.col("__gkey") == F.lit(bkey)) & (F.col("id") <= F.lit(bid)))
    return weights.select("id", "n_grams", "log_weight",
                          selected.alias("selected"))
