"""Shuffle-skew diagnostics: per-key distribution statistics.

Every skew mitigation in this repo — salted grouped sketch builds
(``aggregate.grouped_sketch(strategy="salted")``), the temporal
operators' ``salt_block`` hot-key mode, capped LSH buckets — needs the
hot keys FOUND first.  ``key_skew`` is that triage pass: the top-k
heaviest keys plus corpus-level skew statistics (max share, exact
p50/p99 of the per-key count distribution, coefficient of variation,
max-to-mean ratio), computed without ever sorting all keys globally.

Scale shape: ONE groupBy(key).count() shuffle (map-side partials), a
TakeOrderedAndProject for the top-k, and — the part that matters at
100 TB — exact count-quantiles via the DISTINCT-COUNT-VALUE histogram:
counts are grouped by their value (bounded by the number of distinct
count values, tiny even when keys are billions) and the quantile is
read off a cumulative window over that histogram, never a global
row_number over all keys.  The moment statistics are explicit integer
sums (Σcnt, Σcnt², max) so both engines compute bit-identical doubles.
No Python, no driver-side tables; the summary is a one-row broadcast
joined onto the top-k rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def key_skew(df: DataFrame, key_col: str, k: int = 10) -> DataFrame:
    """Top-``k`` heaviest keys with corpus skew statistics.

    Returns DataFrame[rank int, key string, cnt long, share double,
    n_rows long, n_keys long, max_share double, p50_cnt long,
    p99_cnt long, cv double, skew_ratio double] — one row per top key
    (score order: cnt desc, key asc), the summary columns repeated on
    each (single-row broadcast).  NULL keys count as the string
    'NULL' bucket is NOT created — null keys are dropped (they never
    participate in a hash shuffle's skew the same way; filter
    upstream if they matter).

    Definitions (all exact): ``share`` = cnt / n_rows; ``pXX_cnt`` =
    the smallest per-key count c with #keys(cnt <= c) >= ceil(XX% *
    n_keys); ``cv`` = sqrt(Σcnt²/n_keys - mean²) / mean with mean =
    n_rows / n_keys; ``skew_ratio`` = max_cnt / mean.

    EAGER and cache-clean (the ``temporal.funnel`` contract): the
    per-key count table feeds four consumers, so it is persisted, the
    ≤k result rows are collected, and the cache is released before
    returning — the base table is scanned exactly once.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    spark = df.sparkSession
    key = F.col(key_col)
    counts = (df.where(key.isNotNull())
              .groupBy(key.cast("string").alias("key"))
              .agg(F.count("*").alias("cnt"))).persist()

    # distinct-count-value histogram: |distinct cnt values| rows
    hist = counts.groupBy("cnt").agg(F.count("*").alias("nk"))
    w = Window.orderBy("cnt").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.withColumn("cum", F.sum("nk").over(w))

    totals = counts.agg(
        F.sum("cnt").alias("n_rows"),
        F.count("*").alias("n_keys"),
        F.max("cnt").alias("max_cnt"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("sum_sq"),
    )

    def _pct(p: float, alias: str):
        # smallest cnt whose cumulative key count reaches ceil(p * n_keys)
        thresh = F.ceil(F.lit(p) * F.col("n_keys"))
        return (cum.crossJoin(F.broadcast(totals.select("n_keys")))
                .where(F.col("cum") >= thresh)
                .agg(F.min("cnt").alias(alias)))

    summary = (totals
               .crossJoin(F.broadcast(_pct(0.50, "p50_cnt")))
               .crossJoin(F.broadcast(_pct(0.99, "p99_cnt"))))
    mean = F.col("n_rows").cast("double") / F.col("n_keys")
    summary = summary.select(
        "n_rows", "n_keys",
        (F.col("max_cnt").cast("double")
         / F.col("n_rows")).alias("max_share"),
        "p50_cnt", "p99_cnt",
        (F.sqrt(F.col("sum_sq").cast("double") / F.col("n_keys")
                - mean * mean) / mean).alias("cv"),
        (F.col("max_cnt").cast("double") / mean).alias("skew_ratio"),
    )

    top = (counts.orderBy(F.desc("cnt"), "key").limit(k)
           .withColumn("rank", F.row_number().over(
               Window.orderBy(F.desc("cnt"), "key"))))
    out = (top.crossJoin(F.broadcast(summary))
           .select("rank", "key", "cnt",
                   (F.col("cnt").cast("double")
                    / F.col("n_rows")).alias("share"),
                   "n_rows", "n_keys", "max_share",
                   "p50_cnt", "p99_cnt", "cv", "skew_ratio"))
    rows = out.collect()  # <= k rows by construction
    schema = out.schema
    counts.unpersist()
    return spark.createDataFrame(rows, schema)


def corpus_diff(old_df, new_df, id_col: str = "doc_id",
                text_col: str = "text", source_col: str = "source"):
    """Snapshot delta report between two corpus versions — the audit a
    pipeline publishes when a crawl refresh lands: per source, how many
    documents were ADDED (id only in new), REMOVED (id only in old),
    CHANGED (same id, different md5 of text), and UNCHANGED.

    Returns one row per source:
    (source, added, removed, changed, unchanged) — all exact bigints.
    A doc's source is read from the side where it exists (new wins when
    both).  100 TB posture: one digest projection per side (map-only),
    one full-outer shuffle join keyed on the doc id, then a counts
    aggregate keyed on source — no row text ever crosses the join, only
    (id, source, 16-byte digest).
    """
    from pyspark.sql import functions as F

    def prep(df, tag):
        return df.select(
            F.col(id_col).cast("string").alias("id"),
            F.col(source_col).alias(f"src_{tag}"),
            F.md5(F.col(text_col)).alias(f"h_{tag}"),
        )

    j = prep(old_df, "old").join(prep(new_df, "new"), "id", "full_outer")
    state = (
        F.when(F.col("h_old").isNull(), F.lit("added"))
        .when(F.col("h_new").isNull(), F.lit("removed"))
        .when(F.col("h_old") != F.col("h_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.select(F.coalesce(F.col("src_new"), F.col("src_old")).alias("source"),
                 state.alias("state"))
        .groupBy("source")
        .agg(
            F.sum((F.col("state") == "added").cast("long")).alias("added"),
            F.sum((F.col("state") == "removed").cast("long")).alias("removed"),
            F.sum((F.col("state") == "changed").cast("long")).alias("changed"),
            F.sum((F.col("state") == "unchanged").cast("long")).alias("unchanged"),
        )
    )
