"""Deterministic global shuffle — reproducible training-data ordering.

Training pipelines must shuffle documents before packing/serving, and
the shuffle must be REPRODUCIBLE: re-running the job (or re-reading a
shard after a failure) has to yield the identical order, or data
ordering silently diverges between restarts and between engines.
``rand()``-based ordering breaks all of that (non-deterministic under
retries and partitioning); this operator derives the order purely from
``md5(seed || key)`` — the same engine-portable hash discipline as
``sampling.md5_bucket``.

Two-level shape (the 100 TB posture — NO global sort):

1. every row hashes to ``shuffle_bucket = md5-bucket in [0, buckets)``
   (uniform, key-derived, skew-free by construction);
2. rows shuffle ONCE on the bucket id and each bucket is ranked
   independently (``shuffle_pos`` = rank by (full md5 hex, key) within
   the bucket) — a per-partition sort of n/buckets rows, never a
   single-partition global order.

Readers stream buckets 0..B-1, each ordered by ``shuffle_pos``: the
concatenation is a deterministic permutation of the corpus.  Changing
``seed`` yields an independent permutation (new training epoch order).

Reference scope note: the reference library has no shuffle operator —
this is a training-pipeline operator the north-star token tables need,
beside packing/sampling as consumers of the same input shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _shuffle_hash(key_col: str, seed: int):
    """Full md5 hex of seed||key: the engine-portable order key
    (identical string in Spark and ANSI SQL / DuckDB)."""
    return F.md5(F.concat(F.lit(f"shuffle-{seed}-"), F.col(key_col).cast("string")))


def deterministic_shuffle(
    df: DataFrame,
    key_col: str = "doc_id",
    seed: int = 0,
    buckets: int = 1024,
) -> DataFrame:
    """Assign every row a reproducible shuffle position: adds
    ``shuffle_bucket`` (int, in [0, buckets)) and ``shuffle_pos``
    (long, dense 1..n within the bucket).

    The global order is (shuffle_bucket asc, shuffle_pos asc) — a pure
    function of (seed, key), so it is identical across runs, engines,
    partitionings, and retries.  One shuffle on the uniform bucket id;
    each bucket sorts n/buckets rows independently (Catalyst runs the
    rank as a per-partition window after repartitioning on the key —
    no global sort, no driver involvement).

    Determinism requires ``key_col`` values to be UNIQUE (the normal
    doc_id contract): duplicate keys get identical (hash, key) sort
    keys and row_number breaks the tie by physical order, which is not
    stable across runs.  md5 collisions aside, unique keys make the
    order a pure function of the data.
    """
    if buckets <= 0:
        raise ValueError(f"buckets must be positive, got {buckets}")
    from presto_bloomfilter_spark.operators.sampling import hex_prefix_bucket

    h = _shuffle_hash(key_col, seed)
    with_h = df.withColumn("__shuffle_hash", h).withColumn(
        "shuffle_bucket",
        hex_prefix_bucket(F.col("__shuffle_hash"), buckets).cast("int"),
    )
    w = Window.partitionBy("shuffle_bucket").orderBy(
        F.col("__shuffle_hash"), F.col(key_col).cast("string")
    )
    return (
        with_h.withColumn("shuffle_pos", F.row_number().over(w).cast("long"))
        .drop("__shuffle_hash")
    )


def write_shuffled(
    df: DataFrame,
    path: str,
    key_col: str = "doc_id",
    seed: int = 0,
    buckets: int = 1024,
    mode: str = "overwrite",
) -> None:
    """Materialize the shuffled corpus as parquet partitioned by
    ``shuffle_bucket`` with rows sorted by ``shuffle_pos`` within each
    file — a reader walking buckets in order streams the deterministic
    permutation with plain sequential scans (partition pruning gives
    resumable, sliceable epochs: bucket ranges are work units)."""
    out = deterministic_shuffle(df, key_col, seed, buckets)
    (
        out.repartition(F.col("shuffle_bucket"))
        .sortWithinPartitions("shuffle_bucket", "shuffle_pos")
        .write.mode(mode)
        .partitionBy("shuffle_bucket")
        .parquet(path)
    )
