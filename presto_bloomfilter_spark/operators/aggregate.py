"""Distributed sketch aggregation — the UDAF layer.

PySpark has no user-defined aggregate functions, so the reference's
partial/combine/output protocol (reference
AbstractBloomFilterAggregation.java:19-60 + BloomFilterStateSerializer
.java:21-47) is rebuilt as explicit dataflow:

  ungrouped:  df.mapInArrow(partial build)   — one tiny binary row per
              input partition (this is Presto's "partial" phase; no
              shuffle of raw rows, only of sketch blobs)
              → repartition(fan_in).mapInArrow(merge)  — intermediate
              tree level, bounds the final fan-in (north_rule:
              "two-level treeAggregate-style partial-sketch merges to
              avoid driver hotspots")
              → driver merges ≤ fan_in blobs ("final" phase).

  grouped:    df.groupBy(key).applyInPandas(build)     — Catalyst plans
              the hash shuffle; for skewed keys the salted variant
              groups by (key, salt) first and then merges per key, so
              no single task owns a whole hot key.

Scale notes (100 TB / 1000 executors): the partial phase reads each
input partition exactly once and emits O(sketch_size) bytes per
partition — shuffle volume is partitions × sketch bytes, independent of
row count.  fan_in bounds both the level-2 task count and the driver's
final merge work.  applyInPandas materializes each group in one worker
(that is *why* salting is mandatory for a 55%-skewed `source`).
"""

from __future__ import annotations

import contextlib
from collections.abc import Callable, Iterator
from dataclasses import dataclass
from functools import reduce

import numpy as np
import pandas as pd
import pyarrow as pa

from pyspark.sql import DataFrame, functions as F

from presto_bloomfilter_spark.functions.bloom import BloomFilter
from presto_bloomfilter_spark.functions.cms import CountMinSketch
from presto_bloomfilter_spark.functions.hll import HyperLogLog
from presto_bloomfilter_spark.functions.kll import KLLSketch
from presto_bloomfilter_spark.functions.multi import MultiSketch
from presto_bloomfilter_spark.functions.cbf import CountingBloomFilter
from presto_bloomfilter_spark.functions.sbbf import SplitBlockBloomFilter
from presto_bloomfilter_spark.functions.tdigest import TDigest
from presto_bloomfilter_spark.functions.serialization import sketch_from_bytes

DEFAULT_FAN_IN = 16

_ARROW_BATCH_KEY = "spark.sql.execution.arrow.maxRecordsPerBatch"


def tune_arrow_batches(df_or_spark) -> None:
    """Pin JVM→Python Arrow transfer batches to a cache-resident size.

    Rows here carry wide ``array<int>`` token columns (~180 elements),
    so the 10,000-row default batch is ~7 MB of list data — it thrashes
    L2 on both sides of the socket.  4096-row (~3 MB) batches keep the
    produce→serialize→consume pipeline cache-resident: measured 4-7x on
    the DataFrame-path sketch build (4.0 s → 0.56 s for 75M tokens at
    local[16]).  Only applied while the conf sits at its default, so an
    explicit user setting always wins.

    NOTE: this change is session-global and persists after the call —
    lazy operators (``grouped_sketch``) return un-executed DataFrames,
    so the conf must still hold when the action finally runs.  Eager
    operators (``aggregate_sketch``) instead use the scoped
    ``_tuned_arrow_batches`` context manager, which restores the
    previous value once their job completes.
    """
    spark = getattr(df_or_spark, "sparkSession", df_or_spark)
    try:
        if spark.conf.get(_ARROW_BATCH_KEY, "10000") == "10000":
            spark.conf.set(_ARROW_BATCH_KEY, "4096")
    except Exception:  # pragma: no cover — conf API unavailable
        pass


@contextlib.contextmanager
def _tuned_arrow_batches(df_or_spark):
    """Scoped form of tune_arrow_batches: set the cache-resident Arrow
    batch size for the duration of an eager job, then restore, so
    unrelated pandas-UDF workloads in the same session keep the default."""
    spark = getattr(df_or_spark, "sparkSession", df_or_spark)
    prev = None
    try:
        if spark.conf.get(_ARROW_BATCH_KEY, "10000") == "10000":
            spark.conf.set(_ARROW_BATCH_KEY, "4096")
            prev = "10000"
    except Exception:  # pragma: no cover — conf API unavailable
        pass
    try:
        yield
    finally:
        if prev is not None:
            try:
                spark.conf.set(_ARROW_BATCH_KEY, prev)
            except Exception:  # pragma: no cover
                pass


class TokenDedupAccumulator:
    """Map-side pre-aggregation of duplicate token ids before sketch insert.

    Token corpora are heavily Zipf-skewed over a bounded vocabulary, so a
    partition sees each id thousands of times.  Bloom/HLL inserts are
    idempotent and CMS accepts weighted inserts, so counting duplicates
    first and hashing each unique id once is semantically identity — but
    it turns ~200 bytes of uint64 hash traffic per token into one
    cache-resident ``np.bincount`` increment (~8 bytes/token), which is
    the difference between a memory-bandwidth-bound kernel (measured
    0.39 scaling efficiency 4→16 cores on this host) and a compute-bound
    one (0.81+).  This is the sketch-domain analogue of Spark's map-side
    partial aggregation before a shuffle.

    Adaptive range: counts live in a [base, base+len) int64 array grown
    on demand; if the observed id range exceeds ``RANGE_CAP`` (i.e. the
    column is not a bounded vocab), we flush and fall back to direct
    vectorized inserts — no pathological memory use on arbitrary ints.
    """

    RANGE_CAP = 1 << 22  # 4M distinct ids → 32MB counts array, max

    def __init__(self, sketch, weighted: bool | None = None):
        self.sketch = sketch
        self.counts: np.ndarray | None = None
        self.base = 0
        self.direct = False
        self.weighted = (
            isinstance(sketch, (CountMinSketch, MultiSketch))
            if weighted is None
            else weighted
        )

    def add_flat(self, flat: np.ndarray) -> None:
        if flat.size == 0:
            return
        if self.direct:
            self.sketch.add_ints(flat)
            return
        mn = int(flat.min())
        mx = int(flat.max())
        if self.counts is None:
            if mx - mn >= self.RANGE_CAP:
                self.direct = True
                self.sketch.add_ints(flat)
                return
            # cap the PADDED size too, not just the raw range, so the
            # first allocation never exceeds RANGE_CAP counts
            pad = max(1024, (mx - mn) // 4)
            pad = min(pad, max(0, (self.RANGE_CAP - (mx - mn + 1)) // 2))
            self.base = mn - pad
            self.counts = np.zeros(mx + pad - self.base + 1, dtype=np.int64)
        elif mn < self.base or mx >= self.base + len(self.counts):
            nb = min(self.base, mn)
            ne = max(self.base + len(self.counts), mx + 1)
            if ne - nb > self.RANGE_CAP:
                self.flush()
                self.direct = True
                self.sketch.add_ints(flat)
                return
            grown = np.zeros(ne - nb, dtype=np.int64)
            grown[self.base - nb : self.base - nb + len(self.counts)] = self.counts
            self.base, self.counts = nb, grown
        self.counts += np.bincount(flat - self.base, minlength=len(self.counts))

    def flush(self) -> None:
        """Push accumulated (id, count) pairs into the wrapped sketch."""
        if self.counts is None:
            return
        nz = np.nonzero(self.counts)[0]
        if nz.size:
            vals = nz + self.base
            if self.weighted:
                self.sketch.add_ints(vals, counts=self.counts[nz])
            else:
                total = int(self.counts[nz].sum())
                self.sketch.add_ints(vals)
                # keep the offered-rows metric meaning rows, not uniques
                if hasattr(self.sketch, "approx_items"):
                    self.sketch.approx_items += total - int(nz.size)
        self.counts = None

    def finish(self):
        self.flush()
        return self.sketch

    def to_bytes(self) -> bytes:
        return self.finish().to_bytes()


def _unwrap(sk):
    return sk.finish() if isinstance(sk, TokenDedupAccumulator) else sk


@dataclass(frozen=True)
class SketchSpec:
    """factory() → empty sketch; update(sketch, arrow RecordBatch) →
    vectorized bulk insert of one batch. Both run inside executors."""

    columns: tuple[str, ...]
    factory: Callable[[], object]
    update: Callable[[object, pa.RecordBatch], None]


# ---- batch extractors (Arrow-level, no per-row Python) -----------------------


def _col_strings(batch: pa.RecordBatch, name: str) -> pd.Series:
    return batch.column(batch.schema.get_field_index(name)).to_pandas()


def _col_flat_tokens(batch: pa.RecordBatch, name: str) -> np.ndarray:
    """Flatten an array<int> column to one numpy vector — zero-copy via
    pyarrow ListArray.flatten() (SURVEY.md §2.3: the vectorized form of
    F.explode for sketch input)."""
    col = batch.column(batch.schema.get_field_index(name))
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten()
    return flat.to_numpy(zero_copy_only=False)


def _col_floats(batch: pa.RecordBatch, name: str) -> np.ndarray:
    col = batch.column(batch.schema.get_field_index(name))
    return col.to_numpy(zero_copy_only=False)


def _col_ints(batch: pa.RecordBatch, name: str) -> np.ndarray:
    """Non-null values of an integer column, exact int64.  Nulls are
    dropped at the ARROW level: converting first would float the whole
    batch (NaN for nulls, silent precision loss above 2^53) — the
    int-hash guard in hashing.py would then reject it loudly, but the
    insert semantics should simply ignore nulls like add_strings does."""
    col = batch.column(batch.schema.get_field_index(name))
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        col = col.drop_null()
    return col.to_numpy(zero_copy_only=False)


# ---- prebuilt specs ----------------------------------------------------------


def bloom_over_strings(col: str, n: int = BloomFilter.DEFAULT_EXPECTED_INSERTIONS,
                       p: float = BloomFilter.DEFAULT_FPP) -> SketchSpec:
    """bloom_filter(varchar[, n[, p]]) parity (reference
    BloomFilterAggregation.java:31-62)."""
    return SketchSpec(
        (col,),
        lambda: BloomFilter(n, p),
        lambda sk, b: sk.add_strings(_col_strings(b, col)),
    )


def bloom_over_tokens(col: str = "tokens", n: int = BloomFilter.DEFAULT_EXPECTED_INSERTIONS,
                      p: float = BloomFilter.DEFAULT_FPP) -> SketchSpec:
    return SketchSpec(
        (col,),
        lambda: TokenDedupAccumulator(BloomFilter(n, p)),
        lambda sk, b: sk.add_flat(_col_flat_tokens(b, col)),
    )


def bloom_over_ints(col: str, n: int = BloomFilter.DEFAULT_EXPECTED_INSERTIONS,
                    p: float = BloomFilter.DEFAULT_FPP) -> SketchSpec:
    """bloom_filter over a scalar integer column — no string casts, int
    hashing stays pure numpy."""
    return SketchSpec(
        (col,),
        lambda: BloomFilter(n, p),
        lambda sk, b: sk.add_ints(_col_ints(b, col)),
    )


def sbbf_over_strings(col: str, n: int = SplitBlockBloomFilter.DEFAULT_EXPECTED_INSERTIONS,
                      p: float = SplitBlockBloomFilter.DEFAULT_FPP) -> SketchSpec:
    """Split-block (Parquet-style blocked) bloom over a string column —
    same build dataflow as bloom_over_strings, one-cache-line probes."""
    return SketchSpec(
        (col,),
        lambda: SplitBlockBloomFilter(n, p),
        lambda sk, b: sk.add_strings(_col_strings(b, col)),
    )


def sbbf_over_tokens(col: str = "tokens", n: int = SplitBlockBloomFilter.DEFAULT_EXPECTED_INSERTIONS,
                     p: float = SplitBlockBloomFilter.DEFAULT_FPP) -> SketchSpec:
    return SketchSpec(
        (col,),
        lambda: TokenDedupAccumulator(SplitBlockBloomFilter(n, p)),
        lambda sk, b: sk.add_flat(_col_flat_tokens(b, col)),
    )


def sbbf_over_ints(col: str, n: int = SplitBlockBloomFilter.DEFAULT_EXPECTED_INSERTIONS,
                   p: float = SplitBlockBloomFilter.DEFAULT_FPP) -> SketchSpec:
    return SketchSpec(
        (col,),
        lambda: SplitBlockBloomFilter(n, p),
        lambda sk, b: sk.add_ints(_col_ints(b, col)),
    )


def cbf_over_strings(col: str, n: int = CountingBloomFilter.DEFAULT_EXPECTED_INSERTIONS,
                     p: float = CountingBloomFilter.DEFAULT_FPP) -> SketchSpec:
    """Counting bloom over a string column — merge is saturating
    counter ADDITION (multiset), so the same partial/tree dataflow
    builds both the insert filter and the delete filter that
    ``CountingBloomFilter.subtract`` consumes."""
    return SketchSpec(
        (col,),
        lambda: CountingBloomFilter(n, p),
        lambda sk, b: sk.add_strings(_col_strings(b, col)),
    )


def cbf_over_ints(col: str, n: int = CountingBloomFilter.DEFAULT_EXPECTED_INSERTIONS,
                  p: float = CountingBloomFilter.DEFAULT_FPP) -> SketchSpec:
    return SketchSpec(
        (col,),
        lambda: CountingBloomFilter(n, p),
        lambda sk, b: sk.add_ints(_col_ints(b, col)),
    )


def hll_over_strings(col: str, precision: int = HyperLogLog.DEFAULT_PRECISION) -> SketchSpec:
    return SketchSpec(
        (col,),
        lambda: HyperLogLog(precision),
        lambda sk, b: sk.add_strings(_col_strings(b, col)),
    )


def hll_over_tokens(col: str = "tokens", precision: int = HyperLogLog.DEFAULT_PRECISION) -> SketchSpec:
    return SketchSpec(
        (col,),
        lambda: TokenDedupAccumulator(HyperLogLog(precision)),
        lambda sk, b: sk.add_flat(_col_flat_tokens(b, col)),
    )


def cms_over_tokens(col: str = "tokens", eps: float = 1e-4, delta: float = 0.01) -> SketchSpec:
    return SketchSpec(
        (col,),
        lambda: TokenDedupAccumulator(CountMinSketch(eps, delta)),
        lambda sk, b: sk.add_flat(_col_flat_tokens(b, col)),
    )


def cms_over_strings(col: str, eps: float = 1e-4, delta: float = 0.01) -> SketchSpec:
    return SketchSpec(
        (col,),
        lambda: CountMinSketch(eps, delta),
        lambda sk, b: sk.add_strings(_col_strings(b, col)),
    )


def cms_over_ints(col: str, eps: float = 1e-4, delta: float = 0.01) -> SketchSpec:
    """count-min over a scalar integer column — no string casts, int
    hashing stays pure numpy (the join-key shape for
    ``CountMinSketch.inner_product`` join-size estimation)."""
    return SketchSpec(
        (col,),
        lambda: CountMinSketch(eps, delta),
        lambda sk, b: sk.add_ints(_col_ints(b, col)),
    )


def _col_matrix(batch: pa.RecordBatch, name: str, d: int) -> "np.ndarray":
    """array<float> column → (m, d) float64 matrix, zero-copy flatten +
    reshape (the vectorized row-batch form FD/Gram accumulators eat)."""
    col = batch.column(batch.schema.get_field_index(name))
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    if flat.size != len(col) * d:
        raise ValueError(
            f"ragged or null vectors in '{name}': {flat.size} values for "
            f"{len(col)} rows at declared dim {d}")
    return flat.reshape(-1, d)


def fd_over_vectors(col: str, d: int, ell: int = 32) -> SketchSpec:
    """Frequent-Directions matrix sketch (functions/fd.py) over an
    array<float> embedding column: ℓ×d state per partial, one SVD per
    Arrow batch, tree-merged with the GLPW mergeability guarantee."""
    from presto_bloomfilter_spark.functions.fd import FrequentDirections

    return SketchSpec(
        (col,),
        lambda: FrequentDirections(d, ell),
        lambda sk, b: sk.add(_col_matrix(b, col, d)),
    )


def gram_over_vectors(col: str, d: int) -> SketchSpec:
    """Exact distributed Gram/covariance accumulator (AᵀA, lossless
    vector-add merge) over an array<float> column."""
    from presto_bloomfilter_spark.functions.fd import ExactGram

    return SketchSpec(
        (col,),
        lambda: ExactGram(d),
        lambda sk, b: sk.add(_col_matrix(b, col, d)),
    )


def countsketch_over_strings(col: str, width: int = 4096, depth: int = 7) -> SketchSpec:
    """Count-Sketch (signed AMS, functions/countsketch.py) over a string
    column — the UNBIASED frequency/F2/join-size sibling of
    cms_over_strings with a lossless elementwise-add merge."""
    from presto_bloomfilter_spark.functions.countsketch import CountSketch

    return SketchSpec(
        (col,),
        lambda: CountSketch(width, depth),
        lambda sk, b: sk.add_strings(_col_strings(b, col)),
    )


def countsketch_over_ints(col: str, width: int = 4096, depth: int = 7) -> SketchSpec:
    """Count-Sketch over a scalar integer column (join keys, token ids)."""
    from presto_bloomfilter_spark.functions.countsketch import CountSketch

    return SketchSpec(
        (col,),
        lambda: CountSketch(width, depth),
        lambda sk, b: sk.add_ints(_col_ints(b, col)),
    )


def token_family_over_tokens(
    col: str = "tokens",
    bloom_n: int = 1_000_000,
    bloom_p: float = BloomFilter.DEFAULT_FPP,
    cms_eps: float = 1e-4,
    cms_delta: float = 0.01,
    hll_precision: int = HyperLogLog.DEFAULT_PRECISION,
) -> SketchSpec:
    """Bloom + CMS + HLL over one tokens scan — the fused sketch family.

    The scan (parquet decode + transport) dominates a sketch build, so
    building membership, frequency, and cardinality sketches in a single
    pass costs ~⅓ of three separate jobs; all three flush from the same
    dedup counts (TokenDedupAccumulator), so the kernels run once per
    unique id per partition, not once per token.
    """
    return SketchSpec(
        (col,),
        lambda: TokenDedupAccumulator(
            MultiSketch(
                [
                    BloomFilter(bloom_n, bloom_p),
                    CountMinSketch(cms_eps, cms_delta),
                    HyperLogLog(hll_precision),
                ]
            )
        ),
        lambda sk, b: sk.add_flat(_col_flat_tokens(b, col)),
    )


def theta_over_strings(col: str, k: int | None = None) -> SketchSpec:
    """KMV/theta distinct sketch over a string column — the sibling to
    use when SET OPERATIONS (intersection/difference/Jaccard) on the
    distinct sets must stay accurate (functions/theta.py)."""
    from presto_bloomfilter_spark.functions.theta import ThetaSketch

    kk = k or ThetaSketch.DEFAULT_K
    return SketchSpec(
        (col,),
        lambda: ThetaSketch(kk),
        lambda sk, b: sk.add_strings(_col_strings(b, col)),
    )


def theta_over_tokens(col: str = "tokens", k: int | None = None) -> SketchSpec:
    from presto_bloomfilter_spark.functions.theta import ThetaSketch

    kk = k or ThetaSketch.DEFAULT_K
    return SketchSpec(
        (col,),
        lambda: TokenDedupAccumulator(ThetaSketch(kk), weighted=False),
        lambda sk, b: sk.add_flat(_col_flat_tokens(b, col)),
    )


def kll_over_column(col: str, k: int = KLLSketch.DEFAULT_K) -> SketchSpec:
    return SketchSpec(
        (col,),
        lambda: KLLSketch(k),
        lambda sk, b: sk.add(_col_floats(b, col)),
    )


def tdigest_over_column(col: str, compression: int = TDigest.DEFAULT_COMPRESSION) -> SketchSpec:
    """t-digest quantiles — tail-accurate sibling of kll_over_column
    (north_rule lists both); same build/merge dataflow."""
    return SketchSpec(
        (col,),
        lambda: TDigest(compression),
        lambda sk, b: sk.add(_col_floats(b, col)),
    )


def moments_over_column(col: str, lo: float, hi: float,
                        k: int = 12, clamp: bool = False,
                        log: bool = False) -> SketchSpec:
    """Moments-sketch quantiles (Gan et al. VLDB 2018) — the
    HIGH-CARDINALITY grouped sibling of kll/tdigest_over_column:
    ~(k+3)·8 bytes of state per key and a pure vector-add merge, so a
    per-key quantile table over millions of keys stays tiny where a
    KLL per key would not.  ``(lo, hi)`` is the declared value range
    (geometry, like bloom's n/p); ``log=True`` accumulates ln-moments
    for long-tailed data.  No worst-case rank bound — that is the
    published trade; use KLL when you need the guarantee."""
    from presto_bloomfilter_spark.functions.moments import MomentsSketch

    return SketchSpec(
        (col,),
        lambda: MomentsSketch(lo, hi, k, clamp=clamp, log=log),
        lambda sk, b: sk.add(_col_floats(b, col)),
    )


def ddsketch_over_column(col: str, alpha: float = 0.01,
                         max_bins: int = 2048) -> SketchSpec:
    """DDSketch quantiles (Masson et al. VLDB 2019) — the RELATIVE-error
    sibling of kll/tdigest_over_column: every estimate of a positive
    quantile is within ``alpha`` relative error, and the merge is
    LOSSLESS bucket-count addition, so estimates are byte-identical
    under any merge tree / task-retry order — the strongest
    merge-associativity member of the quantile family."""
    from presto_bloomfilter_spark.functions.ddsketch import DDSketch

    return SketchSpec(
        (col,),
        lambda: DDSketch(alpha, max_bins),
        lambda sk, b: sk.add(_col_floats(b, col)),
    )


def mg_over_strings(col: str, k: int = 4096) -> SketchSpec:
    """Misra-Gries frequent-items summary over a string column
    (functions/mg.py) — the DETERMINISTIC heavy-hitter sibling of
    cms_over_strings: at most k exact (item, count) pairs, undercount
    <= n/(k+1), PODS'12 mergeable trim.  Every item with true count
    above n/(k+1) is guaranteed present, which is the candidate-
    generation contract for two-phase exact top-k."""
    from presto_bloomfilter_spark.functions.mg import MisraGries

    return SketchSpec(
        (col,),
        lambda: MisraGries(k),
        lambda sk, b: sk.add_strings(_col_strings(b, col)),
    )


def mg_over_tokens(col: str = "tokens", k: int = 4096) -> SketchSpec:
    """Misra-Gries over a flattened array<int> token column — all
    occurrences, like cms_over_tokens."""
    from presto_bloomfilter_spark.functions.mg import MisraGries

    return SketchSpec(
        (col,),
        lambda: MisraGries(k),
        lambda sk, b: sk.add_ints(_col_flat_tokens(b, col)),
    )


# ---- ungrouped aggregation (two-level tree merge) ----------------------------


class BuildMetrics:
    """Sketch-build/merge counters over Spark accumulators (north_rule:
    'sketch-merge metrics').  Executor-side updates flow back through the
    task-completion protocol; read the properties after the job."""

    def __init__(self, spark):
        sc = spark.sparkContext
        self._rows = sc.accumulator(0)
        self._batches = sc.accumulator(0)
        self._partials = sc.accumulator(0)
        self._merges = sc.accumulator(0)

    def as_dict(self) -> dict:
        return {
            "rows": self._rows.value,
            "batches": self._batches.value,
            "partial_sketches": self._partials.value,
            "merges": self._merges.value,
        }


def _partial_build(spec: SketchSpec, metrics: BuildMetrics | None = None):
    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        sk = spec.factory()
        for b in batches:
            if b.num_rows:
                spec.update(sk, b)
                if metrics is not None:
                    metrics._rows.add(b.num_rows)
                    metrics._batches.add(1)
        if metrics is not None:
            metrics._partials.add(1)
        yield pa.RecordBatch.from_arrays([pa.array([sk.to_bytes()], pa.binary())], ["sketch"])

    return fn


def _make_merge_blobs(metrics: BuildMetrics | None = None):
    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        sk = None
        for b in batches:
            for buf in b.column(0):
                other = sketch_from_bytes(buf.as_py())
                if sk is None:
                    sk = other
                else:
                    sk = sk.merge(other)
                    if metrics is not None:
                        metrics._merges.add(1)
        if sk is not None:
            yield pa.RecordBatch.from_arrays([pa.array([sk.to_bytes()], pa.binary())], ["sketch"])

    return fn


_merge_blobs = _make_merge_blobs()


def aggregate_sketch(
    df: DataFrame,
    spec: SketchSpec,
    fan_in: int = DEFAULT_FAN_IN,
    target_partials: int | None = None,
    metrics: BuildMetrics | None = None,
):
    """Build one sketch over the whole DataFrame; returns the sketch object.

    Column pruning: only spec.columns are read, so the parquet scan
    prunes everything else.  ``target_partials`` coalesces (no shuffle)
    the scan to that many tasks first — it defaults to the session's
    defaultParallelism (the cluster's core count) so each worker builds
    exactly one partial: partial count (and so merge fan-in and blob
    shuffle volume) tracks cluster size, not input split count, and the
    driver never touches ``rdd.getNumPartitions()`` (which builds the
    DAG driver-side, ~100s of ms per call).  Pass ``target_partials=0``
    to keep the input partitioning as-is.
    """
    if target_partials is None:
        target_partials = df.sparkSession.sparkContext.defaultParallelism
    pruned = df.select(*spec.columns)
    if target_partials:
        pruned = pruned.coalesce(target_partials)
    with _tuned_arrow_batches(df):
        partials = pruned.mapInArrow(_partial_build(spec, metrics), "sketch binary")
        # coalesce never INCREASES partition count, so n_parts may
        # overstate the real partial count for narrow inputs; the cost
        # is at most log_fan_in(target) extra repartition rounds over a
        # handful of sketch blobs (milliseconds) — cheaper than the
        # driver-side DAG build getNumPartitions() would need to know
        # the true count
        n_parts = target_partials or pruned.rdd.getNumPartitions()
        return _tree_merge_collect(partials, n_parts, fan_in, spec, metrics)


def _tree_merge_collect(
    partials: DataFrame,
    n_parts: int,
    fan_in: int,
    spec: SketchSpec | None = None,
    metrics: BuildMetrics | None = None,
):
    """Tree merge of a blob DataFrame down to one sketch.

    Each level's tasks merge ~fan_in blobs, so no task (and finally no
    driver) ever holds more than fan_in sketches — at 8000 partials and
    fan_in=16 that is 500 → 32 → 2 tasks, then the driver merges ≤
    fan_in blobs (north_rule: treeAggregate-style merges, no driver
    hotspot).
    """
    merge_fn = _make_merge_blobs(metrics) if metrics is not None else _merge_blobs
    while n_parts > fan_in:
        n_parts = -(-n_parts // fan_in)
        partials = partials.repartition(n_parts).mapInArrow(merge_fn, "sketch binary")
    blobs = [r.sketch for r in partials.collect()]
    if not blobs:
        if spec is None:
            raise ValueError("no sketches to merge")
        return _unwrap(spec.factory())
    # deserialize in a thread pool: zlib.decompress and the numpy buffer
    # copies release the GIL, and per-blob decode (~13 ms for a
    # compressed multi-sketch) dominates the driver tail — the merges
    # themselves are sub-ms vector ops (SCALING_PROFILE.md)
    if len(blobs) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(min(8, len(blobs))) as ex:
            sketches = list(ex.map(sketch_from_bytes, blobs))
    else:
        sketches = [sketch_from_bytes(blobs[0])]
    out = sketches[0]
    for x in sketches[1:]:
        out = out.merge(x)
        if metrics is not None:
            metrics._merges.add(1)
    return out


def aggregate_sketch_from_parquet(
    spark,
    path: str,
    spec: SketchSpec,
    n_tasks: int | None = None,
    fan_in: int = DEFAULT_FAN_IN,
    metrics: BuildMetrics | None = None,
):
    """Fused columnar scan + partial sketch build over a parquet file.

    The DataFrame path (``aggregate_sketch``) routes every token through
    the JVM: parquet scan → InternalRow → Arrow serialization → socket →
    Python.  For a sketch build that data movement *is* the job cost —
    the sketch kernels are ~10x cheaper than the transport.  This
    operator keeps Spark as the scheduler/merger but moves the scan into
    the Python worker: the driver lists row groups, Spark schedules one
    task per shard (``spark.range(0, n, 1, n)`` → one shard id per
    partition), and each task reads its row groups directly with
    pyarrow, updates its partial sketch, and emits one blob.  Raw tokens
    never cross a process boundary.

    On a real cluster the same pattern holds with object-store paths
    (pyarrow reads s3://… natively); shards are strided over row groups
    so file-position skew balances out.  This mirrors how Spark itself
    splits parquet scans — we only relocate the decode to the process
    that consumes the bytes.
    """
    import pyarrow.parquet as pq

    meta = pq.ParquetFile(path).metadata
    n_rg = meta.num_row_groups
    if n_tasks is None:
        n_tasks = spark.sparkContext.defaultParallelism
    n_tasks = max(1, min(n_tasks, n_rg))
    cols = list(spec.columns)

    def build_shard(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        sk = spec.factory()
        pf = pq.ParquetFile(path)
        for b in batches:
            for sid in b.column(0).to_pylist():
                for rg in range(sid, n_rg, n_tasks):
                    tbl = pf.read_row_group(rg, columns=cols)
                    for rb in tbl.to_batches():
                        spec.update(sk, rb)
                        if metrics is not None:
                            metrics._rows.add(rb.num_rows)
                            metrics._batches.add(1)
        if metrics is not None:
            metrics._partials.add(1)
        yield pa.RecordBatch.from_arrays([pa.array([sk.to_bytes()], pa.binary())], ["sketch"])

    shards = spark.range(0, n_tasks, 1, n_tasks)
    partials = shards.mapInArrow(build_shard, "sketch binary")
    return _tree_merge_collect(partials, n_tasks, fan_in, spec, metrics)


def grouped_sketch_from_parquet(
    spark,
    path: str,
    key: str,
    spec: SketchSpec,
    n_tasks: int | None = None,
) -> DataFrame:
    """Grouped fused build: per-(shard, key) partials from a direct
    pyarrow row-group scan, then a blob-only grouped merge.

    The grouped analogue of ``aggregate_sketch_from_parquet``: raw rows
    never cross a process boundary and never shuffle — only
    ``shards x keys`` sketch blobs do.  Skew-proof for the same reason
    as the map_side strategy: a task only sees its own shard's share of
    a hot key.  Returns DataFrame[key string, sketch binary].
    """
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    meta = pf.metadata
    # key labels come from Python str() in the fused kernel; str() and
    # Spark's cast-to-string agree for string/int keys but NOT for
    # double ('1e-07' vs '1.0E-7') or boolean ('True' vs 'true') — so
    # restrict this dataflow to the types whose labels are identical to
    # grouped_sketch's, instead of silently diverging
    ktype = pf.schema_arrow.field(key).type
    if not (pa.types.is_string(ktype) or pa.types.is_large_string(ktype)
            or pa.types.is_integer(ktype)):
        raise ValueError(
            f"grouped_sketch_from_parquet: key {key!r} has type {ktype} — "
            f"str() labels would diverge from grouped_sketch's JVM "
            f"cast-to-string; pre-cast the key to string (or use "
            f"grouped_sketch)")
    n_rg = meta.num_row_groups
    if n_tasks is None:
        n_tasks = spark.sparkContext.defaultParallelism
    n_tasks = max(1, min(n_tasks, n_rg))
    cols = list(dict.fromkeys([key, *spec.columns]))
    grouped_body = _grouped_partial_build(spec, key)

    def build_shard(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        def shard_batches() -> Iterator[pa.RecordBatch]:
            pf = pq.ParquetFile(path)
            for b in batches:
                for sid in b.column(0).to_pylist():
                    for rg in range(sid, n_rg, n_tasks):
                        yield from pf.read_row_group(rg, columns=cols).to_batches()

        yield from grouped_body(shard_batches())

    shards = spark.range(0, n_tasks, 1, n_tasks)
    partials = shards.mapInArrow(build_shard, f"{key} string, sketch binary")
    return grouped_merge_sketch_column(partials, key)


def merge_sketch_column(df: DataFrame, col: str = "sketch", fan_in: int = DEFAULT_FAN_IN,
                        target_partials: int | None = None):
    """Aggregate *pre-built* sketches stored in a binary column — parity
    with the reference's bloom_filter_from_string / bloom_filter(bf)
    merge aggregation (BloomFilterFromString.java:23-38).

    Same tree-merge dataflow as aggregate_sketch: partial count pinned
    to defaultParallelism by default (coalesce, no shuffle, no
    driver-side getNumPartitions), bounded fan-in above it.
    """
    if target_partials is None:
        target_partials = df.sparkSession.sparkContext.defaultParallelism
    pruned = df.select(F.col(col).alias("sketch"))
    if target_partials:
        pruned = pruned.coalesce(target_partials)
    partials = pruned.mapInArrow(_merge_blobs, "sketch binary")
    n_parts = target_partials or pruned.rdd.getNumPartitions()
    # shared tree-merge tail (bounded fan-in, threaded blob decode);
    # raises the same ValueError on empty input
    return _tree_merge_collect(partials, n_parts, fan_in)


# ---- heavy hitters (two-phase top-k) ------------------------------------------


class TopKNotCertified(RuntimeError):
    """top_k_tokens(certify=True): the coverage bound cannot prove the
    returned rows are the exact top-k (a non-candidate item could be
    heavier than the k-th candidate)."""


def top_k_tokens(
    df: DataFrame,
    col: str = "tokens",
    k: int = 20,
    m_per_partition: int | None = None,
    certify: bool = False,
) -> DataFrame:
    """Top-k most frequent token ids WITHOUT a full explode+groupBy
    shuffle: the two-phase heavy-hitters plan.

    Phase 1 (map-only): each partition counts its own tokens exactly
    (the same cache-resident bincount the sketch builds use) and emits
    only its local top-M (id, count) rows — O(partitions * M) rows
    total instead of one shuffled row per token occurrence — plus ONE
    threshold row per partition: the smallest emitted local count
    (0 when the partition had ≤ M distinct ids, i.e. everything was
    emitted).  Any id NOT in partition i's local top has local count
    ≤ threshold_i, so sum_i(threshold_i) is a hard upper bound on the
    global count of ANY non-candidate.
    Phase 2: the candidate union is counted exactly with a hash
    aggregate restricted to candidate ids (Catalyst's map-side partial
    aggregation makes the shuffle O(partitions * candidates)), then
    ranked.

    Coverage: WITHOUT ``certify`` this is heuristic (a true top-k item
    locally out-ranked by M heavier ids in every partition would be
    missed) — treat the default as approximate-with-high-probability;
    the gate query additionally verifies against the exact answer.
    WITH ``certify=True`` the standard bound is checked in-band: the
    result is certified exact iff the k-th candidate's exact count
    strictly exceeds sum_i(threshold_i); otherwise
    :class:`TopKNotCertified` is raised with both numbers so the
    caller can retry with a larger ``m_per_partition`` (the eager
    check costs the two phase actions the caller was about to run
    anyway plus one tiny threshold sum).
    Output: (token int, cnt long) for the deterministic top-k
    (count desc, token asc).
    """
    m = m_per_partition or 8 * k

    def local_top(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        acc = TokenDedupAccumulator(_CandidateSink(), weighted=True)
        for b in batches:
            if b.num_rows:
                acc.add_flat(_col_flat_tokens(b, col))
        sink = acc.finish()
        ids, counts = sink.top(m)
        thr = int(min(counts)) if len(sink._ids) > m else 0
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(ids + [-1], pa.int64()),
                pa.array(counts + [thr], pa.int64()),
                pa.array([False] * len(ids) + [True], pa.bool_()),
            ],
            ["token", "cnt", "is_thr"],
        )

    phase1 = df.select(col).mapInArrow(local_top, "token long, cnt long, is_thr boolean")
    if certify:
        # persist the (partitions x M)-row phase-1 output: the
        # certificate's threshold bound must come from the SAME
        # evaluation that produced the candidate set (a recompute over
        # non-deterministic partitioning could certify against
        # thresholds that never bounded the actual run), and without
        # the cache the bound query re-runs the whole corpus scan
        phase1 = phase1.persist()
    candidates = (
        phase1.filter(~F.col("is_thr"))
        .groupBy("token")
        .agg(F.sum("cnt").alias("cnt_lb"))  # lower bound: only local-top rows
    )
    # phase 2: exact counts restricted to the candidate set — the
    # explode stays map-side (filter before shuffle), the hash agg
    # shuffles only (partitions x candidates) partial rows
    cand_ids = candidates.select("token")
    exploded = df.select(F.explode(col).alias("token")).join(
        F.broadcast(cand_ids), "token"
    )
    exact = exploded.groupBy("token").agg(F.count("*").alias("cnt"))
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("cnt"), F.asc("token"))
    result = (
        exact.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(F.col("token").cast("int").alias("token"), "cnt")
    )
    if not certify:
        return result
    try:
        rows = result.collect()  # materializes phase1 into the cache
        kth = min((r.cnt for r in rows), default=0)
        # reads the CACHED phase-1 rows: one tiny threshold sum, no
        # second corpus scan, same evaluation as the candidates
        bound = phase1.filter(F.col("is_thr")).agg(F.sum("cnt")).collect()[0][0] or 0
    finally:
        phase1.unpersist()
    # bound == 0 means NO partition truncated its local map (every
    # M-th local count was 0): the candidate set provably covers every
    # token in the corpus, so the ranking is exact even when fewer
    # than k distinct tokens exist — len(rows) < k is then just "the
    # corpus has < k tokens", not a coverage miss
    if (kth > bound) and (len(rows) == k or bound == 0):
        spark = df.sparkSession
        return spark.createDataFrame(rows, result.schema)
    if bound == 0 and not rows:
        # empty corpus: exact (and empty) by the same argument
        return result
    raise TopKNotCertified(
        f"cannot certify top-{k}: k-th candidate count {kth} does not "
        f"strictly exceed the non-candidate bound {bound} "
        f"(sum of per-partition M-th local counts, M={m}); retry with a "
        f"larger m_per_partition"
    )


def mg_top_k(
    df: DataFrame,
    col: str,
    k: int = 20,
    k_counters: int = 4096,
    certify: bool = True,
) -> DataFrame:
    """Exact top-k over a string column via a Misra-Gries candidate
    sketch + certified re-count — the SKETCH-state sibling of
    :func:`top_k_tokens` (which keeps exact per-partition count maps):

    Phase 1 (map-only): ONE tree-merged :class:`MisraGries` summary of
    at most ``k_counters`` (item, count) pairs over the whole column —
    per-partition state is O(k_counters) regardless of local distinct
    counts, which is the advantage over the local-top-M plan when
    partitions are distinct-heavy.  The PODS'12 merge bound guarantees
    any item NOT retained has true count <= summary.error_bound()
    <= n/(k_counters+1).
    Phase 2: exact hash-agg restricted to the <= k_counters candidates
    (broadcast semi-join BEFORE the shuffle, so the agg shuffles only
    partitions x candidates partial rows), ranked (count desc, item
    asc).

    ``certify=True`` (default): raise :class:`TopKNotCertified` unless
    the k-th candidate's exact count strictly exceeds error_bound() —
    when it does, no non-candidate can displace the returned rows, so
    the answer is provably exact.  error_bound()==0 means nothing was
    ever trimmed: the summary is a complete exact count table and the
    result is exact even when fewer than k items exist.

    Output: (item string, cnt long).
    """
    from presto_bloomfilter_spark.functions.mg import MisraGries  # noqa: F401

    spark = df.sparkSession
    summary = aggregate_sketch(df.select(col), mg_over_strings(col, k_counters))
    bound = summary.error_bound()
    cands = [item for item, _ in summary.topk(k_counters)]
    if not cands:
        return spark.createDataFrame([], "item string, cnt long")
    cand_df = spark.createDataFrame([(c,) for c in cands], "item string")
    exact = (
        df.select(F.col(col).alias("item"))
        .join(F.broadcast(cand_df), "item")
        .groupBy("item")
        .agg(F.count("*").alias("cnt"))
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("cnt"), F.asc("item"))
    result = (
        exact.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("item", "cnt")
    )
    if not certify:
        return result
    rows = result.collect()
    kth = min((r.cnt for r in rows), default=0)
    if (bound == 0) or (kth > bound and len(rows) == k):
        return spark.createDataFrame(rows, result.schema)
    raise TopKNotCertified(
        f"cannot certify top-{k}: k-th candidate count {kth} does not "
        f"strictly exceed the Misra-Gries undercount bound {bound} "
        f"(n={summary.n}, k_counters={k_counters}); retry with a larger "
        f"k_counters"
    )


class _CandidateSink:
    """Accumulator target for top_k_tokens phase 1: keeps exact
    (id, count) pairs fed by TokenDedupAccumulator's weighted flush."""

    def __init__(self):
        import numpy as _np

        self._ids = _np.empty(0, dtype=_np.int64)
        self._counts = _np.empty(0, dtype=_np.int64)

    def add_ints(self, values, counts=None):
        import numpy as _np

        v = _np.asarray(values, dtype=_np.int64)
        c = (
            _np.asarray(counts, dtype=_np.int64)
            if counts is not None
            else _np.ones(len(v), dtype=_np.int64)
        )
        # fold into the running exact map (ids are unique per flush;
        # across flushes, merge by sort)
        ids = _np.concatenate([self._ids, v])
        cnt = _np.concatenate([self._counts, c])
        order = _np.argsort(ids, kind="stable")
        ids, cnt = ids[order], cnt[order]
        if len(ids):
            first = _np.concatenate(([True], ids[1:] != ids[:-1]))
            grp = _np.cumsum(first) - 1
            uids = ids[first]
            sums = _np.zeros(len(uids), dtype=_np.int64)
            _np.add.at(sums, grp, cnt)
            self._ids, self._counts = uids, sums
        return self

    def top(self, m: int):
        import numpy as _np

        if len(self._ids) <= m:
            return self._ids.tolist(), self._counts.tolist()
        sel = _np.argpartition(-self._counts, m - 1)[:m]
        return self._ids[sel].tolist(), self._counts[sel].tolist()


# ---- grouped aggregation (salted two-level) ----------------------------------


def _grouped_partial_build(spec: SketchSpec, key: str):
    """mapInArrow body: one partial sketch per (input partition, key).

    Arrow-level group split (np.unique on the key column + RecordBatch
    .filter) — raw rows never shuffle, and token list columns never pass
    through pandas object arrays.
    """

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow.compute as pc

        _NULL_GROUP = object()  # dict key for the NULL group
        sketches: dict = {}
        for b in batches:
            if not b.num_rows:
                continue
            kcol = b.column(b.schema.get_field_index(key))
            if isinstance(kcol, pa.ChunkedArray):
                kcol = kcol.combine_chunks()
            if kcol.null_count:
                # split the NULL-group rows off at the Arrow level:
                # np.unique cannot sort None against str (TypeError),
                # and a numeric key column with nulls would float to
                # NaN — dropping nulls BEFORE to_numpy also keeps int
                # keys exactly int64
                null_mask = pc.is_null(kcol)
                sub_null = b.filter(null_mask)
                sk = sketches.get(_NULL_GROUP)
                if sk is None:
                    sk = sketches[_NULL_GROUP] = spec.factory()
                spec.update(sk, sub_null)
                b = b.filter(pc.invert(null_mask))
                if not b.num_rows:
                    continue
                kcol = b.column(b.schema.get_field_index(key))
            keys = kcol.to_numpy(zero_copy_only=False)
            uniq, inv = np.unique(keys, return_inverse=True)
            if len(uniq) == 1:
                sk = sketches.get(uniq[0])
                if sk is None:
                    sk = sketches[uniq[0]] = spec.factory()
                spec.update(sk, b)
                continue
            for i, kv in enumerate(uniq):
                sub = b.filter(pa.array(inv == i))
                sk = sketches.get(kv)
                if sk is None:
                    sk = sketches[kv] = spec.factory()
                spec.update(sk, sub)
        if sketches:
            ks = list(sketches)
            yield pa.RecordBatch.from_arrays(
                [pa.array([None if k is _NULL_GROUP else str(k) for k in ks],
                          pa.string()),
                 pa.array([sketches[k].to_bytes() for k in ks], pa.binary())],
                [key, "sketch"],
            )

    return fn


def grouped_sketch(
    df: DataFrame,
    key: str,
    spec: SketchSpec,
    salt: int | None = None,
    salt_col: str | None = None,
    strategy: str = "map_side",
) -> DataFrame:
    """Per-key sketches: returns DataFrame[key string, sketch binary].

    ``map_side`` (default): partial sketch per (partition, key) inside
    mapInArrow, then a tiny grouped blob merge — the partial/combine
    protocol of the reference's grouped accumulator (reference
    BloomFilterStateFactory.java:48-91) in Spark dataflow.  Only sketch
    blobs shuffle (partitions x keys x sketch_size bytes, independent of
    row count), and skewed keys cost nothing extra: a task only ever
    sees its own partition's share of a hot key.  Right choice for
    low-cardinality keys like ``source``.

    ``salted``: groups raw rows by (key, salt) with applyInPandas, then
    merges the S partials per key — the explicit repartition/salting
    dataflow (north_rule).  Use for high-cardinality keys where
    per-partition x per-key partials would blow up the map side.
    """
    tune_arrow_batches(df)
    cols = [key, *spec.columns]
    pruned = df.select(*dict.fromkeys(cols))
    out_schema = f"{key} string, sketch binary"

    # the output schema is '{key} string': normalize non-string group
    # keys through ONE stringification — Spark's cast-to-string — for
    # BOTH strategies, so a double/boolean key yields the same label
    # ('1.0E-7', 'true') whichever dataflow built it; NULL keys flow
    # through as NULL either way
    pruned = pruned.withColumn(key, F.col(key).cast("string"))

    if strategy == "map_side":
        partials = pruned.mapInArrow(_grouped_partial_build(spec, key), out_schema)
        return grouped_merge_sketch_column(partials, key)

    if strategy != "salted":
        raise ValueError(f"unknown strategy {strategy!r}")

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        sk = spec.factory()
        if len(pdf):
            spec.update(sk, pa.RecordBatch.from_pandas(pdf[list(spec.columns)], preserve_index=False))
        return pd.DataFrame({key: [pdf[key].iloc[0]], "sketch": [sk.to_bytes()]})

    if not salt:
        return pruned.groupBy(key).applyInPandas(build, out_schema)

    sc = salt_col or key
    salted = pruned.withColumn("__salt", F.pmod(F.xxhash64(F.col(sc), F.monotonically_increasing_id()), F.lit(salt)))

    def build_salted(pdf: pd.DataFrame) -> pd.DataFrame:
        return build(pdf.drop(columns="__salt"))

    partials = salted.groupBy(key, "__salt").applyInPandas(build_salted, out_schema)

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        sk = reduce(lambda a, b: a.merge(b), (sketch_from_bytes(x) for x in pdf["sketch"]))
        return pd.DataFrame({key: [pdf[key].iloc[0]], "sketch": [sk.to_bytes()]})

    return partials.groupBy(key).applyInPandas(merge_group, out_schema)


def sketch_estimates(df: DataFrame, col: str = "sketch",
                     out_col: str = "estimate") -> DataFrame:
    """Decode a sketch column to its scalar ``estimate()`` executor-side
    — DataFrame in, DataFrame out, blobs never visit the driver (the
    missing last step that otherwise tempts a collect+deserialize loop
    over a sketch table).  All other columns pass through unchanged;
    every sketch family defines estimate() (HLL/theta distinct count,
    bloom fill-derived insertions, CMS total weight, KLL/t-digest n)."""
    fields = [f"{f.name} {f.dataType.simpleString()}"
              for f in df.schema.fields if f.name != col]
    if len(fields) == len(df.schema.fields):
        raise ValueError(f"no column {col!r} in {df.columns}")
    if out_col in df.columns and out_col != col:
        raise ValueError(
            f"output column {out_col!r} already exists in {df.columns}; "
            "pass a different out_col")
    out_schema = ", ".join([*fields, f"{out_col} double"])

    def decode(it):
        for pdf in it:
            pdf = pdf.copy()
            pdf[out_col] = [float(sketch_from_bytes(b).estimate()) for b in pdf[col]]
            yield pdf.drop(columns=[col])

    return df.mapInPandas(decode, out_schema)


def grouped_merge_sketch_column(df: DataFrame, key: str, col: str = "sketch") -> DataFrame:
    """Grouped merge of pre-built sketches → DataFrame[key, sketch].
    The key keeps its input type (an int key stays int)."""

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        sk = reduce(lambda a, b: a.merge(b), (sketch_from_bytes(x) for x in pdf[col]))
        return pd.DataFrame({key: [pdf[key].iloc[0]], "sketch": [sk.to_bytes()]})

    key_type = df.schema[key].dataType.simpleString()
    return df.select(key, col).groupBy(key).applyInPandas(
        merge_group, f"{key} {key_type}, sketch binary")
