"""Bounded-state streaming deduplication backed by the bloom filter.

Structured Streaming's own ``dropDuplicates`` keeps every seen key in
the state store — unbounded growth on an unbounded stream unless a
watermark can age keys out, and training-data dedup has no natural
event-time horizon.  The sketch-engine alternative: keep ONE bloom
filter (m bits, fixed) as the seen-set.  Per micro-batch:

1. digest each doc (md5 of content, JVM-side);
2. dedupe within the batch (first id per digest wins — deterministic);
3. probe the persisted filter: digests that probe TRUE are dropped as
   probably-seen; the rest are emitted and inserted into the filter;
4. write a tiny per-epoch marker (pruned after keep_markers epochs) —
   a re-delivered epoch is detected and skipped, and the per-epoch
   sink directory is written with overwrite, so redelivery is
   idempotent end to end.

Semantics: NO duplicate ever survives (bloom has no false negatives —
a seen digest always probes true); a bounded fraction of UNIQUE docs
(≤ fpp at capacity) is wrongly dropped.  That asymmetry is the right
trade for training pipelines: losing 0.1% of unique docs is cheap,
emitting dup clusters is not.  State is m bits forever, independent of
stream length.

At 100 TB the same dataflow shards the digest space: route digests to
S independent filters by prefix (groupBy shard → per-shard filter in
the store) so no single filter exceeds memory; the single-filter form
below is the S=1 case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from presto_bloomfilter_spark.functions.bloom import BloomFilter
from presto_bloomfilter_spark.operators.probe import contains_udf
from presto_bloomfilter_spark.store import SketchStore


class StreamingBloomDedup:
    """foreachBatch body: bounded-state streaming exact-dedup (bloom
    seen-set; no false survivors, ≤ fpp unique-doc loss)."""

    def __init__(self, store: SketchStore, job_id: str, sink_path: str,
                 expected_insertions: int = 10_000_000,
                 fpp: float = BloomFilter.DEFAULT_FPP,
                 text_col: str = "text", id_col: str = "doc_id"):
        self.store = store
        self.job_id = job_id
        self.sink_path = sink_path
        self.n = expected_insertions
        self.p = fpp
        self.text_col = text_col
        self.id_col = id_col
        self.current_key = f"{job_id}.seen"
        self.keep_markers = 64  # epoch markers retained for redelivery checks

    def _epoch_key(self, epoch_id: int) -> str:
        return f"{self.job_id}.seen.epoch{epoch_id}"

    def _mark_epoch(self, epoch_id: int) -> None:
        """Write a TINY idempotency marker (a 1-capacity bloom, a few
        bytes) — only existence is ever checked, so persisting the full
        seen-filter per epoch would grow the store without bound for no
        benefit.  Markers older than ``keep_markers`` epochs are pruned;
        Spark's checkpoint never re-delivers epochs that far back."""
        self.store.put(self._epoch_key(epoch_id), BloomFilter(1, 0.5))
        prefix = f"{self.job_id}.seen.epoch"
        stale = sorted(
            (int(k[len(prefix):]) for k in self.store.keys()
             if k.startswith(prefix) and k[len(prefix):].isdigit()),
        )[: -self.keep_markers]
        for e in stale:
            self.store.delete(f"{prefix}{e}")

    def _load_seen(self) -> BloomFilter:
        if self.store.exists(self.current_key):
            return self.store.get(self.current_key)
        return BloomFilter(self.n, self.p)

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> int:
        """Returns the number of rows emitted for this batch."""
        spark = batch_df.sparkSession
        if self.store.exists(self._epoch_key(epoch_id)):
            # re-delivered epoch: filter state already reflects it; the
            # sink write below was epoch-keyed too, so nothing to do
            return 0
        digested = batch_df.withColumn("__digest", F.md5(F.col(self.text_col)))
        w = Window.partitionBy("__digest").orderBy(F.col(self.id_col))
        in_batch_first = (
            digested.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        seen = self._load_seen()
        fresh = in_batch_first.filter(
            ~contains_udf(spark, seen)(F.col("__digest"))
        ).cache()
        emitted = fresh.count()
        if emitted:
            # overwrite the per-epoch dir, not append: a retry after a
            # completed sink write but before the filter persisted
            # re-emits the same rows — overwrite makes that idempotent
            # (exactly-once sink content per epoch)
            fresh.drop("__digest").write.mode("overwrite").parquet(
                f"{self.sink_path}/epoch={epoch_id}"
            )
            new_digests = [r[0] for r in fresh.select("__digest").collect()] \
                if emitted <= 100_000 else None
            if new_digests is not None:
                seen.add_strings(new_digests)
            else:
                # large batch: build the digest bloom distributed, then
                # union into the seen-set (identical geometry)
                from presto_bloomfilter_spark.operators.aggregate import (
                    aggregate_sketch,
                    bloom_over_strings,
                )

                part = aggregate_sketch(
                    fresh.select("__digest"), bloom_over_strings("__digest", self.n, self.p)
                )
                seen.merge(part)
        fresh.unpersist()
        self.store.put(self.current_key, seen)
        self._mark_epoch(epoch_id)
        return emitted

    def attach(self, stream_df: DataFrame, checkpoint: str):
        """Wire onto a streaming DataFrame: returns the StreamingQuery."""
        return (
            stream_df.writeStream.foreachBatch(
                lambda df, eid: self.process_batch(df, eid)
            )
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
