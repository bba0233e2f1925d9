"""Incremental sketch maintenance over Structured Streaming.

The reference has NO streaming surface (SURVEY.md §2.3) — this module
exists because the north-star workload (continuously arriving tokenized
training data) needs sketches maintained incrementally.  Design:

- ``foreachBatch`` + the batch aggregation path: each micro-batch
  builds a partial sketch with the same mapInArrow partial/merge
  machinery, then merges it into the persisted sketch in a SketchStore
  (idempotent per batch id → exactly-once effect on the sketch, keyed
  by ``{job}.batch{epoch}``);
- merge is associative/commutative, so out-of-order micro-batches
  cannot corrupt the result — the same property that makes the batch
  tree merge partitioning-invariant.

At scale the same pattern runs on a real stream source (Kafka/files on
object store) with checkpointLocation on durable storage; here tests
drive it with a file source + ``Trigger.AvailableNow``.
"""

from __future__ import annotations

from presto_bloomfilter_spark.operators.aggregate import (
    DEFAULT_FAN_IN,
    SketchSpec,
    _unwrap,
    aggregate_sketch,
)
from presto_bloomfilter_spark.store import SketchStore


class StreamingSketchSink:
    """foreachBatch sink that folds each micro-batch into one sketch."""

    def __init__(self, spec: SketchSpec, store: SketchStore, job_id: str,
                 fan_in: int = DEFAULT_FAN_IN):
        self.spec = spec
        self.store = store
        self.job_id = job_id
        self.fan_in = fan_in

    def _batch_key(self, epoch_id: int) -> str:
        return f"{self.job_id}.batch{epoch_id}"

    def __call__(self, batch_df, epoch_id: int) -> None:
        bkey = self._batch_key(epoch_id)
        if self.store.exists(bkey):
            # replayed micro-batch after failure — already folded in
            return
        partial = aggregate_sketch(batch_df, self.spec, self.fan_in)
        # the per-batch partial (atomic rename) is the ONLY source of
        # truth — one write per batch, so a crash at any point either
        # left no marker (replay recomputes) or a complete one (replay
        # skips); no state can be double-counted even for non-idempotent
        # merges (CMS counts, KLL weights)
        self.store.put(bkey, partial)

    def batch_keys(self) -> list[str]:
        prefix = f"{self.job_id}.batch"
        return [k for k in self.store.keys() if k.startswith(prefix)]

    def current(self):
        """Merge of all folded micro-batch partials."""
        keys = self.batch_keys()
        if not keys:
            return _unwrap(self.spec.factory())
        return self.store.load_merged(keys)


def run_stream_from_files(
    spark,
    input_dir: str,
    schema: str,
    spec: SketchSpec,
    store: SketchStore,
    job_id: str,
    checkpoint_dir: str,
):
    """Fold all currently-available files into the sketch and stop
    (Trigger.AvailableNow); returns the sink for inspection."""
    sink = StreamingSketchSink(spec, store, job_id)
    q = (
        spark.readStream.schema(schema)
        .parquet(input_dir)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sink
