"""Structured Streaming sketch maintenance: availableNow file stream,
idempotent micro-batch folding, replay safety."""

import numpy as np

from presto_bloomfilter_spark.operators import aggregate as agg
from presto_bloomfilter_spark.sources.corpus import generate_tokens_table
from presto_bloomfilter_spark.store import SketchStore
from presto_bloomfilter_spark.streaming.stream_sketch import (
    StreamingSketchSink,
    run_stream_from_files,
)


def _write_batches(tmp_path, n_files=3, docs_per=200):
    import pyarrow.parquet as pq

    d = tmp_path / "stream_in"
    d.mkdir()
    for i in range(n_files):
        tbl = generate_tokens_table(docs_per, seed=1000 + i)
        pq.write_table(tbl, str(d / f"part{i}.parquet"))
    return str(d)


def test_stream_folds_all_files(spark, tmp_path):
    indir = _write_batches(tmp_path)
    store = SketchStore(str(tmp_path / "store"))
    sink = run_stream_from_files(
        spark,
        indir,
        "doc_id string, tokens array<int>, n_tok int, source string",
        agg.hll_over_strings("doc_id"),
        store,
        "stream1",
        str(tmp_path / "ckpt"),
    )
    est = sink.current().estimate()
    # 3 files x 200 docs, doc_ids repeat across files (same generator ids)
    assert abs(est - 200) / 200 <= 0.05


def test_replayed_batch_is_skipped(spark, tmp_path):
    store = SketchStore(str(tmp_path / "store"))
    spec = agg.cms_over_strings("doc_id", eps=0.01)
    sink = StreamingSketchSink(spec, store, "jobR")
    df = spark.createDataFrame([("a",), ("b",)], "doc_id string")
    sink(df, epoch_id=0)
    total_after_first = sink.current().total
    sink(df, epoch_id=0)  # replay of the same epoch
    assert sink.current().total == total_after_first  # not double-counted
    sink(df, epoch_id=1)
    assert sink.current().total == 2 * total_after_first
