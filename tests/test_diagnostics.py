"""Key-skew diagnostics: exact statistics on constructed counts, NULL
handling, eager cache-clean contract."""

import math

import pytest

from presto_bloomfilter_spark.operators import diagnostics


def _mk(spark, counts):
    rows = [(k,) for k, c in counts.items() for _ in range(c)]
    return spark.createDataFrame(rows, "k string")


def test_key_skew_exact_statistics(spark):
    df = _mk(spark, {"a": 5, "b": 3, "c": 1, "d": 1})
    out = diagnostics.key_skew(df, "k", k=2).collect()
    assert [(r.rank, r.key, r.cnt) for r in out] == [(1, "a", 5), (2, "b", 3)]
    r = out[0]
    assert r.n_rows == 10 and r.n_keys == 4
    assert abs(r.max_share - 0.5) < 1e-12 and abs(r.share - 0.5) < 1e-12
    # histogram quantiles: cum over cnt=1(2 keys),3(3),5(4)
    assert r.p50_cnt == 1 and r.p99_cnt == 5
    mean = 2.5
    assert abs(r.cv - math.sqrt((25 + 9 + 1 + 1) / 4 - mean * mean) / mean) < 1e-12
    assert abs(r.skew_ratio - 2.0) < 1e-12


def test_key_skew_ties_break_by_key_and_nulls_drop(spark):
    df = spark.createDataFrame(
        [("b",), ("a",), (None,), ("a",), ("b",)], "k string")
    out = diagnostics.key_skew(df, "k", k=5).collect()
    assert [(r.rank, r.key) for r in out] == [(1, "a"), (2, "b")]
    assert out[0].n_rows == 4 and out[0].n_keys == 2


def test_key_skew_eager_and_cache_clean(spark):
    df = _mk(spark, {"x": 3, "y": 1})
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    out = diagnostics.key_skew(df, "k", k=1)
    after = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert after == before, "key_skew leaked a persisted RDD"
    assert out.count() == 1  # already materialized, <= k rows


def test_key_skew_validation(spark):
    df = _mk(spark, {"x": 1})
    with pytest.raises(ValueError, match="k must be"):
        diagnostics.key_skew(df, "k", k=0)


def test_corpus_diff_states(spark):
    from presto_bloomfilter_spark.operators.diagnostics import corpus_diff

    old = spark.createDataFrame(
        [("1", "alpha", "s"), ("2", "beta", "s"), ("3", "gamma", "t")],
        "doc_id string, text string, source string")
    new = spark.createDataFrame(
        [("1", "alpha", "s"),        # unchanged
         ("2", "beta v2", "s"),      # changed
         ("4", "delta", "t")],       # added; "3" removed
        "doc_id string, text string, source string")
    out = {r["source"]: r for r in corpus_diff(old, new).collect()}
    assert out["s"]["unchanged"] == 1 and out["s"]["changed"] == 1
    assert out["s"]["added"] == 0 and out["s"]["removed"] == 0
    assert out["t"]["added"] == 1 and out["t"]["removed"] == 1
    assert out["t"]["changed"] == 0 and out["t"]["unchanged"] == 0
