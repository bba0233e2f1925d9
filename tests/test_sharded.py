"""Sharded bloom family: bounded per-shard state, shard-local probes,
no false negatives, exact semi-join parity."""

import pytest

from pyspark.sql import functions as F

from presto_bloomfilter_spark.functions.serialization import sketch_from_bytes
from presto_bloomfilter_spark.operators.sharded import (
    build_sharded_bloom,
    persist_sharded_bloom,
    sharded_bloom_semi_join,
    sharded_contains,
)
from presto_bloomfilter_spark.store import SketchStore


@pytest.fixture(scope="module")
def keys_df(spark):
    return spark.range(0, 5000).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k")
    ).cache()


def test_build_and_probe_no_false_negatives(spark, keys_df, tmp_path):
    store_root = str(tmp_path / "store")
    fam = build_sharded_bloom(keys_df, "k", shards=8,
                              expected_insertions_per_shard=2000, fpp=0.001)
    n = persist_sharded_bloom(fam, SketchStore(store_root), "fam")
    assert n == 8
    # every shard filter is bounded to the per-shard geometry
    for r in fam.collect():
        sk = sketch_from_bytes(bytes(r.sketch))
        assert sk.expected_insertions == 2000
    # every inserted key must probe true (no false negatives)
    hits = sharded_contains(spark, keys_df, "k", store_root, "fam", 8)
    assert hits.count() == 5000
    # disjoint keys mostly miss (FP bounded)
    neg = spark.range(0, 5000).select(F.concat(F.lit("other-"), F.col("id")).alias("k"))
    fp = sharded_contains(spark, neg, "k", store_root, "fam", 8).count()
    assert fp <= 5000 * 0.001 * 10 + 5  # generous margin over per-shard bound


def test_sharded_semi_join_equals_exact(spark, sf_dir, tmp_path):
    from presto_bloomfilter_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    big = orders.filter(F.col("o_totalprice") > 300_000).select("o_orderkey")
    got = sharded_bloom_semi_join(
        spark, lineitem, "l_orderkey", big, "o_orderkey",
        store_root=str(tmp_path / "s2"), shards=4,
        expected_insertions_per_shard=10_000, fpp=0.001,
    )
    exact = lineitem.join(big, lineitem.l_orderkey == big.o_orderkey, "left_semi")
    assert got.count() == exact.count()
    assert got.select(F.sum("l_quantity")).collect()[0][0] == \
        exact.select(F.sum("l_quantity")).collect()[0][0]


def test_shard_function_partitioning_invariance(spark, keys_df, tmp_path):
    """Same family regardless of input partitioning (merge algebra per
    shard) — the property that makes the build restartable."""
    f1 = {r.shard: sketch_from_bytes(bytes(r.sketch)).sha256
          for r in build_sharded_bloom(keys_df, "k", 4, 2000).collect()}
    f2 = {r.shard: sketch_from_bytes(bytes(r.sketch)).sha256
          for r in build_sharded_bloom(keys_df.repartition(13), "k", 4, 2000).collect()}
    assert f1 == f2
