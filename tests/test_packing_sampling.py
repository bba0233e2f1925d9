"""Sequence packing + deterministic sampling operators."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from presto_bloomfilter_spark.operators import packing, sampling


@pytest.fixture(scope="module")
def docs(spark):
    rng = np.random.default_rng(7)
    rows = [
        (f"d{i:04d}", [int(t) for t in rng.integers(1, 1000, rng.integers(1, 90))],
         ["web", "books", "code"][i % 3])
        for i in range(400)
    ]
    return spark.createDataFrame(
        [(i, t, len(t), s) for i, t, s in rows],
        "doc_id string, tokens array<int>, n_tok int, source string",
    ).cache()


# ---- packing -------------------------------------------------------------------


def test_pack_conserves_tokens_and_lengths(docs):
    L = 64
    packed = packing.pack_concat_chunks(docs.repartition(4, "doc_id"), L).collect()
    total_in = docs.agg(F.sum("n_tok")).first()[0]
    assert sum(r.n_tok for r in packed) == total_in
    assert all(len(r.tokens) == r.n_tok for r in packed)
    short = [r for r in packed if r.n_tok < L]
    assert all(r.n_tok == L for r in packed if r not in short)
    assert len(short) <= 4  # at most one remainder per partition
    n_full = sum(1 for r in packed if r.n_tok == L)
    assert total_in // L - 4 <= n_full <= total_in // L


def test_pack_rejects_out_of_int32_token_ids(spark):
    """array<bigint> input with an id past int32 must fail loud — the
    silent astype wrap corrupted packed sequences before."""
    df = spark.createDataFrame(
        [("a", [1, 2, 2**40])], "doc_id string, tokens array<bigint>")
    with pytest.raises(Exception, match="int32 range"):
        packing.pack_concat_chunks(df, 4).collect()
    ok = spark.createDataFrame(
        [("a", [1, 2, 3])], "doc_id string, tokens array<bigint>")
    assert packing.pack_concat_chunks(ok, 2).count() > 0


def test_pack_eos_separators(docs):
    L = 50
    n_docs = docs.count()
    total_in = docs.agg(F.sum("n_tok")).first()[0]
    packed = packing.pack_concat_chunks(docs.repartition(2, "doc_id"), L, eos_id=0)
    got = packed.agg(F.sum("n_tok")).first()[0]
    assert got == total_in + n_docs
    # EOS count is exactly one per doc (no input token is 0 above)
    n_eos = packed.select(
        F.sum(F.size(F.filter("tokens", lambda t: t == 0))).alias("n")).first()[0]
    assert n_eos == n_docs


def test_pack_drop_remainder(docs):
    L = 64
    packed = packing.pack_concat_chunks(
        docs.repartition(4, "doc_id"), L, drop_remainder=True)
    lens = [r.n_tok for r in packed.collect()]
    assert lens and all(x == L for x in lens)


def test_pack_stream_order_preserved_within_partition(spark):
    df = spark.createDataFrame(
        [(1, list(range(0, 7))), (2, list(range(7, 12))), (3, list(range(12, 20)))],
        "doc_id int, tokens array<int>",
    ).coalesce(1).sortWithinPartitions("doc_id")
    out = packing.pack_concat_chunks(df, 6).collect()
    stream = [t for r in out for t in r.tokens]
    assert stream == list(range(20))
    assert [r.n_tok for r in out] == [6, 6, 6, 2]


def test_pack_carry_crosses_arrow_batches(spark):
    df = spark.createDataFrame(
        [(i, [i] * 3) for i in range(500)], "doc_id int, tokens array<int>"
    ).coalesce(1)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "50")
    try:
        out = packing.pack_concat_chunks(df, 7).collect()
    finally:
        spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
    assert sum(r.n_tok for r in out) == 1500
    assert sorted({r.n_tok for r in out} - {7}) in ([], [1500 % 7])


def test_pack_rejects_bad_seq_len(docs):
    with pytest.raises(ValueError, match="seq_len"):
        packing.pack_concat_chunks(docs, 0)


# ---- sampling ------------------------------------------------------------------


def test_mixture_rates_and_nesting(docs):
    small = sampling.sample_mixture(docs, {"web": 10, "books": 50})
    big = sampling.sample_mixture(docs, {"web": 30, "books": 50, "code": 100})
    s_ids = {r.doc_id for r in small.select("doc_id").collect()}
    b_ids = {r.doc_id for r in big.select("doc_id").collect()}
    assert s_ids <= b_ids  # nested under rate increases
    assert not [r for r in small.select("source").distinct().collect()
                if r.source == "code"]  # absent source dropped
    n_code = docs.filter("source = 'code'").count()
    assert big.filter("source = 'code'").count() == n_code  # rate 100 keeps all


def test_mixture_deterministic_across_partitionings(docs):
    a = sampling.sample_mixture(docs.repartition(13), {"web": 25})
    b = sampling.sample_mixture(docs.coalesce(1), {"web": 25})
    assert {r.doc_id for r in a.collect()} == {r.doc_id for r in b.collect()}


def test_mixture_rejects_bad_rate(docs):
    with pytest.raises(ValueError, match="rate"):
        sampling.sample_mixture(docs, {"web": 101})


def test_bottom_k_matches_exact_sort_and_is_mergeable(docs):
    got = sampling.bottom_k_sample(docs, "doc_id", 17)
    ids = {r.doc_id for r in got.collect()}
    exact = [r.doc_id for r in docs.select(
        "doc_id", F.md5("doc_id").alias("pr")).orderBy("pr").limit(17).collect()]
    assert ids == set(exact)
    # merge property: bottom-k of per-half bottom-k's == global bottom-k
    h1 = sampling.bottom_k_sample(docs.filter("source = 'web'"), "doc_id", 17)
    h2 = sampling.bottom_k_sample(docs.filter("source != 'web'"), "doc_id", 17)
    merged = sampling.bottom_k_sample(h1.unionByName(h2), "doc_id", 17)
    assert {r.doc_id for r in merged.collect()} == ids


def test_bottom_k_plan_is_take_ordered(docs):
    plan = sampling.bottom_k_sample(docs, "doc_id", 5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_repetition_metrics_values(spark):
    from presto_bloomfilter_spark.operators import text as T
    df = spark.createDataFrame(
        [("a", "x y x y"), ("b", "p q r s"), ("c", "z z z")],
        "doc_id string, text string",
    )
    got = {r.id: r for r in T.repetition_metrics(df).collect()}
    assert got["a"].n_words == 4 and got["a"].word_rep_frac == 0.5
    # grams of a: "x y","y x","x y" -> 1 dup of 3
    assert abs(got["a"].dup_gram_frac - 1 / 3) < 1e-12
    assert got["b"].word_rep_frac == 0.0 and got["b"].dup_gram_frac == 0.0
    assert got["c"].word_rep_frac == 2 / 3 and got["c"].dup_gram_frac == 0.5


# ---- deterministic shuffle ------------------------------------------------------


def test_deterministic_shuffle_is_permutation(docs):
    from presto_bloomfilter_spark.operators import shuffle

    out = shuffle.deterministic_shuffle(docs, "doc_id", seed=3, buckets=8)
    rows = out.select("doc_id", "shuffle_bucket", "shuffle_pos").collect()
    assert len(rows) == docs.count()
    # positions are dense 1..n within each bucket
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r.shuffle_bucket, []).append(r.shuffle_pos)
    assert set(by_bucket) <= set(range(8))
    for b, ps in by_bucket.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), b


def test_deterministic_shuffle_reproducible_and_seed_sensitive(docs, spark):
    from presto_bloomfilter_spark.operators import shuffle

    def order(seed, df):
        out = shuffle.deterministic_shuffle(df, "doc_id", seed=seed, buckets=8)
        return [r.doc_id for r in
                out.orderBy("shuffle_bucket", "shuffle_pos").collect()]

    # identical across runs AND across partitionings
    o1 = order(3, docs)
    o2 = order(3, docs.repartition(13))
    assert o1 == o2
    # a different seed yields a (practically always) different order
    assert o1 != order(4, docs)
    # and it is a genuine shuffle, not the input order
    assert o1 != sorted(o1)


def test_write_shuffled_partitions_stream_in_order(docs, tmp_path, spark):
    from presto_bloomfilter_spark.operators import shuffle

    path = str(tmp_path / "shuffled")
    shuffle.write_shuffled(docs, path, "doc_id", seed=3, buckets=8)
    back = spark.read.parquet(path)
    assert back.count() == docs.count()
    # bucket directories exist on disk: the partitioned layout is what
    # makes epoch slices pruned scans
    import os
    assert any(e.startswith("shuffle_bucket=") for e in os.listdir(path))
    pruned = back.filter(F.col("shuffle_bucket") == 0)
    # reading one bucket ordered by pos matches the operator's order
    want = [r.doc_id for r in
            shuffle.deterministic_shuffle(docs, "doc_id", 3, 8)
            .filter(F.col("shuffle_bucket") == 0)
            .orderBy("shuffle_pos").collect()]
    got = [r.doc_id for r in pruned.orderBy("shuffle_pos").collect()]
    assert got == want


# ---- per-key caps + PII scrub ----------------------------------------------------


def test_cap_per_key_quota_and_determinism(docs):
    from presto_bloomfilter_spark.operators.sampling import cap_per_key

    out = cap_per_key(docs, "source", 5, "doc_id")
    per = {r.source: r["count"] for r in out.groupBy("source").count().collect()}
    assert set(per.values()) == {5}
    # deterministic: identical surviving set across partitionings
    a = {r.doc_id for r in out.collect()}
    b = {r.doc_id for r in
         cap_per_key(docs.repartition(17), "source", 5, "doc_id").collect()}
    assert a == b
    import pytest as _pytest
    with _pytest.raises(ValueError):
        cap_per_key(docs, "source", 0)


def test_pii_scrub_redacts_and_counts(spark):
    from presto_bloomfilter_spark.operators.text import pii_scrub

    rows = [
        ("a", "mail me at jo.doe+x@sub.example.org thanks"),
        ("b", "server 192.168.0.1 and backup 10.0.0.255 up"),
        ("c", "call 555-123-4567 or 555.987.6543 now"),
        ("d", "nothing sensitive here"),
        ("e", "combo x@y.io at 8.8.8.8 tel 111-222-3333"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r.doc_id: r for r in pii_scrub(df).collect()}
    assert got["a"].n_redactions == 1 and "<EMAIL>" in got["a"].text
    assert "jo.doe" not in got["a"].text
    assert got["b"].n_redactions == 2 and got["b"].text.count("<IP>") == 2
    assert got["c"].n_redactions == 2 and got["c"].text.count("<PHONE>") == 2
    assert got["d"].n_redactions == 0 and got["d"].text == rows[3][1]
    assert got["e"].n_redactions == 3


def test_pii_scrub_null_text_counts_zero(spark):
    from presto_bloomfilter_spark.operators.text import pii_scrub

    df = spark.createDataFrame([("a", None), ("b", "x@y.io")],
                               "doc_id string, text string")
    got = {r.doc_id: r for r in pii_scrub(df).collect()}
    assert got["a"].n_redactions == 0 and got["a"].text is None
    assert got["b"].n_redactions == 1


def test_weighted_sample_matches_reference_and_merges(docs, spark):
    """weighted_sample == a hashlib/numpy A-ES reference computed on
    the driver, is mergeable (top-k of per-half samples == global),
    and biases toward heavy weights across seeds."""
    import hashlib
    import math

    from presto_bloomfilter_spark.operators.sampling import weighted_sample

    rows = docs.select("doc_id", "n_tok").collect()

    def ref_topk(seed, k):
        prs = []
        for r in rows:
            if r.n_tok <= 0:
                continue
            x = int(hashlib.md5(f"{seed}-{r.doc_id}".encode()).hexdigest()[:8], 16)
            u = (x + 0.5) / 4294967296.0
            prs.append((math.log(u) / r.n_tok, r.doc_id))
        prs.sort(key=lambda t: (-t[0], t[1]))
        return {d for _, d in prs[:k]}

    got = {r.doc_id for r in weighted_sample(docs, "doc_id", "n_tok", 20, seed=3).collect()}
    assert got == ref_topk(3, 20)
    # mergeable: union of per-half samples re-sampled == global sample
    h1 = weighted_sample(docs.filter("source = 'web'"), "doc_id", "n_tok", 20, seed=3)
    h2 = weighted_sample(docs.filter("source != 'web'"), "doc_id", "n_tok", 20, seed=3)
    merged = weighted_sample(h1.unionByName(h2), "doc_id", "n_tok", 20, seed=3)
    assert {r.doc_id for r in merged.collect()} == got
    # weight bias: expected selection frequency tracks weight; the mean
    # n_tok of sampled rows across seeds exceeds the corpus mean
    corpus_mean = docs.agg(F.avg("n_tok")).first()[0]
    samp_means = []
    for seed in range(4):
        s = weighted_sample(docs, "doc_id", "n_tok", 40, seed=seed)
        samp_means.append(s.agg(F.avg("n_tok")).first()[0])
    assert sum(samp_means) / len(samp_means) > corpus_mean


def test_weighted_sample_excludes_nonpositive_weights(spark):
    from presto_bloomfilter_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [("a", 10), ("b", 0), ("c", -3), ("d", None), ("e", 5)],
        "doc_id string, w int")
    got = {r.doc_id for r in weighted_sample(df, "doc_id", "w", 10).collect()}
    assert got == {"a", "e"}


# ---- split_by_group ------------------------------------------------------------


def test_split_by_group_no_leakage_and_deterministic(docs, spark):
    out = sampling.split_by_group(
        docs, "source", {"train": 0.5, "val": 0.25, "test": 0.25}, seed=3)
    per_group = out.groupBy("source").agg(
        F.countDistinct("split").alias("n")).collect()
    assert all(r.n == 1 for r in per_group)  # a group never straddles splits
    labels = {r.split for r in out.select("split").distinct().collect()}
    assert labels <= {"train", "val", "test"}
    # pure function of (seed, key): invariant under repartitioning
    again = sampling.split_by_group(
        docs.repartition(7), "source", {"train": 0.5, "val": 0.25, "test": 0.25},
        seed=3)
    a = {(r.doc_id, r.split) for r in out.select("doc_id", "split").collect()}
    b = {(r.doc_id, r.split) for r in again.select("doc_id", "split").collect()}
    assert a == b
    # different seed reshuffles at least one group (3 sources, p(all same) tiny)
    other = sampling.split_by_group(
        docs, "source", {"train": 0.5, "val": 0.25, "test": 0.25}, seed=4)
    c = {(r.doc_id, r.split) for r in other.select("doc_id", "split").collect()}
    assert a != c


def test_split_by_group_fractions_approx_on_many_groups(spark):
    # 2000 singleton groups: group fractions concentrate near targets
    df = spark.range(2000).select(F.col("id").cast("string").alias("g"))
    out = sampling.split_by_group(df, "g", {"train": 0.8, "test": 0.2}, seed=0)
    n_train = out.filter(F.col("split") == "train").count()
    assert 0.75 * 2000 < n_train < 0.85 * 2000


def test_split_by_group_null_key_gets_null_split(spark):
    df = spark.createDataFrame([("a",), (None,)], "g string")
    out = {r.g: r.split for r in sampling.split_by_group(
        df, "g", {"train": 0.5, "test": 0.5}).collect()}
    assert out["a"] in ("train", "test")
    assert out[None] is None


def test_split_by_group_rejects_bad_fractions(docs):
    with pytest.raises(ValueError):
        sampling.split_by_group(docs, "source", {"train": 1.0})
    with pytest.raises(ValueError):
        sampling.split_by_group(docs, "source", {"a": 0.5, "b": 0.6})
    with pytest.raises(ValueError):
        sampling.split_by_group(docs, "source", {"a": 1.5, "b": -0.5})


# ---- bucket_by_quantile --------------------------------------------------------


def test_bucket_by_quantile_monotone_and_balanced(docs):
    out = sampling.bucket_by_quantile(docs, "n_tok", 4).cache()
    n = docs.count()
    rows = out.groupBy("bucket").agg(
        F.count("*").alias("c"),
        F.min("n_tok").alias("lo"),
        F.max("n_tok").alias("hi")).orderBy("bucket").collect()
    assert [r.bucket for r in rows] == [0, 1, 2, 3]
    # monotone: bucket value ranges never overlap out of order
    for a, b in zip(rows, rows[1:]):
        assert a.hi <= b.lo
    # near-equal populations (sketch is near-exact at n=400)
    assert all(abs(r.c / n - 0.25) < 0.08 for r in rows)
    assert sum(r.c for r in rows) == n


def test_bucket_by_quantile_constant_column_single_bucket(spark):
    df = spark.range(100).select(F.lit(7).alias("v"))
    out = sampling.bucket_by_quantile(df, "v", 4)
    vals = {r.bucket for r in out.select("bucket").distinct().collect()}
    assert len(vals) == 1  # all ties collapse into one bucket, no crash


def test_bucket_by_quantile_null_and_empty(spark):
    df = spark.createDataFrame([(1.0,), (None,), (2.0,)], "v double")
    out = {r.v: r.bucket for r in sampling.bucket_by_quantile(df, "v", 2).collect()}
    assert out[None] is None and out[1.0] is not None
    empty = df.filter(F.lit(False))
    got = sampling.bucket_by_quantile(empty, "v", 2)
    assert got.count() == 0
    all_null = spark.createDataFrame([(None,), (None,)], "v double")
    got2 = sampling.bucket_by_quantile(all_null, "v", 2).collect()
    assert all(r.bucket is None for r in got2)


def test_bucket_by_quantile_rejects_bad_buckets(docs):
    with pytest.raises(ValueError):
        sampling.bucket_by_quantile(docs, "n_tok", 1)


# ---- weighted_sample_per_key ---------------------------------------------------


def test_weighted_sample_per_key_quota_determinism_and_weighting(docs, spark):
    out = sampling.weighted_sample_per_key(
        docs, "source", "doc_id", "n_tok", 5, seed=2)
    per = {r.source: r["count"] for r in out.groupBy("source").count().collect()}
    assert set(per.values()) == {5}
    # deterministic across partitionings
    a = {(r.source, r.doc_id) for r in out.select("source", "doc_id").collect()}
    b = {(r.source, r.doc_id) for r in sampling.weighted_sample_per_key(
        docs.repartition(13), "source", "doc_id", "n_tok", 5, seed=2
    ).select("source", "doc_id").collect()}
    assert a == b
    # within each group the winners are exactly the top-k by the A-ES
    # priority computed independently in numpy
    import hashlib, math
    rows = docs.select("source", "doc_id", "n_tok").collect()
    pri = {}
    for r in rows:
        if r.n_tok and r.n_tok > 0:
            x = int(hashlib.md5(f"2-{r.doc_id}".encode()).hexdigest()[:8], 16)
            u = (x + 0.5) / 4294967296.0
            pri.setdefault(r.source, []).append(
                (math.log(u) / r.n_tok, r.doc_id))
    expect = {(s, d) for s, ps in pri.items()
              for _, d in sorted(ps, key=lambda t: (-t[0], t[1]))[:5]}
    assert a == expect


def test_weighted_sample_per_key_drops_nonpositive_and_validates(spark):
    df = spark.createDataFrame(
        [("g", "a", 3.0), ("g", "b", 0.0), ("g", "c", None), ("g", "d", 1.0)],
        "g string, k string, w double")
    out = sampling.weighted_sample_per_key(df, "g", "k", "w", 10)
    assert {r.k for r in out.collect()} == {"a", "d"}
    with pytest.raises(ValueError):
        sampling.weighted_sample_per_key(df, "g", "k", "w", 0)


def test_weighted_sample_per_key_pretruncates_before_shuffle(spark):
    d = spark.range(0, 1000).selectExpr(
        "cast(id as string) as doc_id", "cast(id % 3 as string) as source",
        "cast(id % 7 + 1 as double) as w")
    plan = sampling.weighted_sample_per_key(
        d, "source", "doc_id", "w", 7)._jdf.queryExecution() \
        .executedPlan().toString()
    pre, _, post = plan.partition("Exchange")
    assert "WindowGroupLimit" in post, plan


def test_weighted_samplers_exclude_nan_weights(spark):
    df = spark.createDataFrame(
        [("g", "a", 3.0), ("g", "b", float("nan")), ("g", "c", 1.0),
         ("g", "d", 2.0)],
        "g string, k string, w double")
    top = sampling.weighted_sample(df, "k", "w", 2)
    assert "b" not in {r.k for r in top.collect()}
    per = sampling.weighted_sample_per_key(df, "g", "k", "w", 2)
    assert "b" not in {r.k for r in per.collect()}


def test_bucket_by_quantile_nan_gets_null_bucket(spark):
    df = spark.createDataFrame(
        [(1.0,), (float("nan",),), (2.0,), (3.0,), (4.0,)], "v double")
    out = sampling.bucket_by_quantile(df, "v", 2).collect()
    by_v = {(None if r.v != r.v else r.v): r.bucket for r in out}
    assert by_v[None] is None
    assert all(b is not None for v, b in by_v.items() if v is not None)


def test_pack_rejects_null_token_elements(spark):
    df = spark.createDataFrame(
        [("a", [1, None, 3])], "doc_id string, tokens array<int>")
    with pytest.raises(Exception, match="NULL token element"):
        packing.pack_concat_chunks(df, 4).collect()


def test_plan_mixture_exact_plan(spark):
    rows = ([("web", 1000)] * 100 + [("books", 500)] * 60
            + [("tiny", 100)] * 5)
    df = spark.createDataFrame(rows, "source string, n_tok long")
    plan = {r.source: r for r in sampling.plan_mixture(
        df, {"web": 0.5, "books": 0.4, "tiny": 0.1},
        token_budget=50_000).collect()}
    web = plan["web"]          # 100k tokens, target 25k -> 25%
    assert web.tokens == 100_000 and web.target_tokens == 25_000
    assert web.rate_pct == 25 and web.expected_tokens == 25_000
    books = plan["books"]      # 30k tokens, target 20k -> 66%
    assert books.rate_pct == (100 * 20_000) // 30_000 == 66
    assert books.expected_tokens == (30_000 * 66) // 100
    tiny = plan["tiny"]        # 500 tokens < 5k target -> capped at 100
    assert tiny.rate_pct == 100 and tiny.expected_tokens == 500


def test_plan_mixture_absent_source_and_feed_forward(spark):
    df = spark.createDataFrame(
        [("web", 10), ("junk", 10)], "source string, n_tok long")
    plan = {r.source: r for r in sampling.plan_mixture(
        df, {"web": 1.0}, token_budget=5).collect()}
    assert plan["junk"].weight == 0.0 and plan["junk"].rate_pct == 0
    # the plan feeds sample_mixture directly
    rates = {r.source: r.rate_pct for r in plan.values()}
    kept = sampling.sample_mixture(
        df.withColumn("doc_id", F.monotonically_increasing_id()),
        rates).collect()
    assert all(r.source == "web" for r in kept)


def test_plan_mixture_validation(spark):
    df = spark.createDataFrame([("a", 1)], "source string, n_tok long")
    with pytest.raises(ValueError, match="token_budget"):
        sampling.plan_mixture(df, {"a": 0.5}, token_budget=-1)
    with pytest.raises(ValueError, match="weight"):
        sampling.plan_mixture(df, {"a": -0.5}, token_budget=10)
