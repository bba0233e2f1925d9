"""Train/test n-gram contamination detection."""

import pytest
from pyspark.sql import functions as F

from presto_bloomfilter_spark.operators import contamination


@pytest.fixture(scope="module")
def tiny(spark):
    train = spark.createDataFrame(
        [
            ("t1", "the quick brown fox jumps over the lazy dog"),
            ("t2", "a completely different sentence with no overlap here"),
            ("t3", "the quick brown cat sat still"),
            ("t4", "xy"),  # < n words -> single joined gram
        ],
        "doc_id string, text string",
    )
    test = spark.createDataFrame(
        [("e1", "the quick brown fox ran"), ("e2", "xy")],
        "doc_id string, text string",
    )
    return train, test


def test_exact_hand_computed(spark, tiny):
    train, test = tiny
    out = {r.id: r for r in contamination.contamination_exact(train, test).collect()}
    # test universe 3-grams: {the quick brown, quick brown fox, brown fox ran} + {xy}
    # t1 grams: 7 (9 words) -> hits: 'the quick brown', 'quick brown fox' = 2
    assert (out["t1"].n_grams, out["t1"].n_contaminated) == (7, 2)
    assert out["t1"].frac == pytest.approx(2 / 7)
    # t2: 6 grams, no overlap
    assert (out["t2"].n_grams, out["t2"].n_contaminated) == (6, 0)
    # t3: 4 grams, hit: 'the quick brown'
    assert (out["t3"].n_grams, out["t3"].n_contaminated) == (4, 1)
    # t4: single gram 'xy' == e2's single gram
    assert (out["t4"].n_grams, out["t4"].n_contaminated) == (1, 1)
    assert out["t4"].frac == 1.0


def test_bloom_no_false_negatives_and_bounded_overcount(spark, tiny):
    train, test = tiny
    exact = {r.id: r for r in contamination.contamination_exact(train, test).collect()}
    bloom = {r.id: r for r in contamination.contamination_bloom(
        train, test, expected_grams=10_000, fpp=1e-4).collect()}
    assert set(bloom) == set(exact)
    for k in exact:
        assert bloom[k].n_grams == exact[k].n_grams
        assert bloom[k].n_contaminated >= exact[k].n_contaminated  # no FN ever
        assert bloom[k].frac - exact[k].frac <= 0.01  # fpp-bounded overcount


def test_bloom_path_is_join_free(spark, tiny):
    """The scale property: the train corpus is probed map-only — the
    bloom plan must contain no join operator at all (the exact path
    has two)."""
    train, test = tiny
    plan_bloom = (
        contamination.contamination_bloom(train, test)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "Join" not in plan_bloom
    plan_exact = (
        contamination.contamination_exact(train, test)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "Join" in plan_exact  # sanity: the exact path does join


def test_exact_broadcasts_universe(spark, tiny):
    train, test = tiny
    plan = (
        contamination.contamination_exact(train, test)
        ._jdf.queryExecution().sparkPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


def test_token_ngram_contamination(spark):
    """Token-id n-gram form over the pre-tokenized table shape."""
    train = spark.createDataFrame(
        [("t1", [1, 2, 3, 4, 5]), ("t2", [9, 9, 9, 9]), ("t3", [7])],
        "doc_id string, tokens array<int>",
    )
    test = spark.createDataFrame(
        [("e1", [2, 3, 4, 8]), ("e2", [7])],
        "doc_id string, tokens array<int>",
    )
    out = {r.id: r for r in contamination.contamination_exact_tokens(
        train, test, n=3).collect()}
    # universe 3-grams: {"2 3 4","3 4 8"} + short e2 -> {"7"}
    # t1 grams: "1 2 3","2 3 4","3 4 5" -> 1 hit
    assert (out["t1"].n_grams, out["t1"].n_contaminated) == (3, 1)
    # t2 grams: "9 9 9" x2 distinct -> 1 gram, 0 hits
    assert (out["t2"].n_grams, out["t2"].n_contaminated) == (1, 0)
    # t3 short: gram "7" == e2's gram
    assert (out["t3"].n_grams, out["t3"].n_contaminated) == (1, 1)
    bl = {r.id: r for r in contamination.contamination_bloom_tokens(
        train, test, n=3, expected_grams=1000, fpp=1e-4).collect()}
    for k in out:
        assert bl[k].n_grams == out[k].n_grams
        assert bl[k].n_contaminated >= out[k].n_contaminated


def test_empty_test_set(spark, tiny):
    train, _ = tiny
    empty = spark.createDataFrame([], "doc_id string, text string")
    out = contamination.contamination_exact(train, empty).collect()
    assert all(r.n_contaminated == 0 and r.frac == 0.0 for r in out)


# ---- connected components (dup clusters) ---------------------------------------


def test_components_from_pairs_multi_hop(spark):
    from presto_bloomfilter_spark.operators import dedup

    # two chains and an isolated pair: {1-2-3-4-5}, {10-11}, {20-21-22}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (21, 20), (21, 22)],
        "id_a long, id_b long",
    )
    comp = {r.id: r.component for r in dedup.components_from_pairs(pairs).collect()}
    assert {k: comp[k] for k in (1, 2, 3, 4, 5)} == dict.fromkeys(range(1, 6), 1)
    assert comp[10] == comp[11] == 10
    assert {comp[20], comp[21], comp[22]} == {20}


def test_components_merge_two_chains(spark):
    from presto_bloomfilter_spark.operators import dedup

    # chains 1-2-3 and 7-8-9 joined by a single bridge 3-7: one component
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8), (8, 9), (3, 7)], "id_a long, id_b long")
    comp = {r.id: r.component for r in dedup.components_from_pairs(pairs).collect()}
    assert set(comp.values()) == {1}


def test_components_nonconvergence_is_loud(spark):
    from presto_bloomfilter_spark.operators import dedup

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.components_from_pairs(pairs, max_iterations=2)


def test_components_star_parity_with_label_propagation(spark):
    from presto_bloomfilter_spark.operators import dedup

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (21, 20), (21, 22),
         (30, 30), (3, 7), (7, 8)],
        "id_a long, id_b long",
    )
    lp = {(r.id, r.component)
          for r in dedup.components_from_pairs(pairs).collect()}
    st = {(r.id, r.component) for r in dedup.components_star(pairs).collect()}
    assert st == lp and len(st) > 0


def test_components_star_path_graph_converges_in_log_rounds(spark):
    """The case label propagation can't touch: a 10k-node path graph
    has diameter 10k (label-prop would need 10k rounds), but
    large-star/small-star contraction must finish within ~log2(n)
    alternating rounds — max_rounds=25 is the O(log n) assertion."""
    from presto_bloomfilter_spark.operators import dedup

    n = 10_000
    path = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long")
    out = dedup.components_star(path, max_rounds=25)
    comp = out.groupBy("component").count().collect()
    assert len(comp) == 1 and comp[0].component == 0 and comp[0]["count"] == n


def test_components_reliable_checkpoint_dir(spark, tmp_path):
    """checkpoint_dir switches lineage truncation to RELIABLE
    checkpoints (shared-storage RDD snapshots an executor loss can
    re-read) — results identical, checkpoint files actually written."""
    import os

    from presto_bloomfilter_spark.operators import dedup

    ckdir = str(tmp_path / "ck")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (8, 9)], "id_a long, id_b long")
    comp = {(r.id, r.component)
            for r in dedup.components_from_pairs(
                pairs, checkpoint_dir=ckdir).collect()}
    assert comp == {(1, 1), (2, 1), (3, 1), (8, 8), (9, 8)}
    walked = [f for _, _, fs in os.walk(ckdir) for f in fs]
    assert walked, "no reliable checkpoint files written"


def test_sharded_contamination_matches_exact_contract(spark, tiny, tmp_path):
    """Sharded-family form: same schema, no false negatives, bounded
    overcount — peak executor state is one shard filter."""
    train, test = tiny
    exact = {r.id: r for r in contamination.contamination_exact(train, test).collect()}
    shd = {r.id: r for r in contamination.contamination_sharded(
        train, test, str(tmp_path / "store"), shards=4,
        expected_grams_per_shard=5_000, fpp=1e-4).collect()}
    assert set(shd) == set(exact)
    for k in exact:
        assert shd[k].n_grams == exact[k].n_grams
        assert shd[k].n_contaminated >= exact[k].n_contaminated
        assert shd[k].frac - exact[k].frac <= 0.01


def test_contamination_bloom_counts_empty_doc_grams(spark):
    """An empty/whitespace-only doc's single gram is '' — invisible to
    BloomFilter (reference empty-element semantics) but counted by the
    exact path.  The bloom paths map it to a sentinel, so exact and
    bloom must agree that an empty train doc is contaminated by an
    empty test doc (previously a silent false negative)."""
    from presto_bloomfilter_spark.operators import contamination as C

    train = spark.createDataFrame(
        [(1, "   "), (2, "real words here three grams worth")],
        "doc_id long, text string")
    test = spark.createDataFrame([(9, "")], "doc_id long, text string")
    exact = {r.id: r.n_contaminated for r in
             C.contamination_exact(train, test).collect()}
    bloom = {r.id: r.n_contaminated for r in
             C.contamination_bloom(train, test, expected_grams=1000).collect()}
    assert exact["1"] == 1 and exact["2"] == 0
    assert bloom["1"] == 1, "empty-doc gram lost by the bloom path"
    assert bloom["2"] == 0


def test_contamination_sharded_single_scan_and_parity(spark, tmp_path):
    """The sharded path now probes with a hit FLAG (one gram scan for
    totals+hits) and must match contamination_bloom row for row."""
    from presto_bloomfilter_spark.operators import contamination as C

    train = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "no overlap at all here")],
        "doc_id long, text string")
    test = spark.createDataFrame(
        [(9, "alpha beta gamma epsilon")], "doc_id long, text string")
    a = {r.id: (r.n_grams, r.n_contaminated) for r in C.contamination_sharded(
        train, test, str(tmp_path / "st"), shards=2,
        expected_grams_per_shard=1000).collect()}
    b = {r.id: (r.n_grams, r.n_contaminated) for r in
         C.contamination_bloom(train, test, expected_grams=1000).collect()}
    assert a == b


def test_contamination_xor_parity_with_exact(spark, tiny):
    """The xor seen-set path: exact parity at fp_bits=16 on a tiny
    corpus (FP probability per distinct clean gram ~1.5e-5), plus the
    empty-gram sentinel round trip the bloom path also guarantees."""
    from presto_bloomfilter_spark.operators import contamination as C

    train, test = tiny
    e = {r.id: (r.n_grams, r.n_contaminated)
         for r in C.contamination_exact(train, test).collect()}
    x = {r.id: (r.n_grams, r.n_contaminated)
         for r in C.contamination_xor(train, test, fp_bits=16).collect()}
    assert x == e

    empty = spark.createDataFrame(
        [(1, ""), (2, "completely clean words")], "doc_id long, text string")
    empty_test = spark.createDataFrame([(9, "")], "doc_id long, text string")
    got = {r.id: r.n_contaminated
           for r in C.contamination_xor(empty, empty_test).collect()}
    assert got["1"] == 1, "empty-doc gram lost by the xor path"
    assert got["2"] == 0
