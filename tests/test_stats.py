"""operators/stats.py: per-source entropy / KL-to-corpus and pairwise JSD.

Value checks against tiny hand-computable corpora (numpy reference), plus
invariants: KL >= 0 with equality iff the source equals the mixture, JSD
symmetric-by-construction and ln2 for disjoint supports, 0 for identical
distributions.
"""

import math

import numpy as np
import pytest

from presto_bloomfilter_spark.operators import stats


def _df(spark, rows):
    return spark.createDataFrame(rows, "source string, tokens array<int>")


def _ref_divergence(rows):
    """numpy reference: dict source -> (n_tok, n_types, entropy, kl)."""
    from collections import Counter

    per = {}
    corpus = Counter()
    for src, toks in rows:
        per.setdefault(src, Counter()).update(toks)
        corpus.update(toks)
    nn = sum(corpus.values())
    out = {}
    for src, cnt in per.items():
        n = sum(cnt.values())
        p = np.array([c / n for c in cnt.values()])
        q = np.array([corpus[t] / nn for t in cnt])
        out[src] = (n, len(cnt),
                    round(float(-(p * np.log(p)).sum()), 6),
                    round(float((p * np.log(p / q)).sum()), 6))
    return out


def test_divergence_matches_numpy_reference(spark):
    rows = [
        ("a", [1, 1, 2, 3]),
        ("a", [2, 2, 4]),
        ("b", [1, 5, 5, 5]),
        ("b", [6]),
    ]
    got = {r.source: (r.n_tok, r.n_types, r.entropy, r.kl_corpus)
           for r in stats.source_token_divergence(_df(spark, rows)).collect()}
    assert got == _ref_divergence(rows)


def test_kl_zero_when_source_equals_mixture(spark):
    # both sources have the identical distribution -> mixture == each
    rows = [("a", [1, 1, 2]), ("b", [1, 1, 2]), ("b", [1, 1, 2])]
    for r in stats.source_token_divergence(_df(spark, rows)).collect():
        assert r.kl_corpus == 0.0
        assert r.entropy == round(-(2 / 3) * math.log(2 / 3)
                                  - (1 / 3) * math.log(1 / 3), 6)


def test_jsd_identical_and_disjoint(spark):
    rows = [
        ("same1", [1, 2, 2, 3]),
        ("same2", [1, 2, 2, 3]),
        ("other", [9, 9, 8]),
    ]
    got = {(r.source_a, r.source_b): r.jsd
           for r in stats.source_pairwise_jsd(_df(spark, rows)).collect()}
    assert len(got) == 3  # all unordered pairs present
    assert got[("same1", "same2")] == 0.0
    ln2 = round(math.log(2.0), 6)
    assert got[("other", "same1")] == ln2
    assert got[("other", "same2")] == ln2


def test_jsd_partial_overlap_value(spark):
    # a: {1: 1.0}; b: {1: 0.5, 2: 0.5}
    rows = [("a", [1, 1]), ("b", [1, 2])]
    m1, m2 = 0.75, 0.25
    expect = 0.5 * (1.0 * math.log(1.0 / m1)) \
        + 0.5 * (0.5 * math.log(0.5 / m1) + 0.5 * math.log(0.5 / m2))
    [r] = stats.source_pairwise_jsd(_df(spark, rows)).collect()
    assert (r.source_a, r.source_b) == ("a", "b")
    assert r.jsd == pytest.approx(expect, abs=2e-6)
    assert 0.0 <= r.jsd <= math.log(2.0)


def test_jsd_bounds_on_sf_corpus(spark, sf_dir):
    from presto_bloomfilter_spark.sources.corpus import load_tokens

    tokens = load_tokens(spark, sf_dir)
    rows = stats.source_pairwise_jsd(tokens).collect()
    n_src = tokens.select("source").distinct().count()
    assert len(rows) == n_src * (n_src - 1) // 2
    for r in rows:
        assert 0.0 <= r.jsd <= math.log(2.0) + 1e-9


def test_pmi_bigrams_hand_computed(spark):
    rows = [("a", [1, 2, 3, 1, 2]), ("b", [2, 3]), ("c", [7]), ("d", [])]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    got = [(r.a, r.b, r.cnt, r.pmi)
           for r in stats.pmi_bigrams(df, k=10, min_count=1).collect()]
    # bigrams: (1,2)x2 (2,3)x2 (3,1)x1, N_bi=5; unigrams 1:2 2:3 3:2 7:1, N=8
    p12 = round(math.log((2 / 5) / ((2 / 8) * (3 / 8))), 6)
    p23 = round(math.log((2 / 5) / ((3 / 8) * (2 / 8))), 6)
    p31 = round(math.log((1 / 5) / ((2 / 8) * (2 / 8))), 6)
    assert got == [(1, 2, 2, p12), (2, 3, 2, p23), (3, 1, 1, p31)]
    # min_count filters the hapax pair
    assert len(stats.pmi_bigrams(df, k=10, min_count=2).collect()) == 2


def test_drop_exact_dup_tokens_min_id_wins(spark):
    from presto_bloomfilter_spark.operators import dedup

    df = spark.createDataFrame(
        [("9", [1, 2]), ("2", [1, 2]), ("5", [1, 2]), ("0", [3]), ("1", [])],
        "doc_id string, tokens array<int>")
    kept = sorted(r.doc_id for r in dedup.drop_exact_dup_tokens(df).collect())
    assert kept == ["0", "1", "2"]
    groups = dedup.token_dup_groups(df).collect()
    assert len(groups) == 1 and groups[0].dup_cnt == 3


def test_zipf_alpha_matches_numpy_ols(spark):
    # counts: token 1 x8, 2 x4, 3 x2, 4 x1 in source "s"; one-token
    # source "t" is omitted (slope undefined on a single point)
    toks = [1] * 8 + [2] * 4 + [3] * 2 + [4]
    df = spark.createDataFrame(
        [("a", "s", toks), ("b", "t", [9])],
        "doc_id string, source string, tokens array<int>")
    rows = stats.zipf_alpha(df, source_col="source").collect()
    assert len(rows) == 1 and rows[0].source == "s" and rows[0].n_ranked == 4
    x = np.log(np.arange(1, 5, dtype=float))
    y = np.log(np.array([8.0, 4.0, 2.0, 1.0]))
    slope = ((x - x.mean()) * (y - y.mean())).sum() / ((x - x.mean()) ** 2).sum()
    assert rows[0].alpha == round(-slope, 6)
    # corpus-wide mode
    [allr] = stats.zipf_alpha(df, source_col=None).collect()
    assert allr.source == "<all>" and allr.n_ranked == 5
