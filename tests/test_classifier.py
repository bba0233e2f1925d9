"""Trained quality classifier (operators/classifier.py).

The distributed GD fit must equal a pure-numpy refit on the identical
features (same zero init / lr / iters), the scores must replay, and
the fitted model must actually separate a constructed good/bad corpus
— the property the heuristic text_quality cannot be trained into.
"""

import hashlib
import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from presto_bloomfilter_spark.operators import classifier

B = 32


def _py_grams(text):
    w = text.split()
    return w + [a + "\x1f" + b for a, b in zip(w, w[1:])]


def _py_bucket(g, buckets=B):
    return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % buckets


def _py_features(rows, buckets=B):
    """{id: dense (buckets+1) mean-normalized feature vector}."""
    out = {}
    for did, text in rows:
        v = np.zeros(buckets + 1)
        gs = _py_grams(text)
        for g in gs:
            v[_py_bucket(g, buckets)] += 1.0
        if gs:
            v[:buckets] /= len(gs)
        v[buckets] = 1.0
        out[str(did)] = v
    return out


def _py_fit(rows, labels, buckets=B, iters=15, lr=2.0):
    feats = _py_features(rows, buckets)
    X = np.stack([feats[str(i)] for i, _ in rows])
    y = np.array([labels[str(i)] for i, _ in rows], dtype=float)
    w = np.zeros(buckets + 1)
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        w = w - lr * (X.T @ (p - y)) / len(y)
    return w


GOOD = ["the quick brown fox jumps over the lazy dog",
        "a curated encyclopedia article about science",
        "careful prose with clear structure and citations",
        "the editors reviewed this article for accuracy"]
BAD = ["click here buy now cheap cheap cheap",
       "win win win free free free prize prize",
       "zzz qqq xxx spam spam spam spam",
       "buy cheap prize now click click click"]
ROWS = [(i, t) for i, t in enumerate(GOOD + BAD)]
LABELS = {str(i): (1.0 if i < len(GOOD) else 0.0) for i, _ in ROWS}


@pytest.fixture(scope="module")
def labeled(spark):
    return spark.createDataFrame(
        [(i, t, LABELS[str(i)]) for i, t in ROWS],
        "doc_id long, text string, label double")


def test_gram_features_match_numpy(spark, labeled):
    want = _py_features(ROWS)
    got = {}
    for r in classifier.gram_features(labeled, B).collect():
        got.setdefault(r.id, np.zeros(B + 1))[r.bucket] = r.x
    assert set(got) == set(want)
    for did in want:
        np.testing.assert_allclose(got[did], want[did], rtol=1e-12)


def test_train_matches_numpy_refit(spark, labeled):
    model = classifier.train_quality_classifier(
        labeled, buckets=B, iters=15, lr=2.0)
    w_ref = _py_fit(ROWS, LABELS, iters=15, lr=2.0)
    np.testing.assert_allclose(np.array(model.weights), w_ref, rtol=1e-9)
    assert model.bias == model.weights[B]


def test_score_matches_numpy_and_separates(spark, labeled):
    model = classifier.train_quality_classifier(
        labeled, buckets=B, iters=15, lr=2.0)
    got = {r.id: r for r in classifier.score_quality(labeled, model).collect()}
    w = np.array(model.weights)
    feats = _py_features(ROWS)
    for did, vec in feats.items():
        want = round(1.0 / (1.0 + math.exp(-float(vec @ w))), 6)
        assert got[did].prob == pytest.approx(want, abs=2e-6)
        assert got[did].n_gram_types == int(np.count_nonzero(vec[:B]))
    # the whole point: trained separation on the seed set
    assert min(got[str(i)].prob for i in range(len(GOOD))) > \
        max(got[str(i)].prob for i in range(len(GOOD), len(ROWS)))


def test_gramless_doc_scores_bias(spark):
    labeled = spark.createDataFrame(
        [(0, "good words here", 1.0), (1, "bad spam spam", 0.0)],
        "doc_id long, text string, label double")
    model = classifier.train_quality_classifier(
        labeled, buckets=B, iters=5, lr=1.0)
    empty = spark.createDataFrame([(99, "   ")], "doc_id long, text string")
    [r] = classifier.score_quality(empty, model).collect()
    assert r.n_gram_types == 0
    assert r.prob == pytest.approx(
        round(classifier.sigmoid(model.bias), 6), abs=1e-9)


def test_lang_id_expressible_as_trained_classifier(spark):
    """lang_id re-expressed over the trained classifier: two synthetic
    'languages' with disjoint function words separate perfectly."""
    lang_a = [f"der die das wort nummer w{i}" for i in range(10)]
    lang_b = [f"the and of word number w{i}" for i in range(10)]
    labeled = spark.createDataFrame(
        [(i, t, 1.0) for i, t in enumerate(lang_a)]
        + [(100 + i, t, 0.0) for i, t in enumerate(lang_b)],
        "doc_id long, text string, label double")
    model = classifier.train_quality_classifier(
        labeled, buckets=64, iters=20, lr=2.0)
    unseen = spark.createDataFrame(
        [(0, "der das neue wort"), (1, "the new word of")],
        "doc_id long, text string")
    got = {r.id: r.prob for r in
           classifier.score_quality(unseen, model).collect()}
    assert got["0"] > 0.5 > got["1"]


def test_validation(spark, labeled):
    with pytest.raises(ValueError, match="iters"):
        classifier.train_quality_classifier(labeled, iters=0)
    with pytest.raises(ValueError, match="lr"):
        classifier.train_quality_classifier(labeled, lr=0.0)
    with pytest.raises(ValueError, match="buckets"):
        classifier.gram_features(labeled, 0)
    with pytest.raises(ValueError, match="empty labeled"):
        classifier.train_quality_classifier(labeled.limit(0))
    with pytest.raises(ValueError, match="labels must be 0/1"):
        classifier.train_quality_classifier(
            labeled.withColumn("label", F.lit(0.5)))
    with pytest.raises(ValueError, match="buckets\\+1"):
        classifier.QualityClassifier((0.0,) * 3, buckets=8, iters=1, lr=1.0)
