"""bm25_topk and lm_score: value checks against independent pure-Python
re-computations on tiny hand-built corpora, plan-shape assertions, and
edge/validation behavior."""

import math

import pytest

from presto_bloomfilter_spark.operators import ranking

DOCS = [
    # (doc_id, text)
    (1, "data query data spark"),
    (2, "query window window window batch"),
    (3, "spark spark spark spark spark spark"),
    (4, "the a of and to line"),
    (5, "data"),
    (6, ""),
    (7, "  data   query  "),  # whitespace runs — str.split() semantics
]


def _words(t):
    return t.split()


def _bm25_reference(terms, k1=1.2, b=0.75):
    docs = {str(i): _words(t) for i, t in DOCS}
    n = len(docs)
    avgdl = sum(len(w) for w in docs.values()) / n
    dfs = {t: sum(1 for w in docs.values() if t in w) for t in terms}
    out = {}
    for did, w in docs.items():
        s = 0.0
        for t in terms:
            idf = math.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
            tf = float(w.count(t))
            s += idf * tf * (k1 + 1.0) / (
                tf + k1 * ((1.0 - b) + b * len(w) / avgdl))
        if s > 0:
            out[did] = s
    return out


def test_bm25_matches_pure_python(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    got = {r.id: r.score for r in
           ranking.bm25_topk(df, ("data", "spark"), k=10).collect()}
    want = _bm25_reference(("data", "spark"))
    assert set(got) == set(want)
    for did, s in want.items():
        assert got[did] == pytest.approx(s, rel=1e-12)


def test_bm25_ranking_order_and_k(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    rows = ranking.bm25_topk(df, ("data", "spark"), k=2).collect()
    assert len(rows) == 2
    assert rows[0].score >= rows[1].score
    want = sorted(_bm25_reference(("data", "spark")).items(),
                  key=lambda kv: (-kv[1], kv[0]))[:2]
    assert [r.id for r in rows] == [w[0] for w in want]


def test_bm25_topk_plan_no_global_sort(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    plan = (ranking.bm25_topk(df, ("data",), k=3)
            ._jdf.queryExecution().executedPlan().toString())
    assert "TakeOrderedAndProject" in plan


def test_bm25_absent_term_is_neutral(spark):
    """A term with df=0 contributes 0 to every score (tf=0), so ranking
    matches the query without it."""
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    with_ghost = ranking.bm25_topk(df, ("data", "zzz-not-there"), k=10).collect()
    without = ranking.bm25_topk(df, ("data",), k=10).collect()
    assert [(r.id, r.score) for r in with_ghost] == [
        (r.id, r.score) for r in without]


def test_bm25_validation(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    with pytest.raises(ValueError, match="at least one"):
        ranking.bm25_topk(df, ())
    with pytest.raises(ValueError, match="duplicate"):
        ranking.bm25_topk(df, ("data", "data"))
    with pytest.raises(ValueError, match="empty corpus"):
        ranking.bm25_topk(df.limit(0), ("data",))


def _md5_bucket(key: str) -> int:
    import hashlib

    return int(hashlib.md5(key.encode()).hexdigest()[:8], 16) % 100


def _lm_reference(sample_percent=60, alpha=0.1):
    """Pure-python retrain + rescore with the identical md5 sample."""
    train = [
        _words(t) for i, t in DOCS if _md5_bucket(str(i)) < sample_percent]
    uni, bi = {}, {}
    for w in train:
        for x in w:
            uni[x] = uni.get(x, 0) + 1
        for a, b in zip(w, w[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    v = len(uni)
    out = {}
    for did, t in DOCS:
        w = _words(t)
        if len(w) < 2:
            out[str(did)] = (len(w), None)
            continue
        nls = [-math.log((bi.get((p, c), 0) + alpha)
                         / (uni.get(p, 0) + alpha * v))
               for p, c in zip(w, w[1:])]
        out[str(did)] = (len(w), sum(nls) / len(nls))
    return out


def test_lm_score_matches_pure_python(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    # 60%: guarantees a non-empty sample of this 7-doc corpus
    got = {r.id: r for r in
           ranking.lm_score(df, sample_percent=60, alpha=0.1).collect()}
    want = _lm_reference(sample_percent=60, alpha=0.1)
    assert set(got) == set(want)
    for did, (nw, nll) in want.items():
        assert got[did].n_words == nw
        if nll is None:
            assert got[did].nll is None or got[did].nll != got[did].nll
        else:
            assert got[did].nll == pytest.approx(nll, rel=1e-12)


def test_lm_score_short_docs_unscoreable(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    rows = {r.id: r for r in
            ranking.lm_score(df, sample_percent=60).collect()}
    assert rows["6"].n_words == 0
    assert rows["5"].n_words == 1
    for did in ("5", "6"):
        v = rows[did].nll
        assert v is None or v != v  # NULL or NaN: not scoreable
    assert rows["1"].nll > 0  # smoothing => strictly positive nll


def test_lm_score_empty_sample_raises(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    with pytest.raises(ValueError, match="training sample is empty"):
        ranking.lm_score(df, sample_percent=0)


def test_lm_train_tables_bounded_under_heavy_vocab(spark):
    """The driver count tables must be capped by the parameters, not by
    the corpus: a heavy-vocab sample (every word a singleton except a
    small head) must yield tables of at most max_table_rows entries,
    with the deterministic (count DESC, key ASC) head retained."""
    rows = [(i, "head0 head1 " + " ".join(f"u{i}_{j}" for j in range(20)))
            for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    # unbounded: vocab is ~20 uniques/doc * sample docs + the head
    uni_all, bi_all = ranking._lm_train(df, 100, "text", "doc_id", 1, None)
    assert len(uni_all) > 500 and len(bi_all) > 500
    # count floor: only the repeated head words survive
    uni_f, bi_f = ranking._lm_train(df, 100, "text", "doc_id", 2, None)
    assert set(uni_f.index) == {"head0", "head1"}
    assert set(bi_f.index) == {"head0\x1fhead1"}
    # hard cap: top-M by (count DESC, key ASC), deterministic
    uni_c, bi_c = ranking._lm_train(df, 100, "text", "doc_id", 1, 3)
    assert len(uni_c) == 3 and len(bi_c) == 3
    assert set(uni_c.index[:2]) == {"head0", "head1"}  # the true head
    assert uni_c.index[2] == sorted(
        w for w in uni_all.index if w not in ("head0", "head1"))[0]


def test_lm_score_min_count_matches_pruned_reference(spark):
    """Scoring under min_count must equal the pure-python retrain with
    the same floor: pruned types hit the alpha path and V is the PRUNED
    unigram type count."""
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    got = {r.id: r for r in ranking.lm_score(
        df, sample_percent=60, alpha=0.1, min_count=2).collect()}

    train = [_words(t) for i, t in DOCS if _md5_bucket(str(i)) < 60]
    uni, bi = {}, {}
    for w in train:
        for x in w:
            uni[x] = uni.get(x, 0) + 1
        for a, b in zip(w, w[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    uni = {k: c for k, c in uni.items() if c >= 2}
    bi = {k: c for k, c in bi.items() if c >= 2}
    v = len(uni)
    assert v > 0
    for did, t in DOCS:
        w = _words(t)
        if len(w) < 2:
            continue
        nls = [-math.log((bi.get((p, c), 0) + 0.1) / (uni.get(p, 0) + 0.1 * v))
               for p, c in zip(w, w[1:])]
        assert got[str(did)].nll == pytest.approx(sum(nls) / len(nls), rel=1e-12)


def test_lm_score_param_validation(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    with pytest.raises(ValueError, match="min_count"):
        ranking.lm_score(df, min_count=0)
    with pytest.raises(ValueError, match="max_table_rows"):
        ranking.lm_score(df, max_table_rows=0)


# ---- tfidf_topk ----------------------------------------------------------------


def _tfidf_ref(docs, k=5, min_df=1, max_df_frac=1.0):
    """Pure-python reference: sklearn-smooth idf, (score desc, term) rank."""
    import math as _m
    n = len(docs)
    tf = {}
    for i, t in docs:
        for w in t.split():
            tf[(str(i), w)] = tf.get((str(i), w), 0) + 1
    dfreq = {}
    for (_, w) in tf:
        dfreq[w] = dfreq.get(w, 0) + 1
    out = {}
    for (i, w), c in tf.items():
        d = dfreq[w]
        if d < min_df or d > max_df_frac * n:
            continue
        score = c * (_m.log((n + 1.0) / (d + 1.0)) + 1.0)
        out.setdefault(i, []).append((-score, w, c, d))
    res = {}
    for i, lst in out.items():
        for r, (negs, w, c, d) in enumerate(sorted(lst)[:k], 1):
            res[(i, w)] = (c, d, -negs, r)
    return res


def test_tfidf_topk_matches_pure_python(spark):
    docs = [(1, "apple banana apple cherry"),
            (2, "banana cherry cherry date"),
            (3, "apple date date date egg"),
            (4, "fig fig banana apple")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r.id, r.term): (r.tf, r.df_docs, r.score, r.rank)
           for r in ranking.tfidf_topk(df, k=2).collect()}
    ref = _tfidf_ref(docs, k=2)
    assert set(got) == set(ref)
    for key, (tf, dfr, score, rank) in ref.items():
        gtf, gdf, gscore, grank = got[key]
        assert (gtf, gdf, grank) == (tf, dfr, rank)
        assert abs(gscore - score) < 1e-12


def test_tfidf_topk_df_bounds(spark):
    docs = [(1, "stop rare1 stop"), (2, "stop rare2"), (3, "stop rare3"),
            (4, "stop mid"), (5, "stop mid")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    # min_df=2 drops the rare* hapaxes; max_df_frac=0.5 drops 'stop' (df=5)
    out = ranking.tfidf_topk(df, k=3, min_df=2, max_df_frac=0.5).collect()
    assert {r.term for r in out} == {"mid"}
    assert sorted(r.id for r in out) == ["4", "5"]


def test_tfidf_topk_rank_ties_break_by_term(spark):
    df = spark.createDataFrame([(1, "bb aa"), (2, "aa bb")],
                               "doc_id long, text string")
    out = {(r.id, r.rank): r.term
           for r in ranking.tfidf_topk(df, k=2).collect()}
    assert out[("1", 1)] == "aa" and out[("1", 2)] == "bb"
    assert out[("2", 1)] == "aa"


def test_tfidf_topk_plan_window_group_limit(spark):
    df = spark.createDataFrame([(1, "a b"), (2, "b c")],
                               "doc_id long, text string")
    plan = (ranking.tfidf_topk(df, k=1)
            ._jdf.queryExecution().executedPlan().toString())
    assert "WindowGroupLimit" in plan, plan
    assert "Python" not in plan


def test_tfidf_topk_validation(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="k must be"):
        ranking.tfidf_topk(df, k=0)
    with pytest.raises(ValueError, match="empty corpus"):
        ranking.tfidf_topk(df.filter("doc_id < 0"))
