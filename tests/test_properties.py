"""Property-based algebra tests (hypothesis): the merge laws every
distributed partial/combine protocol silently depends on — associativity,
commutativity, idempotence (where claimed), identity of the empty
sketch, and serialization round-trips — over random inputs and random
split points, not hand-picked examples."""

import numpy as np
from hypothesis import given, settings, strategies as st

from presto_bloomfilter_spark.functions.bloom import BloomFilter
from presto_bloomfilter_spark.functions.cms import CountMinSketch
from presto_bloomfilter_spark.functions.hll import HyperLogLog
from presto_bloomfilter_spark.functions.serialization import sketch_from_bytes
from presto_bloomfilter_spark.functions.tdigest import TDigest

ints = st.lists(st.integers(min_value=0, max_value=100_000), min_size=0, max_size=400)


def _bloom(vals):
    return BloomFilter(10_000, 0.01).add_ints(np.array(vals, dtype=np.int64)) if vals else BloomFilter(10_000, 0.01)


def _hll(vals):
    h = HyperLogLog(12)
    if vals:
        h.add_ints(np.array(vals, dtype=np.int64))
    return h


def _cms(vals):
    c = CountMinSketch(eps=0.005, delta=0.01)
    if vals:
        c.add_ints(np.array(vals, dtype=np.int64))
    return c


@settings(max_examples=40, deadline=None)
@given(ints, st.integers(min_value=0, max_value=400))
def test_bloom_split_merge_equals_whole(vals, cut):
    cut = min(cut, len(vals))
    whole = _bloom(vals)
    merged = _bloom(vals[:cut]).merge(_bloom(vals[cut:]))
    assert merged.sha256 == whole.sha256


@settings(max_examples=40, deadline=None)
@given(ints, ints)
def test_bloom_merge_commutative_and_idempotent(a, b):
    ab = _bloom(a).merge(_bloom(b))
    ba = _bloom(b).merge(_bloom(a))
    assert ab.sha256 == ba.sha256
    again = ab.copy().merge(_bloom(a))  # re-adding a side changes nothing
    assert again.sha256 == ab.sha256


@settings(max_examples=40, deadline=None)
@given(ints, st.integers(min_value=0, max_value=400))
def test_hll_split_merge_equals_whole_bytes(vals, cut):
    cut = min(cut, len(vals))
    whole = _hll(vals)
    merged = _hll(vals[:cut]).merge(_hll(vals[cut:]))
    assert np.array_equal(merged.registers, whole.registers)


@settings(max_examples=40, deadline=None)
@given(ints, ints, ints)
def test_cms_merge_associative_exact_counts(a, b, c):
    left = _cms(a).merge(_cms(b)).merge(_cms(c))
    right = _cms(a).merge(_cms(b).merge(_cms(c)))
    assert np.array_equal(left.table, right.table)
    assert left.total == len(a) + len(b) + len(c)
    # CMS never under-counts
    allv = a + b + c
    if allv:
        uniq, counts = np.unique(np.array(allv, dtype=np.int64), return_counts=True)
        assert (left.estimate_ints(uniq) >= counts).all()


@settings(max_examples=40, deadline=None)
@given(ints)
def test_roundtrip_preserves_estimates(vals):
    for sk in (_bloom(vals), _hll(vals), _cms(vals)):
        rt = sketch_from_bytes(sk.to_bytes())
        assert type(rt) is type(sk)
    h = _hll(vals)
    assert sketch_from_bytes(h.to_bytes()).estimate() == h.estimate()


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False), min_size=1, max_size=300),
    st.integers(min_value=0, max_value=300),
)
def test_tdigest_split_merge_quantiles_close(vals, cut):
    cut = min(cut, len(vals))
    whole = TDigest(100).add(np.array(vals))
    merged = TDigest(100).add(np.array(vals[:cut])) if cut else TDigest(100)
    rest = TDigest(100).add(np.array(vals[cut:])) if cut < len(vals) else TDigest(100)
    if cut and cut < len(vals):
        merged = merged.merge(rest)
    elif not cut:
        merged = rest
    assert merged.n == whole.n == len(vals)
    assert merged.min == whole.min and merged.max == whole.max
    data = np.array(vals)
    for q in (0.25, 0.5, 0.75):
        est = merged.quantile(q)
        # est must fall inside the exact quantile band q ± tol — robust
        # to atoms (repeated values), where rank-of-estimate is ill-posed
        tol = merged.rank_error + 1.5 / len(vals)
        lo = np.quantile(data, max(0.0, q - tol))
        hi = np.quantile(data, min(1.0, q + tol))
        assert lo - 1e-9 <= est <= hi + 1e-9, (q, est, lo, hi)


@settings(max_examples=40, deadline=None)
@given(ints)
def test_empty_is_identity(vals):
    e = _bloom([])
    s = _bloom(vals)
    assert e.copy().merge(s).sha256 == s.sha256
    eh, sh = _hll([]), _hll(vals)
    assert np.array_equal(eh.merge(sh).registers, sh.registers)


# ---- batch text kernels vs a straightforward per-doc reference ----------------

texts_strategy = st.lists(
    st.text(
        alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
        max_size=60,
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=60, deadline=None)
@given(texts_strategy)
def test_split_words_batch_matches_python_split(texts):
    import pandas as pd

    from presto_bloomfilter_spark.functions.hashing import hash_strings64
    from presto_bloomfilter_spark.operators.dedup import _split_words_batch

    wh, lengths = _split_words_batch(pd.Series(texts, dtype=object))
    expected_words = [w for t in texts for w in t.split()]
    assert list(lengths) == [len(t.split()) for t in texts]
    assert len(wh) == len(expected_words)
    if expected_words:
        ref = hash_strings64(pd.Series(expected_words, dtype=object))
        assert np.array_equal(wh, ref)


@settings(max_examples=60, deadline=None)
@given(texts_strategy)
def test_shingle_sets_batch_matches_single_doc(texts):
    import pandas as pd

    from presto_bloomfilter_spark.operators.dedup import (
        _shingle_hashes,
        _shingle_sets_batch,
    )

    flat, offsets = _shingle_sets_batch(pd.Series(texts, dtype=object))
    assert len(offsets) == len(texts) + 1
    for i, t in enumerate(texts):
        seg = flat[offsets[i] : offsets[i + 1]]
        assert len(seg) >= 1  # every doc owns >= 1 shingle
        assert np.all(np.diff(seg.view(np.uint64)) > 0)  # sorted unique
        assert np.array_equal(seg, _shingle_hashes(t))


# ---- PNG codec round-trip (arbitrary arrays) ---------------------------------

png_arrays = st.tuples(
    st.integers(1, 24), st.integers(1, 24), st.sampled_from([1, 2, 3, 4]),
    st.integers(0, 2**32 - 1),
).map(lambda t: np.random.default_rng(t[3]).integers(
    0, 256, size=(t[0], t[1], t[2]), dtype=np.uint8))


@settings(max_examples=80, deadline=None)
@given(png_arrays)
def test_png_codec_round_trip_property(arr):
    from presto_bloomfilter_spark.functions.png_codec import (
        png_decode,
        png_encode,
        png_read_header,
    )

    buf = png_encode(arr)
    w, h, mode = png_read_header(buf)
    assert (w, h) == (arr.shape[1], arr.shape[0])
    assert mode == {1: "L", 2: "LA", 3: "RGB", 4: "RGBA"}[arr.shape[2]]
    np.testing.assert_array_equal(png_decode(buf), arr)


@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=0, max_size=64))
def test_png_decode_rejects_garbage(buf):
    import pytest as _pytest

    from presto_bloomfilter_spark.functions.png_codec import png_decode

    with _pytest.raises(ValueError):
        png_decode(buf)


# ---- round-5 families: DDSketch / CountSketch / FrequentDirections ----------

from presto_bloomfilter_spark.functions.countsketch import CountSketch
from presto_bloomfilter_spark.functions.ddsketch import DDSketch
from presto_bloomfilter_spark.functions.fd import ExactGram, FrequentDirections

floats = st.lists(
    st.floats(min_value=-1e6, max_value=1e6,
              allow_nan=False, allow_infinity=False),
    min_size=0, max_size=300)


def _dds(vals):
    d = DDSketch(alpha=0.02)
    if vals:
        d.add(np.array(vals, dtype=np.float64))
    return d


@given(floats, floats, floats)
@settings(max_examples=40, deadline=None)
def test_ddsketch_merge_associative_byte_exact(a, b, c):
    """(A ∪ B) ∪ C == A ∪ (B ∪ C) at the BYTE level — the lossless
    bucket-add merge claim, stronger than estimate-level equality."""
    left = _dds(a).merge(_dds(b)).merge(_dds(c))
    right = _dds(a).merge(_dds(b).merge(_dds(c)))
    assert left.to_bytes() == right.to_bytes()


@given(floats, floats)
@settings(max_examples=40, deadline=None)
def test_ddsketch_merge_commutative_and_split_equals_whole(a, b):
    ab = _dds(a).merge(_dds(b))
    ba = _dds(b).merge(_dds(a))
    whole = _dds(a + b)
    assert ab.to_bytes() == ba.to_bytes() == whole.to_bytes()
    back = sketch_from_bytes(ab.to_bytes())
    assert back == ab and back.n == len(a) + len(b)


@given(ints, ints, ints)
@settings(max_examples=40, deadline=None)
def test_countsketch_merge_associative_commutative_byte_exact(a, b, c):
    def cs(vals):
        s = CountSketch(width=256, depth=3)
        if vals:
            s.add_ints(np.array(vals, dtype=np.int64))
        return s

    left = cs(a).merge(cs(b)).merge(cs(c))
    right = cs(a).merge(cs(b).merge(cs(c)))
    swapped = cs(c).merge(cs(b)).merge(cs(a))
    whole = cs(a + b + c)
    assert (left.to_bytes() == right.to_bytes() == swapped.to_bytes()
            == whole.to_bytes())


@given(floats, floats)
@settings(max_examples=25, deadline=None)
def test_fd_merge_keeps_psd_and_witness_bound(a, b):
    """Any split of the stream: AᵀA − BᵀB stays PSD and within the
    deltasum witness; ExactGram merge is exactly additive."""
    d = 8
    rows_a = np.array(a[: (len(a) // d) * d], dtype=np.float64).reshape(-1, d)
    rows_b = np.array(b[: (len(b) // d) * d], dtype=np.float64).reshape(-1, d)
    fd = FrequentDirections(d, ell=4)
    if len(rows_a):
        fd.add(rows_a)
    other = FrequentDirections(d, ell=4)
    if len(rows_b):
        other.add(rows_b)
    fd.merge(other)
    g = ExactGram(d)
    for r in (rows_a, rows_b):
        if len(r):
            g.add(r)
    if fd.n == 0:
        return
    eigs = np.linalg.eigvalsh(g.G - fd.gram())
    tol = 1e-9 * max(fd.fnorm2, 1.0)
    assert eigs.min() >= -tol
    assert eigs.max() <= fd.deltasum + tol
    assert g.n == fd.n
