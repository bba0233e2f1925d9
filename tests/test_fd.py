"""Frequent Directions (Liberty 2013 / GLPW 2016) + ExactGram: spectral
guarantee, PSD underestimate, mergeability, serialization, guards."""

import numpy as np
import pytest

from presto_bloomfilter_spark import ExactGram, FrequentDirections, sketch_from_bytes


def _spec_err(G, B):
    return float(np.linalg.eigvalsh(G - B.T @ B).max())


def _low_rank_data(rng, n=5000, d=64, rank=8):
    U = rng.normal(size=(n, rank))
    V = rng.normal(size=(rank, d))
    return U @ V + 0.05 * rng.normal(size=(n, d))


def test_spectral_guarantee_and_psd():
    rng = np.random.default_rng(0)
    A = _low_rank_data(rng)
    fd = FrequentDirections(64, ell=32)
    for chunk in np.array_split(A, 13):
        fd.add(chunk)
    G = A.T @ A
    diff_eigs = np.linalg.eigvalsh(G - fd.gram())
    fnorm2 = float((A * A).sum())
    assert abs(fd.fnorm2 - fnorm2) < 1e-6 * fnorm2
    assert fd.n == len(A)
    # PSD underestimate: A^T A - B^T B >= 0 (tiny numerical slack)
    assert diff_eigs.min() >= -1e-6 * fnorm2
    # published bound via the exactly-tracked delta witness
    assert diff_eigs.max() <= fd.deltasum + 1e-6 * fnorm2
    assert fd.deltasum <= fnorm2 / 32


def test_low_rank_recovery_much_better_than_bound():
    rng = np.random.default_rng(1)
    A = _low_rank_data(rng, rank=4)
    fd = FrequentDirections(64, ell=32).add(A)
    # rank-4 signal + small noise with ell=32: near-exact covariance
    rel = _spec_err(A.T @ A, fd.B) / np.linalg.eigvalsh(A.T @ A).max()
    assert rel <= 0.05


def test_merge_preserves_guarantee_any_tree():
    rng = np.random.default_rng(2)
    A = _low_rank_data(rng, n=6000)
    chunks = np.array_split(A, 12)
    parts = [FrequentDirections(64, ell=32).add(c) for c in chunks]
    order = rng.permutation(12)
    layer = [parts[i].copy() for i in order]
    while len(layer) > 1:
        layer = [layer[i].merge(layer[i + 1]) if i + 1 < len(layer) else layer[i]
                 for i in range(0, len(layer), 2)]
    fd = layer[0]
    fnorm2 = float((A * A).sum())
    G = A.T @ A
    diff_eigs = np.linalg.eigvalsh(G - fd.gram())
    assert fd.n == len(A)
    assert diff_eigs.min() >= -1e-6 * fnorm2
    assert diff_eigs.max() <= fd.deltasum + 1e-6 * fnorm2
    assert fd.deltasum <= fnorm2 / 32


def test_serialization_roundtrip():
    rng = np.random.default_rng(3)
    fd = FrequentDirections(16, ell=8).add(rng.normal(size=(500, 16)))
    back = sketch_from_bytes(fd.to_bytes())
    assert isinstance(back, FrequentDirections)
    assert np.array_equal(back.B, fd.B)
    assert back.n == fd.n and back.shed == fd.shed and back.fnorm2 == fd.fnorm2
    assert back.deltasum == fd.deltasum


def test_exact_gram_lossless_merge_and_covariance():
    rng = np.random.default_rng(4)
    A = rng.normal(size=(2000, 32))
    parts = [ExactGram(32).add(c) for c in np.array_split(A, 7)]
    g = parts[0].copy()
    for p in parts[1:]:
        g.merge(p)
    assert g.n == 2000
    assert np.allclose(g.G, A.T @ A)
    assert np.allclose(g.covariance(), A.T @ A / 2000)
    back = sketch_from_bytes(g.to_bytes())
    assert isinstance(back, ExactGram)
    assert np.array_equal(back.G, g.G)


def test_guards():
    with pytest.raises(ValueError):
        FrequentDirections(0)
    with pytest.raises(ValueError):
        FrequentDirections(8, ell=1)
    with pytest.raises(ValueError):
        FrequentDirections(8, ell=4).add(np.zeros((2, 9)))
    with pytest.raises(ValueError):
        FrequentDirections(8, ell=4).merge(FrequentDirections(8, ell=8))
    with pytest.raises(ValueError):
        ExactGram(4).merge(ExactGram(5))
    with pytest.raises(ValueError):
        ExactGram(4).covariance()
