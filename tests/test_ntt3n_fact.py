"""Factorized 3N NTT (ops/ntt_3n.py): bit-exact vs the dense evaluation
matrix (the oracle validated against Horner/Vandermonde in test_ntt.py),
and exact at production degrees the dense path cannot reach.

Counterpart of ring/ntt_3n.go:484-604 (the fork's fast 3N transform),
derived as cyclotomic-split + twist + four-step (module docstring)."""

import numpy as np
import pytest

from matrix_fhe_tpu.ops import modmath as mm, rings
from matrix_fhe_tpu.utils import primes as pr


@pytest.mark.parametrize("n", [12, 24, 48, 96,
                               pytest.param(192, marks=pytest.mark.slow),
                               pytest.param(384, marks=pytest.mark.slow)])
def test_factorized_matches_dense(n):
    moduli = pr.find_3n_rns_primes(n, 45, 2)
    ring = rings.new_ring(n, moduli, rings.MATRIX)
    assert ring.ntt3n is not None and ring.ntt_fwd_mat is not None
    rng = np.random.default_rng(0)
    x = mm.u64(np.stack([rng.integers(0, q, n, dtype=np.uint64)
                         for q in moduli]))
    fwd = np.asarray(ring.ntt(x))       # factorized (the dispatch default)
    dense = np.asarray(rings._ntt_matrix_ring(
        x, ring.ntt_fwd_mat, ring.moduli, ring.qinv, ring.bhi))
    np.testing.assert_array_equal(fwd, dense)
    bwd = np.asarray(ring.intt(mm.u64(dense)))
    dense_b = np.asarray(rings._ntt_matrix_ring(
        mm.u64(dense), ring.ntt_bwd_mat, ring.moduli, ring.qinv, ring.bhi))
    np.testing.assert_array_equal(bwd, dense_b)
    np.testing.assert_array_equal(bwd, np.asarray(x))


@pytest.mark.parametrize("n", [1152,
                               pytest.param(1536, marks=pytest.mark.slow)])
def test_factorized_large_degree(n):
    """Degrees beyond the old N<=384 cap: exact roundtrip + the negacyclic
    ring-multiplication property vs a schoolbook big-int oracle."""
    moduli = pr.find_3n_rns_primes(n, 45, 2)
    ring = rings.new_ring(n, moduli, rings.MATRIX)
    assert ring.ntt3n is not None and ring.ntt_fwd_mat is None
    rng = np.random.default_rng(1)
    x = mm.u64(np.stack([rng.integers(0, q, n, dtype=np.uint64)
                         for q in moduli]))
    np.testing.assert_array_equal(np.asarray(ring.intt(ring.ntt(x))),
                                  np.asarray(x))

    aa = rng.integers(0, 100, n)
    bb = rng.integers(0, 100, n)
    conv = np.zeros(2 * n - 1, dtype=object)
    for i in range(n):
        if aa[i]:
            conv[i:i + n] += int(aa[i]) * bb.astype(object)
    red = conv.copy()
    for d in range(2 * n - 2, n - 1, -1):
        c = red[d]
        if c:
            red[d] = 0
            red[d - n // 2] += c           # X^N = X^{N/2} - 1
            red[d - n] -= c
    want = np.stack([np.array([int(v) % q for v in red[:n]],
                              dtype=np.uint64) for q in moduli])
    av = mm.u64(np.stack([aa.astype(np.uint64) % q for q in moduli]))
    bv = mm.u64(np.stack([bb.astype(np.uint64) % q for q in moduli]))
    prod = ring.mul_coeffs_montgomery(ring.mform(ring.ntt(av)), ring.ntt(bv))
    np.testing.assert_array_equal(np.asarray(ring.intt(prod)), want)


def test_at_level_slices_tables():
    n = 48
    moduli = pr.find_3n_rns_primes(n, 45, 3)
    ring = rings.new_ring(n, moduli, rings.MATRIX)
    sub = ring.at_level(1)
    rng = np.random.default_rng(2)
    x = mm.u64(np.stack([rng.integers(0, q, n, dtype=np.uint64)
                         for q in moduli[:2]]))
    full = np.asarray(ring.ntt(mm.u64(np.concatenate(
        [np.asarray(x), np.zeros((1, n), dtype=np.uint64)]))))[:2]
    np.testing.assert_array_equal(np.asarray(sub.ntt(x)), full)
