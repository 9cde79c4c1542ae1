"""NTT kernels: bit-exact vs the Go-semantics oracle, roundtrip, convolution.

Mirrors the reference's test strategy for ring/ntt (ring/ntt_3n_test.go,
ring/ring_test.go): roundtrips, repeated-transform stability, zero/one edge
cases, and pointwise-mult == schoolbook polynomial mult.
"""

import numpy as np
import pytest

import oracle
from matrix_fhe_tpu.ops import modmath as mm, rings
from matrix_fhe_tpu.utils import primes as pr


def _gen_primes(nth_root, bits, k):
    g = pr.NTTFriendlyPrimesGenerator(bits, nth_root)
    return g.next_alternating_primes(k)


@pytest.mark.parametrize("n", [16, 64, 256])
@pytest.mark.parametrize("bits", [30, 55])
def test_ntt_standard_bit_exact(n, bits):
    moduli = _gen_primes(2 * n, bits, 2)
    ring = rings.new_ring(n, moduli, rings.STANDARD)
    rng = np.random.default_rng(42)
    x = np.stack([rng.integers(0, q, n, dtype=np.uint64) for q in moduli])

    got = np.asarray(ring.ntt(mm.u64(x)))
    for i, q in enumerate(moduli):
        qinv = mm.gen_mred_constant(q)
        bc = mm.gen_bred_constant(q)
        roots = [int(v) for v in np.asarray(ring.roots_fwd[i])]
        want = oracle.ntt_standard([int(v) for v in x[i]], q, qinv, bc, roots)
        np.testing.assert_array_equal(got[i], np.array(want, dtype=np.uint64))

    # inverse bit-exact + roundtrip
    back = np.asarray(ring.intt(mm.u64(got)))
    for i, q in enumerate(moduli):
        qinv = mm.gen_mred_constant(q)
        ninv = int(np.asarray(ring.ninv[i]))
        roots_b = [int(v) for v in np.asarray(ring.roots_bwd[i])]
        want = oracle.intt_standard([int(v) for v in got[i]], q, qinv, ninv, roots_b)
        np.testing.assert_array_equal(back[i], np.array(want, dtype=np.uint64))
    np.testing.assert_array_equal(back, x)


def test_ntt_standard_convolution():
    n = 32
    moduli = _gen_primes(2 * n, 45, 2)
    ring = rings.new_ring(n, moduli, rings.STANDARD)
    rng = np.random.default_rng(7)
    a = np.stack([rng.integers(0, q, n, dtype=np.uint64) for q in moduli])
    b = np.stack([rng.integers(0, q, n, dtype=np.uint64) for q in moduli])

    fa, fb = ring.ntt(mm.u64(a)), ring.ntt(mm.u64(b))
    prod = ring.intt(ring.mul_coeffs_montgomery(ring.mform(fa), fb))
    prod = np.asarray(prod)
    for i, q in enumerate(moduli):
        want = oracle.negacyclic_mul([int(v) for v in a[i]], [int(v) for v in b[i]], q)
        np.testing.assert_array_equal(prod[i], np.array(want, dtype=np.uint64))


@pytest.mark.parametrize("n", [16, 128])
def test_ntt_conjugate_invariant_bit_exact(n):
    moduli = _gen_primes(4 * n, 40, 2)
    ring = rings.new_ring(n, moduli, rings.CONJUGATE_INVARIANT)
    rng = np.random.default_rng(3)
    x = np.stack([rng.integers(0, q, n, dtype=np.uint64) for q in moduli])

    got = np.asarray(ring.ntt(mm.u64(x)))
    for i, q in enumerate(moduli):
        qinv = mm.gen_mred_constant(q)
        bc = mm.gen_bred_constant(q)
        roots = [int(v) for v in np.asarray(ring.roots_fwd[i])]
        want = oracle.ntt_ci([int(v) for v in x[i]], q, qinv, bc, roots)
        np.testing.assert_array_equal(got[i], np.array(want, dtype=np.uint64))

    back = np.asarray(ring.intt(mm.u64(got)))
    for i, q in enumerate(moduli):
        qinv = mm.gen_mred_constant(q)
        ninv = int(np.asarray(ring.ninv[i]))
        roots_b = [int(v) for v in np.asarray(ring.roots_bwd[i])]
        want = oracle.intt_ci([int(v) for v in got[i]], q, qinv, ninv, roots_b)
        np.testing.assert_array_equal(back[i], np.array(want, dtype=np.uint64))
    np.testing.assert_array_equal(back, x)


@pytest.mark.parametrize("n", [6, 12, 24, 48, 96])
def test_ntt_3n_matches_horner_and_roundtrips(n):
    """ring/ntt_3n_test.go-style: forward matches Horner evaluation at the
    totative points; backward inverts; pointwise mult == schoolbook mod
    X^N - X^{N/2} + 1."""
    moduli = pr.find_3n_rns_primes(n, 28, 3)
    ring = rings.new_ring(n, moduli, rings.MATRIX)
    rng = np.random.default_rng(11)
    x = np.stack([rng.integers(0, q, n, dtype=np.uint64) for q in moduli])

    got = np.asarray(ring.ntt(mm.u64(x)))
    for i, q in enumerate(moduli):
        omega, _ = pr.find_3n_primitive_root(q, 3 * n)
        want = oracle.ntt_3n_forward([int(v) for v in x[i]], q, omega)
        np.testing.assert_array_equal(got[i], np.array(want, dtype=np.uint64))

    back = np.asarray(ring.intt(mm.u64(got)))
    np.testing.assert_array_equal(back, x)

    # convolution property
    b = np.stack([rng.integers(0, q, n, dtype=np.uint64) for q in moduli])
    fb = ring.ntt(mm.u64(b))
    prod = np.asarray(ring.intt(ring.mul_coeffs_montgomery(ring.mform(mm.u64(got)), fb)))
    for i, q in enumerate(moduli):
        want = oracle.matrix_ring_mul([int(v) for v in x[i]], [int(v) for v in b[i]], q)
        np.testing.assert_array_equal(prod[i], np.array(want, dtype=np.uint64))


def test_ntt_edge_cases():
    n = 16
    moduli = _gen_primes(2 * n, 30, 1)
    ring = rings.new_ring(n, moduli, rings.STANDARD)
    zero = np.zeros((1, n), dtype=np.uint64)
    np.testing.assert_array_equal(np.asarray(ring.ntt(mm.u64(zero))), zero)
    np.testing.assert_array_equal(np.asarray(ring.intt(mm.u64(zero))), zero)
    one = zero.copy()
    one[0, 0] = 1
    f = ring.ntt(mm.u64(one))
    np.testing.assert_array_equal(np.asarray(f), np.ones((1, n), dtype=np.uint64))
    np.testing.assert_array_equal(np.asarray(ring.intt(f)), one)
