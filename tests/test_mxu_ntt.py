"""MXU-form NTT: bit-exact equivalence with the u64 reference path."""

import numpy as np
import pytest

from matrix_fhe_tpu.ops import mxu_ntt, modmath as mm, rings
from matrix_fhe_tpu.utils import primes as pr


@pytest.mark.parametrize("n", [64, 256, 1024])
def test_mxu_ntt_matches_u64_path(n):
    g = pr.NTTFriendlyPrimesGenerator(21, 2 * n)
    moduli = g.next_alternating_primes(3)
    ring = rings.new_ring(n, moduli, rings.STANDARD)
    tabs = mxu_ntt.build_tables(n, moduli)

    rng = np.random.default_rng(0)
    x = np.stack([rng.integers(0, q, n, dtype=np.uint64) for q in moduli])

    want_f = np.asarray(ring.ntt(mm.u64(x)))
    got_f = np.asarray(mxu_ntt.ntt_fwd(x.astype(np.int32), tabs)).astype(np.uint64)
    np.testing.assert_array_equal(got_f, want_f)

    want_b = np.asarray(ring.intt(mm.u64(want_f)))
    got_b = np.asarray(mxu_ntt.ntt_bwd(got_f.astype(np.int32), tabs)).astype(np.uint64)
    np.testing.assert_array_equal(got_b, want_b)
    np.testing.assert_array_equal(got_b, x)


def test_mxu_ntt_batched():
    n = 256
    g = pr.NTTFriendlyPrimesGenerator(21, 2 * n)
    moduli = g.next_alternating_primes(2)
    ring = rings.new_ring(n, moduli, rings.STANDARD)
    tabs = mxu_ntt.build_tables(n, moduli)
    rng = np.random.default_rng(1)
    x = np.stack([np.stack([rng.integers(0, q, n, dtype=np.uint64) for q in moduli])
                  for _ in range(4)])  # [B, L, N]
    got = np.asarray(mxu_ntt.ntt_fwd(x.astype(np.int32), tabs)).astype(np.uint64)
    for b in range(4):
        want = np.asarray(ring.ntt(mm.u64(x[b])))
        np.testing.assert_array_equal(got[b], want)


def test_mxu_ntt_extreme_values():
    """All coefficients at q-1 (worst-case digit magnitudes)."""
    n = 256
    g = pr.NTTFriendlyPrimesGenerator(21, 2 * n)
    moduli = g.next_alternating_primes(2)
    ring = rings.new_ring(n, moduli, rings.STANDARD)
    tabs = mxu_ntt.build_tables(n, moduli)
    x = np.stack([np.full(n, q - 1, dtype=np.uint64) for q in moduli])
    want = np.asarray(ring.ntt(mm.u64(x)))
    got = np.asarray(mxu_ntt.ntt_fwd(x.astype(np.int32), tabs)).astype(np.uint64)
    np.testing.assert_array_equal(got, want)
