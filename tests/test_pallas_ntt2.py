"""Pallas NTT v2 (bitcast digits + int32 Shoup reductions): bit-exactness.

On CPU this validates table generation by emulating the kernel's integer
math in numpy; the Mosaic kernel itself runs when MATRIX_FHE_TEST_TPU=1.
"""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from matrix_fhe_tpu.ops import pallas_ntt2, rings


def _digits3_np(v: np.ndarray) -> np.ndarray:
    """Centered int64 [M, K] -> int8-valued int64 [M, 3K] planes (the
    bias+xor+bitcast semantics of the kernel)."""
    u = v + 0x808080
    assert np.all((u >= 0) & (u < 1 << 24))
    d0 = (u & 255) - 128
    d1 = ((u >> 8) & 255) - 128
    d2 = ((u >> 16) & 255) - 128
    return np.concatenate([d0, d1, d2], axis=1)


def _mm_mod(dig: np.ndarray, rhs: np.ndarray, q: int) -> np.ndarray:
    mm = dig @ rhs.astype(np.int64)  # [M, 3K']
    kp = rhs.shape[1] // 3
    return (mm[:, :kp] + (mm[:, kp:2 * kp] << 8) + (mm[:, 2 * kp:] << 16)) % q


def _emulate_fwd(x: np.ndarray, tabs, moduli) -> np.ndarray:
    R, C = tabs.rows, tabs.cols
    a2 = np.asarray(tabs.a2, dtype=np.int64)
    b2 = np.asarray(tabs.b2, dtype=np.int64)
    tw = np.asarray(tabs.tw_i, dtype=np.int64)
    out = np.zeros_like(x)
    for b in range(x.shape[0]):
        for l, q in enumerate(moduli):
            X = x[b, l].reshape(R, C)
            Xc = np.where(X > q // 2, X - q, X)
            y = _mm_mod(_digits3_np(Xc.T.copy()), a2[l], q)     # [C, R']
            w = (y * (tw[l] % q)) % q
            o = _mm_mod(_digits3_np(np.where(w > q // 2, w - q, w).T.copy()),
                        b2[l], q)                               # [R', C']
            out[b, l] = o.reshape(-1)
    return out


def test_v2_tables_match_u64_ring():
    n, limbs = 1 << 8, 3
    moduli = pallas_ntt2.find_v2_primes(n, limbs)
    assert all(q <= pallas_ntt2.MAX_V2_MODULUS for q in moduli)
    tabs = pallas_ntt2.build_tables(n, moduli)
    ring = rings.new_ring(n, moduli, rings.STANDARD)
    rng = np.random.default_rng(0)
    x = rng.integers(0, min(moduli), (2, limbs, n), dtype=np.int64)
    got = _emulate_fwd(x, tabs, moduli)
    want = np.asarray(ring.ntt(jnp.asarray(x.astype(np.uint64))))
    np.testing.assert_array_equal(got.astype(np.uint64), want)


def test_v2_tables_odd_logn():
    n, limbs = 1 << 9, 2
    moduli = pallas_ntt2.find_v2_primes(n, limbs)
    tabs = pallas_ntt2.build_tables(n, moduli)
    ring = rings.new_ring(n, moduli, rings.STANDARD)
    rng = np.random.default_rng(1)
    x = rng.integers(0, min(moduli), (1, limbs, n), dtype=np.int64)
    got = _emulate_fwd(x, tabs, moduli)
    want = np.asarray(ring.ntt(jnp.asarray(x.astype(np.uint64))))
    np.testing.assert_array_equal(got.astype(np.uint64), want)


@pytest.mark.skipif(not os.environ.get("MATRIX_FHE_TEST_TPU"),
                    reason="Mosaic kernel needs real TPU hardware")
def test_v2_kernel_bit_exact_tpu():
    n, limbs, batch = 1 << 14, 4, 8
    moduli = pallas_ntt2.find_v2_primes(n, limbs)
    tabs = pallas_ntt2.build_tables(n, moduli)
    ring = rings.new_ring(n, moduli, rings.STANDARD)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.integers(0, min(moduli), (batch, limbs, n),
                                 dtype=np.int64).astype(np.int32))
    got = pallas_ntt2.ntt_fwd(x, tabs)
    want = ring.ntt(x.astype(jnp.uint64))
    np.testing.assert_array_equal(np.asarray(got).astype(np.uint64),
                                  np.asarray(want))
    rt = pallas_ntt2.ntt_bwd(got, tabs)
    np.testing.assert_array_equal(np.asarray(rt), np.asarray(x))


@pytest.mark.skipif(not os.environ.get("MATRIX_FHE_TEST_TPU"),
                    reason="Mosaic kernel needs real TPU hardware")
def test_v2_chain_bit_exact_tpu():
    # k transforms inside one kernel == k sequential launches, fwd and bwd
    n, limbs, batch, k = 1 << 14, 3, 8, 3
    moduli = pallas_ntt2.find_v2_primes(n, limbs)
    tabs = pallas_ntt2.build_tables(n, moduli)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.integers(0, min(moduli), (batch, limbs, n),
                                 dtype=np.int64).astype(np.int32))
    want = x
    for _ in range(k):
        want = pallas_ntt2.ntt_fwd(want, tabs)
    got = pallas_ntt2.ntt_chain(x, tabs, k, fwd=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    back = pallas_ntt2.ntt_chain(got, tabs, k, fwd=False)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
