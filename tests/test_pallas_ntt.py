"""Pallas fused NTT: bit-exactness vs the u64 reference path.

The Mosaic kernel needs real TPU hardware; on CPU this validates the
table generation + the identical jnp math via the mxu_ntt path, and the
kernel itself runs when MATRIX_FHE_TEST_TPU=1.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from matrix_fhe_tpu.ops import mxu_ntt, pallas_ntt, rings


def test_tables_match_mxu_path():
    n, limbs = 1 << 8, 3
    moduli = pallas_ntt.find_w22_primes(n, limbs)
    tabs = pallas_ntt.build_tables(n, moduli)
    ring = rings.new_ring(n, moduli, rings.STANDARD)
    rng = np.random.default_rng(0)
    x = rng.integers(0, min(moduli), (2, limbs, n), dtype=np.int64)

    # emulate the kernel math in numpy (stacked-plane form, exact ints)
    R, C = tabs.rows, tabs.cols
    a = np.asarray(tabs.a_fwd, dtype=np.int64)
    bt = np.asarray(tabs.bt_fwd, dtype=np.int64)
    tw = np.asarray(tabs.tw_fwd, dtype=np.int64)
    got = np.zeros_like(x)
    for b in range(x.shape[0]):
        for l in range(limbs):
            q = moduli[l]
            X = x[b, l].reshape(R, C)
            Xc = np.where(X > q // 2, X - q, X)
            d = np.stack([a[l][k * R:(k + 1) * R] for k in range(3)])  # planes
            A = (d[0] + (d[1] << 8) + (d[2] << 16)) % q
            y = (A @ Xc) % q
            w = (y * (tw[l] % q)) % q
            dB = np.stack([bt[l][:, k * C:(k + 1) * C] for k in range(3)])
            B = (dB[0] + (dB[1] << 8) + (dB[2] << 16)) % q
            got[b, l] = ((w @ B) % q).reshape(-1)
    want = np.asarray(ring.ntt(jnp.asarray(x.astype(np.uint64))))
    np.testing.assert_array_equal(got.astype(np.uint64), want)


@pytest.mark.skipif(not os.environ.get("MATRIX_FHE_TEST_TPU"),
                    reason="Mosaic kernel needs real TPU hardware")
def test_pallas_kernel_bit_exact_tpu():
    n, limbs, batch = 1 << 14, 4, 8
    moduli = pallas_ntt.find_w22_primes(n, limbs)
    tabs = pallas_ntt.build_tables(n, moduli)
    ring = rings.new_ring(n, moduli, rings.STANDARD)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.integers(0, min(moduli), (batch, limbs, n),
                                 dtype=np.int64).astype(np.int32))
    got = pallas_ntt.ntt_fwd(x, tabs)
    want = ring.ntt(x.astype(jnp.uint64))
    np.testing.assert_array_equal(np.asarray(got).astype(np.uint64),
                                  np.asarray(want))
    rt = pallas_ntt.ntt_bwd(got, tabs)
    np.testing.assert_array_equal(np.asarray(rt), np.asarray(x))
