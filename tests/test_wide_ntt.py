"""Wide-modulus NTT: bit-exact equivalence with the u64 reference path.

Runs the 45/55-bit four-step digit-plane NTT (ops/wide_ntt.py) against the
u64 butterfly NTT of ops/rings.py (parity path of ring/ntt.go) on the same
primes — the reference's production prime widths, which the narrow (<2^23)
fast path cannot represent."""

import numpy as np
import pytest

from matrix_fhe_tpu.ops import modmath as mm, rings, wide, wide_ntt
from matrix_fhe_tpu.utils import primes as pr


def _moduli(n, bits, count):
    g = pr.NTTFriendlyPrimesGenerator(bits, 2 * n)
    return g.next_alternating_primes(count)


@pytest.mark.parametrize("n,bits", [(64, 45), (256, 45), (256, 55),
                                    (1024, 45)])
def test_wide_ntt_matches_u64_path(n, bits):
    moduli = _moduli(n, bits, 3)
    ring = rings.new_ring(n, moduli, rings.STANDARD)
    tabs = wide_ntt.build_tables(n, moduli)

    rng = np.random.default_rng(0)
    x = np.stack([rng.integers(0, q, n, dtype=np.uint64) for q in moduli])

    xp = wide.pack_pair(x, moduli)
    want_f = np.asarray(ring.ntt(mm.u64(x)))
    got_f = wide.unpack_pair(np.asarray(wide_ntt.ntt_fwd(xp, tabs)), moduli)
    np.testing.assert_array_equal(got_f, want_f)

    want_b = np.asarray(ring.intt(mm.u64(want_f)))
    got_b = wide.unpack_pair(
        np.asarray(wide_ntt.ntt_bwd(wide.pack_pair(want_f, moduli), tabs)),
        moduli)
    np.testing.assert_array_equal(got_b, want_b)
    np.testing.assert_array_equal(got_b, x)


def test_wide_ntt_batched():
    n, bits = 256, 45
    moduli = _moduli(n, bits, 2)
    ring = rings.new_ring(n, moduli, rings.STANDARD)
    tabs = wide_ntt.build_tables(n, moduli)
    rng = np.random.default_rng(1)
    x = np.stack([np.stack([rng.integers(0, q, n, dtype=np.uint64)
                            for q in moduli]) for _ in range(4)])  # [B, L, N]
    got = wide.unpack_pair(
        np.asarray(wide_ntt.ntt_fwd(wide.pack_pair(x, moduli), tabs)), moduli)
    for b in range(4):
        want = np.asarray(ring.ntt(mm.u64(x[b])))
        np.testing.assert_array_equal(got[b], want)


def test_wide_ntt_extreme_values():
    """All coefficients at q-1 / q/2 boundaries (worst-case digits)."""
    n = 256
    moduli = [0x2000000A0001, 0x80000000080001]  # Lattigo 45/55-bit primes
    ring = rings.new_ring(n, moduli, rings.STANDARD)
    tabs = wide_ntt.build_tables(n, moduli)
    x = np.stack([np.full(n, q - 1, dtype=np.uint64) for q in moduli])
    x[:, ::2] = np.array([q // 2 for q in moduli], dtype=np.uint64)[:, None]
    want = np.asarray(ring.ntt(mm.u64(x)))
    got = wide.unpack_pair(
        np.asarray(wide_ntt.ntt_fwd(wide.pack_pair(x, moduli), tabs)), moduli)
    np.testing.assert_array_equal(got, want)
