"""FastRing (int32 fast path): bit-exactness vs the u64 parity ring."""

import numpy as np
import jax.numpy as jnp

from matrix_fhe_tpu.fast import fring
from matrix_fhe_tpu.ops import rings


def _setup(n=1 << 8, limbs=3, seed=0):
    moduli = fring.find_fast_primes(n, limbs)
    fr = fring.new_fast_ring(n, moduli)
    ur = rings.new_ring(n, moduli, rings.STANDARD)
    rng = np.random.default_rng(seed)
    a = rng.integers(0, min(moduli), (limbs, n), dtype=np.int64)
    b = rng.integers(0, min(moduli), (limbs, n), dtype=np.int64)
    return fr, ur, moduli, a, b


def _i32(x):
    return jnp.asarray(x.astype(np.int32))


def _u64(x):
    return jnp.asarray(x.astype(np.uint64))


def _eq(got_i32, want_u64):
    np.testing.assert_array_equal(
        np.asarray(got_i32).astype(np.uint64), np.asarray(want_u64))


def test_elementwise_ops_match_u64():
    fr, ur, moduli, a, b = _setup()
    fa, fb = _i32(a), _i32(b)
    ua, ub = _u64(a), _u64(b)
    _eq(fr.add(fa, fb), ur.add(ua, ub))
    _eq(fr.sub(fa, fb), ur.sub(ua, ub))
    _eq(fr.neg(fa), np.where(a == 0, 0, np.array(moduli)[:, None] - a))
    # plain-domain modular multiply == Barrett multiply of the u64 path
    _eq(fr.mul_coeffs_montgomery(fa, fb), ur.mul_coeffs_barrett(ua, ub))
    _eq(fr.mul_coeffs_barrett(fa, fb), ur.mul_coeffs_barrett(ua, ub))
    want = np.asarray(ur.mul_coeffs_barrett(ua, ub))
    _eq(fr.mul_coeffs_montgomery_then_add(fa, fb, fb),
        ur.add(jnp.asarray(want), ub))
    sc = [7, 11, 13]
    _eq(fr.mul_scalar_montgomery(fa, jnp.asarray(sc, jnp.int32)),
        (a * np.array(sc)[:, None]) % np.array(moduli)[:, None])
    _eq(fr.add_scalar(fa, 12345), (a + 12345) % np.array(moduli)[:, None])
    _eq(fr.sub_scalar(fa, 12345), (a - 12345) % np.array(moduli)[:, None])


def test_mulmod_edge_values():
    fr, ur, moduli, _, _ = _setup()
    qs = np.array(moduli)[:, None]
    edges = np.stack([np.zeros_like(qs[:, 0]), qs[:, 0] - 1, qs[:, 0] // 2,
                      qs[:, 0] // 2 + 1, np.ones_like(qs[:, 0])], axis=1)
    pad = np.zeros((len(moduli), fr.n - edges.shape[1]), dtype=np.int64)
    a = np.concatenate([edges, pad], axis=1)
    b = np.concatenate([edges[:, ::-1], pad], axis=1)
    got = fr.mul_coeffs_montgomery(_i32(a), _i32(b))
    want = (a * b) % qs
    _eq(got, want)


def test_ntt_roundtrip_matches_u64():
    fr, ur, moduli, a, _ = _setup()
    got = fr.ntt(_i32(a))
    want = ur.ntt(_u64(a))
    _eq(got, want)
    back = fr.intt(got)
    _eq(back, _u64(a))


def test_at_level_views():
    fr, ur, moduli, a, b = _setup()
    fl = fr.at_level(1)
    ul = ur.at_level(1)
    assert fl.num_limbs == 2
    _eq(fl.ntt(_i32(a[:2])), ul.ntt(_u64(a[:2])))
    _eq(fl.mul_coeffs_montgomery(_i32(a[:2]), _i32(b[:2])),
        ul.mul_coeffs_barrett(_u64(a[:2]), _u64(b[:2])))
    assert fl.modulus_at_level() == moduli[0] * moduli[1]


def test_batched_shapes():
    fr, ur, moduli, a, b = _setup()
    batch = np.stack([a, b])  # [2, L, N]
    got = fr.ntt(_i32(batch))
    want = ur.ntt(_u64(batch))
    _eq(got, want)


def test_ptile_pad_always_legal():
    # Mosaic block-shape rule: second-to-last block dim must be a multiple
    # of 8 or equal to the (padded) batch dim (ADVICE r2, high: D=7 digit
    # stacks crashed the TPU ct-mult bench in round 2).
    for B in list(range(1, 40)) + [63, 64, 65, 128, 133]:
        ptile, pad = fring.ptile_pad(B)
        total = B + pad
        assert total % ptile == 0
        assert ptile % 8 == 0 or ptile == total
        assert pad < 8
