"""pair31 (6-plane, 56-61-bit) wide arithmetic: exactness vs Python ints.

Covers the reference's bootstrapping-grade prime widths — 61-bit P, 60-bit
q0/EvalMod, 56-bit CoeffsToSlots primes
(circuits/ckks/bootstrapping/default_parameters.go:25-40) — which exceed
the pair25 capacity of 1.5*2^55, plus mixed chains (45-bit scale primes in
a pair31 context) and the range edges.
"""

import numpy as np
import pytest

from matrix_fhe_tpu.ops import modmath as mm, rings, wide, wide_ntt
from matrix_fhe_tpu.utils import primes as pr

N2 = 1 << 15  # NTT-friendliness order for prime generation (logN=14 shape)

MODULI = [
    pr.NTTFriendlyPrimesGenerator(61, N2).next_alternating_prime(),  # ~2^61 P
    pr.NTTFriendlyPrimesGenerator(60, N2).next_alternating_prime(),  # ~2^60 q0
    pr.NTTFriendlyPrimesGenerator(56, N2).next_alternating_prime(),  # C2S
    0x2000000A0001,        # 45-bit scale prime in a pair31 chain
    (1 << 41) + 9,         # range bottom edge (not prime; arithmetic only)
    (1 << 61) - 59,        # range top edge
]


@pytest.fixture(scope="module")
def tabs():
    t = wide.build_wide_tables(MODULI)
    assert t.nplanes == 6 and t.shift == 31  # the mode rule picked pair31
    return t


def _operands(seed: int, n: int = 256):
    """uint64 [L, N] canonical operands incl. adversarial edge values."""
    rng = np.random.default_rng(seed)
    L = len(MODULI)
    x = np.empty((L, n), dtype=np.uint64)
    for i, q in enumerate(MODULI):
        v = rng.integers(0, q, n, dtype=np.uint64)
        v[:8] = [0, 1, q - 1, q // 2, q // 2 + 1, q - 2, 2, (q + 1) // 2]
        x[i] = v
    return x


def _check_exact(pair, expect, msg):
    got = wide.unpack_pair(np.asarray(pair), MODULI)
    np.testing.assert_array_equal(got, expect, err_msg=msg)


def test_mode_rule():
    assert wide.use_pair31(MODULI)
    assert not wide.use_pair31([0x2000000A0001, 0x80000000080001])
    with pytest.raises(ValueError):
        wide.build_wide_tables([(1 << 61) + (1 << 55)])  # above capacity
    with pytest.raises(ValueError):
        wide.build_wide_tables([(1 << 56) + 5], pair31=False)


def test_pack_unpack_roundtrip():
    x = _operands(0)
    np.testing.assert_array_equal(
        wide.unpack_pair(wide.pack_pair(x, MODULI), MODULI), x)


def test_add_sub_neg(tabs):
    a64, b64 = _operands(1), _operands(2)
    a = wide.pack_pair(a64, MODULI)
    b = wide.pack_pair(b64, MODULI)
    q = np.array(MODULI, dtype=np.uint64)[:, None]
    _check_exact(wide.add(tabs, a, b), (a64 + b64) % q, "add")
    _check_exact(wide.sub(tabs, a, b), (a64 + q - b64) % q, "sub")
    _check_exact(wide.neg(tabs, a), (q - a64) % q, "neg")


def test_mulmod(tabs):
    a64, b64 = _operands(3), _operands(4)
    a = wide.pack_pair(a64, MODULI)
    b = wide.pack_pair(b64, MODULI)
    expect = np.empty_like(a64)
    for i, q in enumerate(MODULI):
        expect[i] = [(int(x) * int(y)) % q
                     for x, y in zip(a64[i], b64[i])]
    _check_exact(wide.mulmod(tabs, a, b), expect, "mulmod")


def test_mulmod_lazy_inputs(tabs):
    """mulmod accepts non-canonical (lazy, ~2q-magnitude) pair inputs."""
    a64, b64 = _operands(5), _operands(6)
    a = wide.pack_pair(a64, MODULI).astype(np.int64)
    # shift a by a multiple of q, capped so |value| stays within the pair31
    # capacity of 2^62 (near the top-edge modulus the lazy margin shrinks)
    q = np.array(MODULI, dtype=np.int64)[:, None]
    shift = np.minimum(q, (1 << 61) + (1 << 60) - q // 2)
    v = a[..., 0, :, :] + (a[..., 1, :, :] << 31) + (shift // q) * q
    lo = ((v + (1 << 30)) % (1 << 31)) - (1 << 30)
    hi = (v - lo) >> 31
    a_lazy = np.stack([lo, hi], axis=-3).astype(np.int32)
    b = wide.pack_pair(b64, MODULI)
    expect = np.empty_like(a64)
    for i, qi in enumerate(MODULI):
        expect[i] = [(int(x) * int(y)) % qi
                     for x, y in zip(a64[i], b64[i])]
    _check_exact(wide.mulmod(tabs, a_lazy, b), expect, "mulmod lazy")


def test_mulmod_planes_scalar(tabs):
    a64 = _operands(7)
    a = wide.pack_pair(a64, MODULI)
    consts = [pow(3, 40, q) for q in MODULI]
    cp = wide.const_planes(tabs, consts)
    expect = np.empty_like(a64)
    for i, q in enumerate(MODULI):
        expect[i] = [(int(x) * consts[i]) % q for x in a64[i]]
    _check_exact(wide.mulmod_planes(tabs, a, cp), expect, "mulmod_planes")


def test_mac_planes_period(tabs):
    """mac_period(=4 in pair31) lazy MACs then one renormalization, exact."""
    import jax.numpy as jnp
    period = wide.mac_period(tabs)
    assert period == 4
    accum = None
    expect = np.zeros((len(MODULI), 256), dtype=object)
    for k in range(period):
        a64, b64 = _operands(100 + k), _operands(200 + k)
        a = jnp.asarray(wide.pack_pair(a64, MODULI))
        b = jnp.asarray(wide.pack_pair(b64, MODULI))
        pa = wide.pair_to_planes(a[..., 0, :, :], a[..., 1, :, :], tabs)
        pb = wide.pair_to_planes(b[..., 0, :, :], b[..., 1, :, :], tabs)
        accum = wide.mac_planes(accum, pa, pb, tabs)
        expect += a64.astype(object) * b64.astype(object)
    p = wide.fold_excess(accum, tabs)
    lo, hi = wide.planes_to_pair(p, tabs)
    got = wide.unpack_pair(np.stack([np.asarray(lo), np.asarray(hi)],
                                    axis=-3), MODULI)
    q = np.array(MODULI, dtype=object)[:, None]
    np.testing.assert_array_equal(got.astype(object), expect % q)


def test_canon_bounds(tabs):
    a64 = _operands(8)
    a = wide.pack_pair(a64, MODULI)
    c = np.asarray(wide.canon(tabs, wide.add(tabs, a, a))).astype(np.int64)
    v = c[..., 0, :, :] + (c[..., 1, :, :] << 31)
    q = np.array(MODULI, dtype=np.int64)[:, None]
    assert np.all(np.abs(v) <= q // 2 + 1)


def test_center_lift(tabs):
    """Reference-convention centered lift at 61-bit (single-limb tables)."""
    import jax.numpy as jnp
    q = MODULI[0]
    t1 = tabs.limb_slice(slice(0, 1))
    a64 = _operands(9)[:1]
    a = jnp.asarray(wide.pack_pair(a64, [q]))
    lo, hi = wide.center_lift(t1, a[..., 0, 0, :], a[..., 1, 0, :])
    v = np.asarray(lo).astype(np.int64) + (np.asarray(hi).astype(np.int64)
                                           << 31)
    want = np.where(a64[0] >= (q - 1) >> 1,
                    a64[0].astype(np.int64) - q, a64[0].astype(np.int64))
    np.testing.assert_array_equal(v, want)


@pytest.mark.parametrize("n,bits", [(256, 60), (256, 61), (1024, 56)])
def test_wide61_ntt_matches_u64_path(n, bits):
    moduli = pr.NTTFriendlyPrimesGenerator(bits, 2 * n).next_alternating_primes(2)
    moduli.append(pr.NTTFriendlyPrimesGenerator(45, 2 * n)
                  .next_alternating_prime())  # mixed 45-bit limb
    ring = rings.new_ring(n, moduli, rings.STANDARD)
    tabs = wide_ntt.build_tables(n, moduli)
    assert tabs.wt.nplanes == 6

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


def test_wide61_ntt_extreme_values():
    """All coefficients at q-1 / q/2 boundaries (worst-case digits)."""
    n = 256
    moduli = [pr.NTTFriendlyPrimesGenerator(61, 2 * n).next_alternating_prime(),
              pr.NTTFriendlyPrimesGenerator(60, 2 * n).next_alternating_prime()]
    ring = rings.new_ring(n, moduli, rings.STANDARD)
    tabs = wide_ntt.build_tables(n, moduli)
    x = np.stack([np.full(n, q - 1, dtype=np.uint64) for q in moduli])
    x[:, ::2] = np.array([q // 2 for q in moduli], dtype=np.uint64)[:, None]
    want = np.asarray(ring.ntt(mm.u64(x)))
    got = wide.unpack_pair(
        np.asarray(wide_ntt.ntt_fwd(wide.pack_pair(x, moduli), tabs)), moduli)
    np.testing.assert_array_equal(got, want)
