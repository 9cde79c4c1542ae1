"""Wide-modulus (41-55-bit) pair/plane arithmetic: exactness vs Python ints.

Covers the Lattigo production prime shapes (45-bit 0x2000000a0001, 55-bit
0x80000000080001 — schemes/ckks/example_parameters.go:22-30) plus the
admissible-range edges, with adversarial operands (0, +-1, +-q/2, random).
"""

import numpy as np
import pytest

from matrix_fhe_tpu.ops import wide

MODULI = [
    0x2000000A0001,        # 45-bit Lattigo prime
    0x2000000E0001,        # 45-bit
    0x80000000080001,      # 55-bit (just above 2^55)
    (1 << 41) + 9,         # range bottom edge (not prime; arithmetic only)
    (3 << 54) - 59,        # range top edge
]


@pytest.fixture(scope="module")
def tabs():
    return wide.build_wide_tables(MODULI)


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
    # shift a by a multiple of q, capped so |value| stays within the pair
    # capacity of 2^56 (near the top-edge modulus the lazy margin shrinks)
    q = np.array(MODULI, dtype=np.int64)[:, None]
    shift = np.minimum(q, (1 << 55) + (1 << 54) - q // 2)
    v = a[..., 0, :, :] + (a[..., 1, :, :] << 25) + (shift // q) * q
    lo = ((v + (1 << 24)) % (1 << 25)) - (1 << 24)
    hi = (v - lo) >> 25
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


def test_mac_planes_depth8(tabs):
    """8 lazy MAC accumulations then one renormalization, exact."""
    import jax.numpy as jnp
    accum = None
    expect = np.zeros((len(MODULI), 256), dtype=object)
    for k in range(8):
        a64, b64 = _operands(100 + k), _operands(200 + k)
        a = jnp.asarray(wide.pack_pair(a64, MODULI))
        b = jnp.asarray(wide.pack_pair(b64, MODULI))
        pa = wide.pair_to_planes(a[..., 0, :, :], a[..., 1, :, :])
        pb = wide.pair_to_planes(b[..., 0, :, :], b[..., 1, :, :])
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
    v = c[..., 0, :, :] + (c[..., 1, :, :] << 25)
    q = np.array(MODULI, dtype=np.int64)[:, None]
    assert np.all(np.abs(v) <= q // 2 + 1)
