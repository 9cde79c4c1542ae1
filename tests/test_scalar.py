"""RNS scalar ops (ring/scalar.go) and Lagrange interpolation
(ring/interpolation.go) parity tests."""

import numpy as np

from matrix_fhe_tpu.ops import scalar as sc
from matrix_fhe_tpu.utils.bignum import lagrange_interpolation

MODULI = [(1 << 45) - 91, (1 << 45) - 619, (1 << 46) - 1959]


def test_rns_scalar_roundtrip():
    big_q = 1
    for q in MODULI:
        big_q *= q
    rng = np.random.default_rng(0)
    for _ in range(10):
        v = int(rng.integers(0, 1 << 62)) * int(rng.integers(0, 1 << 62))
        s = sc.from_bigint(MODULI, v)
        assert sc.to_bigint(MODULI, s) == v % big_q


def test_rns_scalar_arith():
    a_i, b_i = 0xdeadbeefcafebabe, 0x123456789abcdef
    a, b = sc.from_bigint(MODULI, a_i), sc.from_bigint(MODULI, b_i)
    assert sc.to_bigint(MODULI, sc.add(MODULI, a, b)) == a_i + b_i
    assert sc.to_bigint(MODULI, sc.sub(MODULI, a, b)) == a_i - b_i
    assert sc.to_bigint(MODULI, sc.mul(MODULI, a, b)) == a_i * b_i
    big_q = 1
    for q in MODULI:
        big_q *= q
    assert sc.to_bigint(MODULI, sc.neg(MODULI, a)) == big_q - a_i
    inv = sc.inverse(MODULI, a)
    assert all(int(x) * (a_i % q) % q == 1 for x, q in zip(inv, MODULI))
    mf = sc.mform(MODULI, a)
    assert all(int(x) == (a_i << 64) % q for x, q in zip(mf, MODULI))


def test_lagrange_interpolation():
    from decimal import Decimal
    xs = [-2, -1, 0, 1, 2]
    poly = lambda x: 3 - 2 * x + x**3 - x**4
    c = lagrange_interpolation(xs, [poly(x) for x in xs])
    expect = [3, -2, 0, 1, -1]
    for got, want in zip(c, expect):
        assert abs(got - Decimal(want)) < Decimal("1e-30"), (got, want)
