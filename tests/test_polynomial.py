"""Homomorphic polynomial evaluation (Paterson-Stockmeyer) + scalar ops.

Mirrors circuits/ckks/polynomial/polynomial_evaluator_test.go: evaluate a
Chebyshev approximation of a transcendental function on encrypted data and
compare against the plaintext model.
"""

import numpy as np
import pytest
import jax

from matrix_fhe_tpu.circuits import polynomial as poly_circ
from matrix_fhe_tpu.rlwe import decryptor, encryptor, keys as K
from matrix_fhe_tpu.schemes import ckks
from matrix_fhe_tpu.utils import bignum as bn


@pytest.fixture(scope="module")
def ctx():
    params = ckks.new_parameters(ckks.CKKSParametersLiteral(
        logn=6, logq=(55, 45, 45, 45, 45, 45), logp=(60,), log_default_scale=45))
    enc = ckks.Encoder(params)
    ks, kr = jax.random.split(jax.random.key(0))
    sk = K.gen_secret_key(ks, params)
    rlk = K.gen_relinearization_key(kr, params, sk)
    ev = ckks.Evaluator(params, rlk=rlk)
    return params, enc, sk, ev


def _enc(ctx, v, key=1):
    params, enc, sk, _ = ctx
    return encryptor.encrypt(jax.random.key(key), params, sk, enc.encode(v))


def _dec(ctx, ct):
    params, enc, sk, _ = ctx
    return enc.decode(decryptor.decrypt(params, sk, ct))


def test_scalar_ops(ctx):
    params, enc, sk, ev = ctx
    rng = np.random.default_rng(0)
    v = rng.uniform(-1, 1, params.max_slots) + 1j * rng.uniform(-1, 1, params.max_slots)
    ct = _enc(ctx, v)
    ckks.precision.assert_precision(v + (0.5 - 0.25j), _dec(ctx, ev.add_const(ct, 0.5 - 0.25j)), 20)
    ckks.precision.assert_precision(v - (1 + 1j), _dec(ctx, ev.sub_const(ct, 1 + 1j)), 20)
    got = _dec(ctx, ev.rescale(ev.mul_const_complex(ct, 0.5 + 2j)))
    ckks.precision.assert_precision(v * (0.5 + 2j), got, 18)


def test_power_basis_chebyshev(ctx):
    params, enc, sk, ev = ctx
    rng = np.random.default_rng(1)
    v = rng.uniform(-0.9, 0.9, params.max_slots) + 0j
    ct = _enc(ctx, v, 2)
    pb = poly_circ.PowerBasis(ct, bn.CHEBYSHEV)
    for n in (2, 3, 4, 7):
        pb.gen_power(n, ev)
    for n in (2, 3, 4, 7):
        got = _dec(ctx, pb.value[n])
        want = np.cos(n * np.arccos(np.real(v)))
        ckks.precision.assert_precision(want, got, 12)


def test_eval_chebyshev_sin(ctx):
    params, enc, sk, ev = ctx
    rng = np.random.default_rng(2)
    v = rng.uniform(-1, 1, params.max_slots) + 0j
    ct = _enc(ctx, v, 3)
    itv = bn.Interval(-1, 1, nodes=15)
    p = bn.chebyshev_approximation(lambda x: bn.sin(x), itv)
    out = poly_circ.evaluate(ev, enc, ct, p, params.default_scale)
    assert out.scale == params.default_scale
    got = _dec(ctx, out)
    ckks.precision.assert_precision(np.sin(np.real(v)), got, 13)


def test_eval_monomial_poly(ctx):
    params, enc, sk, ev = ctx
    rng = np.random.default_rng(3)
    v = rng.uniform(-1, 1, params.max_slots) + 0j
    ct = _enc(ctx, v, 4)
    coeffs = [0.25, -0.5, 1.0, 0.75, -0.25, 0.125, 1.0, -1.0]
    p = bn.Polynomial.from_values(bn.MONOMIAL, coeffs)
    p.is_odd = p.is_even = False
    out = poly_circ.evaluate(ev, enc, ct, p, params.default_scale)
    got = _dec(ctx, out)
    want = np.polyval(list(reversed(coeffs)), np.real(v))
    ckks.precision.assert_precision(want, got, 12)


def test_eval_polynomial_vector(ctx):
    """Vectorized evaluation: sin on even slots, cos on odd slots
    (examples/singleparty/ckks_vectorized_polynomial_evaluation/main.go)."""
    params, enc, sk, ev = ctx
    rng = np.random.default_rng(5)
    v = rng.uniform(-1, 1, params.max_slots) + 0j
    ct = _enc(ctx, v, 5)
    itv = bn.Interval(-1, 1, nodes=15)
    p_sin = bn.chebyshev_approximation(lambda x: bn.sin(x), itv)
    p_cos = bn.chebyshev_approximation(lambda x: bn.cos(x), itv)
    even = list(range(0, params.max_slots, 2))
    odd = list(range(1, params.max_slots, 2))
    polys = poly_circ.PolynomialVector(value=[p_sin, p_cos],
                                       mapping={0: even, 1: odd})
    out = poly_circ.evaluate(ev, enc, ct, polys, params.default_scale)
    assert out.scale == params.default_scale
    got = _dec(ctx, out)
    want = np.where(np.arange(params.max_slots) % 2 == 0,
                    np.sin(np.real(v)), np.cos(np.real(v)))
    ckks.precision.assert_precision(want, got, 13)


def test_polynomial_vector_partial_mapping(ctx):
    """Unmapped slots evaluate to ~0; mismatched bases rejected."""
    params, enc, sk, ev = ctx
    rng = np.random.default_rng(6)
    v = rng.uniform(-1, 1, params.max_slots) + 0j
    ct = _enc(ctx, v, 6)
    coeffs = [0.5, -1.0, 0.25, 0.75]
    p = bn.Polynomial.from_values(bn.MONOMIAL, coeffs)
    p.is_odd = p.is_even = False
    half = list(range(params.max_slots // 2))
    polys = poly_circ.PolynomialVector(value=[p], mapping={0: half})
    out = poly_circ.evaluate(ev, enc, ct, polys, params.default_scale)
    got = _dec(ctx, out)
    want = np.polyval(list(reversed(coeffs)), np.real(v))
    want[params.max_slots // 2:] = 0
    ckks.precision.assert_precision(want, got, 12)

    with pytest.raises(ValueError):
        poly_circ.PolynomialVector(
            value=[p, bn.Polynomial.from_values(bn.CHEBYSHEV, coeffs,
                                                interval=bn.Interval(-1, 1))],
            mapping={0: [0], 1: [1]})
    with pytest.raises(ValueError):
        poly_circ.PolynomialVector(value=[p, p], mapping={0: [0, 1], 1: [1]})
