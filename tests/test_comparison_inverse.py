"""Minimax sign/step/max/min + Goldschmidt inverse circuits.

Mirrors circuits/ckks/comparison/comparison_test.go and
circuits/ckks/inverse/inverse_test.go on insecure small-N parameters,
without a bootstrapper (enough levels provided instead).
"""

import numpy as np
import pytest
import jax

from matrix_fhe_tpu.circuits.ckks import comparison, inverse, minimax
from matrix_fhe_tpu.rlwe import decryptor, encryptor, keys as K
from matrix_fhe_tpu.schemes import ckks


@pytest.fixture(scope="module")
def ctx():
    params = ckks.new_parameters(ckks.CKKSParametersLiteral(
        logn=6, logq=(60,) + (45,) * 18, logp=(61, 61), log_default_scale=45))
    enc = ckks.Encoder(params)
    ks, kr, kg = jax.random.split(jax.random.key(0), 3)
    sk = K.gen_secret_key(ks, params)
    rlk = K.gen_relinearization_key(kr, params, sk)
    gks = K.gen_galois_keys(kg, params, sk, [params.galois_element_inverse()])
    ev = ckks.Evaluator(params, rlk=rlk, galois_keys=gks)
    mm = minimax.Evaluator(ev, enc)
    sign_poly = minimax.gen_minimax_composite_polynomial(4, 20, [7, 7])
    return params, enc, sk, ev, mm, sign_poly


def _enc(ctx, v, key=1):
    params, enc, sk = ctx[0], ctx[1], ctx[2]
    return encryptor.encrypt(jax.random.key(key), params, sk, enc.encode(v))


def _dec(ctx, ct):
    params, enc, sk = ctx[0], ctx[1], ctx[2]
    return np.real(enc.decode(decryptor.decrypt(params, sk, ct)))


def _sign_values(params, rng):
    v = rng.uniform(1 / 16, 1, params.max_slots)
    sgn = rng.choice([-1.0, 1.0], params.max_slots)
    return v * sgn


def test_sign_poly_plain(ctx):
    *_, sign_poly = ctx
    xs = np.linspace(1 / 16, 1, 50)
    for x in np.concatenate([xs, -xs]):
        y = x
        for p in sign_poly:
            y = p.evaluate(y).real
        assert abs(y - np.sign(x)) < 0.05, (x, y)


def test_sign(ctx):
    params, enc, sk, ev, mm, sign_poly = ctx
    rng = np.random.default_rng(1)
    v = _sign_values(params, rng)
    got = _dec(ctx, comparison.Evaluator(mm, sign_poly).sign(_enc(ctx, v, 2)))
    assert np.max(np.abs(got - np.sign(v))) < 0.1


def test_step(ctx):
    params, enc, sk, ev, mm, sign_poly = ctx
    rng = np.random.default_rng(2)
    v = _sign_values(params, rng)
    got = _dec(ctx, comparison.Evaluator(mm, sign_poly).step(_enc(ctx, v, 3)))
    assert np.max(np.abs(got - (np.sign(v) + 1) / 2)) < 0.1


def test_max_min(ctx):
    params, enc, sk, ev, mm, sign_poly = ctx
    rng = np.random.default_rng(3)
    a = rng.uniform(-0.5, 0.5, params.max_slots)
    b = rng.uniform(-0.5, 0.5, params.max_slots)
    # keep |a-b| >= 2^-4 so the sign is within its distinguishing precision
    mask = np.abs(a - b) < 1 / 16
    b[mask] = a[mask] + 1 / 8
    cmp = comparison.Evaluator(mm, sign_poly)
    got_max = _dec(ctx, cmp.max(_enc(ctx, a, 4), _enc(ctx, b, 5)))
    got_min = _dec(ctx, cmp.min(_enc(ctx, a, 6), _enc(ctx, b, 7)))
    assert np.max(np.abs(got_max - np.maximum(a, b))) < 0.05
    assert np.max(np.abs(got_min - np.minimum(a, b))) < 0.05


def test_goldschmidt_division(ctx):
    params, enc, sk, ev, mm, _ = ctx
    rng = np.random.default_rng(4)
    v = rng.uniform(0.25, 1.75, params.max_slots)  # in [min, 2-min], min=2^-2
    inv_ev = inverse.Evaluator(mm)
    got = _dec(ctx, inv_ev.goldschmidt_division(_enc(ctx, v, 8), -2.0))
    np.testing.assert_allclose(got, 1 / v, atol=1e-4)


def test_inverse_positive_domain(ctx):
    params, enc, sk, ev, mm, _ = ctx
    rng = np.random.default_rng(5)
    v = rng.uniform(0.3, 3.0, params.max_slots)
    inv_ev = inverse.Evaluator(mm)
    got = _dec(ctx, inv_ev.evaluate_positive_domain(_enc(ctx, v, 9), -2.0, 2.0))
    np.testing.assert_allclose(got, 1 / v, rtol=0.01, atol=0.01)
