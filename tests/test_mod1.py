"""Homomorphic x mod 1 (EvalMod core).

Mirrors circuits/ckks/mod1/mod1_evaluator_test.go: encrypt values of the
form round(U)*Q + u (Q = qDiff * messageRatio), normalize, EvalMod, compare
against the plaintext sine model.
"""

import math

import numpy as np
import pytest
import jax

from matrix_fhe_tpu.circuits.ckks import mod1
from matrix_fhe_tpu.rlwe import decryptor, encryptor, keys as K
from matrix_fhe_tpu.schemes import ckks


@pytest.fixture(scope="module")
def ctx():
    params = ckks.new_parameters(ckks.CKKSParametersLiteral(
        logn=6, logq=(55,) + (60,) * 10, logp=(61, 61), log_default_scale=45))
    enc = ckks.Encoder(params)
    ks, kr = jax.random.split(jax.random.key(0))
    sk = K.gen_secret_key(ks, params)
    rlk = K.gen_relinearization_key(kr, params, sk)
    ev = ckks.Evaluator(params, rlk=rlk)
    return params, enc, sk, ev


def _evaluate_mod1(ctx, lit: mod1.ParametersLiteral, min_bits: float):
    params, enc, sk, ev = ctx
    m1p = mod1.new_parameters_from_literal(params, lit)

    rng = np.random.default_rng(5)
    K_ = m1p.k - 1
    Q = m1p.q_diff * m1p.message_ratio
    values = np.round(rng.uniform(-K_, K_, params.max_slots)) * Q \
        + rng.uniform(-1, 1, params.max_slots)
    values[0] = K_ * Q + 0.5

    ct = encryptor.encrypt(jax.random.key(3), params, sk, enc.encode(values))

    # Scale the message to Delta = Q/MessageRatio (test :140-149)
    scale = math.exp2(round(math.log2(params.q[0] / m1p.message_ratio)))
    ct = ev.scale_up(ct, round(scale / float(ct.scale)))
    scale2 = float(m1p.scaling_factor) / float(ct.scale) / m1p.message_ratio
    ct = ev.scale_up(ct, round(scale2))

    # Normalization to the Chebyshev variable
    ct = ev.rescale(ev.mul_const(ct, 1.0 / (m1p.k * m1p.q_diff)))

    out = mod1.Evaluator(ev, enc, m1p).evaluate(ct)
    got = np.real(enc.decode(decryptor.decrypt(params, sk, out)))

    x = values / m1p.message_ratio / m1p.q_diff
    x = np.sin(2 * np.pi * x)
    if lit.mod1_inv_degree > 0:
        x = np.arcsin(x)
    want = x * m1p.message_ratio * m1p.q_diff / (2 * np.pi)
    ckks.precision.assert_precision(want, got, min_bits)


def test_cos_continuous(ctx):
    _evaluate_mod1(ctx, mod1.ParametersLiteral(
        level_q=9, log_scale=60, mod1_type=mod1.COS_CONTINUOUS,
        log_message_ratio=4, k=16, mod1_degree=46, double_angle=2), 8)


def test_sin_continuous_arcsine(ctx):
    _evaluate_mod1(ctx, mod1.ParametersLiteral(
        level_q=9, log_scale=60, mod1_type=mod1.SIN_CONTINUOUS,
        log_message_ratio=8, k=8, mod1_degree=63,
        mod1_inv_degree=7), 8)


def test_cos_discrete(ctx):
    _evaluate_mod1(ctx, mod1.ParametersLiteral(
        level_q=9, log_scale=60, mod1_type=mod1.COS_DISCRETE,
        log_message_ratio=8, k=12, mod1_degree=30, double_angle=3), 8)
