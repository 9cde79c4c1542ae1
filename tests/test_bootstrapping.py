"""CKKS bootstrapping end-to-end (insecure small-N parameters).

Mirrors circuits/ckks/bootstrapping/bootstrapping_test.go: encrypt, consume
levels, bootstrap, verify the refreshed ciphertext decrypts to the same
values at the top residual level.
"""

import numpy as np
import pytest
import jax

from matrix_fhe_tpu.circuits.ckks import bootstrapping as btp
from matrix_fhe_tpu.rlwe import decryptor, encryptor, keys as K
from matrix_fhe_tpu.schemes import ckks


@pytest.fixture(scope="module")
def ctx():
    lit = btp.ParametersLiteral(
        log_n=6,
        residual_log_q=(55, 45),
        log_p=(61, 61),
        c2s_log_q=(56, 56, 56),
        s2c_log_q=(45, 45, 45),
        mod1_log_q=60,
        log_message_ratio=8,
        log_default_scale=45,
    )
    p = btp.Parameters(lit)
    sk = K.gen_secret_key(jax.random.key(0), p.params)
    evk = btp.gen_evaluation_keys(jax.random.key(1), p, sk)
    ev = btp.Evaluator(p, evk)
    return p, sk, ev


def test_bootstrap_dense(ctx):
    p, sk, ev = ctx
    params = p.params
    enc = ev.enc

    rng = np.random.default_rng(0)
    v = rng.uniform(-1, 1, params.max_slots) + 1j * rng.uniform(-1, 1, params.max_slots)

    # Encrypt at the lowest usable (residual) level, as if levels were spent.
    pt = enc.encode(v, level=p.residual_level)
    ct = encryptor.encrypt(jax.random.key(3), params, sk, pt)
    assert ct.level == p.residual_level

    out = ev.bootstrap(ct)
    assert out.level == p.residual_level, out.level
    assert out.level > 0 or p.residual_level == 0

    got = enc.decode(decryptor.decrypt(params, sk, out))
    ckks.precision.assert_precision(v, got, 10)


def test_bootstrap_consumed_then_reuse(ctx):
    """After bootstrap the ciphertext supports further multiplications."""
    p, sk, ev = ctx
    params = p.params
    enc = ev.enc

    rng = np.random.default_rng(1)
    v = rng.uniform(-0.5, 0.5, params.max_slots) + 0j
    pt = enc.encode(v, level=p.residual_level)
    ct = encryptor.encrypt(jax.random.key(5), params, sk, pt)

    out = ev.bootstrap(ct)
    # one multiplication on the refreshed ct
    out2 = ev.ev.rescale(ev.ev.mul_relin(out, out))
    got = enc.decode(decryptor.decrypt(params, sk, out2))
    ckks.precision.assert_precision(v * v, got, 8)
