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


@pytest.mark.slow
def test_bootstrap_many_pairs(ctx):
    """BootstrapMany (evaluator.go:263-344): two real-payload cts packed as
    one complex ct through a single pipeline run."""
    p, sk, ev = ctx
    params = p.params
    enc = ev.enc

    rng = np.random.default_rng(2)
    va = rng.uniform(-1, 1, params.max_slots) + 0j
    vb = rng.uniform(-1, 1, params.max_slots) + 0j
    cts = []
    for i, v in enumerate((va, vb)):
        pt = enc.encode(v, level=p.residual_level)
        cts.append(encryptor.encrypt(jax.random.key(10 + i), params, sk, pt))

    outs = ev.bootstrap_many(cts)
    assert len(outs) == 2
    for v, out in zip((va, vb), outs):
        got = enc.decode(decryptor.decrypt(params, sk, out))
        ckks.precision.assert_precision(v, got, 9)


@pytest.mark.slow
def test_meta_bts_iterations(ctx):
    """META-BTS (evaluator.go:345-493): a second iteration must beat the
    single-shot bootstrap precision."""
    p, sk, ev = ctx
    params = p.params
    enc = ev.enc

    rng = np.random.default_rng(3)
    v = rng.uniform(-1, 1, params.max_slots) + 0j
    pt = enc.encode(v, level=p.residual_level)
    ct = encryptor.encrypt(jax.random.key(20), params, sk, pt)

    out1 = ev.evaluate(ct, iterations=1)
    out2 = ev.evaluate(ct, iterations=2, reserved_bits=10)

    got1 = enc.decode(decryptor.decrypt(params, sk, out1))
    got2 = enc.decode(decryptor.decrypt(params, sk, out2))
    err1 = float(np.max(np.abs(got1 - v)))
    err2 = float(np.max(np.abs(got2 - v)))
    assert err2 < err1, (err1, err2)
    ckks.precision.assert_precision(v, got2, 12)


def test_secret_key_bootstrapper(ctx):
    """sk_bootstrapper.go:11-69: ideal decrypt-reencrypt stand-in."""
    p, sk, ev = ctx
    params = p.params
    enc = ev.enc

    rng = np.random.default_rng(4)
    v = rng.uniform(-1, 1, params.max_slots) + 1j * rng.uniform(-1, 1, params.max_slots)
    pt = enc.encode(v, level=0)
    ct = encryptor.encrypt(jax.random.key(30), params, sk, pt)

    skb = btp.SecretKeyBootstrapper(params, sk)
    out = skb.bootstrap(ct)
    assert out.level == params.max_level
    assert skb.counter == 1
    got = enc.decode(decryptor.decrypt(params, sk, out))
    ckks.precision.assert_precision(v, got, 20)


def test_default_parameter_presets():
    """default_parameters.go:20-195: curated presets assemble consistently."""
    for name, lit in btp.DEFAULT_PARAMETERS.items():
        assert lit.log_n >= 12, name
    # assembling the smallest preset's chain layout must satisfy the level
    # budget invariant checked in Parameters.__init__
    p = btp.Parameters(btp.N12_TEST)
    assert p.residual_level == len(btp.N12_TEST.residual_log_q) - 1


@pytest.mark.slow
def test_bootstrap_sparse_secret_encapsulation():
    """Sparse-secret encapsulation (keys.go EvkDenseToSparse/SparseToDense):
    the ModUp raise runs under an ephemeral Hamming-weight-h key."""
    lit = btp.ParametersLiteral(
        log_n=6,
        residual_log_q=(55, 45),
        log_p=(61, 61),
        c2s_log_q=(56, 56, 56),
        s2c_log_q=(45, 45, 45),
        mod1_log_q=60,
        log_message_ratio=8,
        log_default_scale=45,
        ephemeral_secret_weight=8,
    )
    p = btp.Parameters(lit)
    sk = K.gen_secret_key(jax.random.key(40), p.params)
    evk = btp.gen_evaluation_keys(jax.random.key(41), p, sk)
    assert evk.evk_dense_to_sparse is not None
    assert evk.evk_sparse_to_dense is not None
    ev = btp.Evaluator(p, evk)

    params = p.params
    enc = ev.enc
    rng = np.random.default_rng(42)
    v = rng.uniform(-1, 1, params.max_slots) + 0j
    pt = enc.encode(v, level=p.residual_level)
    ct = encryptor.encrypt(jax.random.key(43), params, sk, pt)

    out = ev.bootstrap(ct)
    assert out.level == p.residual_level
    got = enc.decode(decryptor.decrypt(params, sk, out))
    ckks.precision.assert_precision(v, got, 9)
