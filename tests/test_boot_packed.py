"""Packed sparse batch bootstrap: 2 ciphertexts through ONE pipeline pass.

The equal-degree analogue of the reference's PackAndSwitchN1ToN2 /
UnpackAndSwitch batch bootstrap (bootstrapping/evaluator.go:880-1065):
payloads replicated 2x over the slots (coefficients on even indices) are
coefficient-interleaved by ring packing, refreshed once, and expanded back.
Each refreshed output must decode to its own original payload."""

import numpy as np
import pytest
import jax

from matrix_fhe_tpu.circuits.ckks import bootstrapping as btp
from matrix_fhe_tpu.fast import fboot
from matrix_fhe_tpu.rlwe import decryptor, encryptor, keys as K


@pytest.mark.slow
def test_bootstrap_packed_two():
    lit = fboot.wide_parameters_literal(6, residual_levels=2, sparse_weight=0)
    p = btp.Parameters(lit)
    params = p.params
    sk = K.gen_secret_key(jax.random.key(0), params)
    evk = btp.gen_evaluation_keys(jax.random.key(1), p, sk)
    # extra galois keys for the pack / partial-expand trees
    extra = [g for g in btp.galois_elements_for_packed_bootstrap(params, 2)
             if g not in evk.gks]
    evk.gks.update(K.gen_galois_keys(jax.random.key(2), params, sk, extra))
    ev = btp.Evaluator(p, evk)

    rng = np.random.default_rng(0)
    half = params.max_slots // 2
    va = rng.uniform(-1, 1, half)
    vb = rng.uniform(-1, 1, half)
    # 2x-replicated slot payloads -> coefficients on even indices
    cta = encryptor.encrypt(jax.random.key(3), params, sk,
                            ev.enc.encode(np.tile(va, 2),
                                          level=p.residual_level))
    ctb = encryptor.encrypt(jax.random.key(4), params, sk,
                            ev.enc.encode(np.tile(vb, 2),
                                          level=p.residual_level))

    outs = ev.bootstrap_packed([cta, ctb])
    assert len(outs) == 2
    for out, v in zip(outs, (va, vb)):
        assert out.level == p.residual_level
        got = ev.enc.decode(decryptor.decrypt(params, sk, out))
        err = np.abs(np.asarray(got).real[:half] - v)
        prec = -np.log2(np.maximum(err.max(), 1e-17))
        assert prec > 8, f"packed refresh precision {prec:.1f} bits"


@pytest.mark.slow
def test_bootstrap_sparse_cross_degree():
    """True PackAndSwitchN1ToN2: two degree-N/2 ciphertexts refresh through
    one degree-N pipeline pass and return to degree N/2
    (bootstrapping/evaluator.go:880-1065 with genuine N1 < N2)."""
    from matrix_fhe_tpu.rlwe import ring_switch as rs
    from matrix_fhe_tpu.schemes import ckks

    lit = fboot.wide_parameters_literal(6, residual_levels=2, sparse_weight=0)
    p = btp.Parameters(lit)
    params = p.params
    sk = K.gen_secret_key(jax.random.key(0), params)
    evk = btp.gen_evaluation_keys(jax.random.key(1), p, sk)
    extra = [g for g in btp.galois_elements_for_packed_bootstrap(params, 2)
             if g not in evk.gks]
    evk.gks.update(K.gen_galois_keys(jax.random.key(2), params, sk, extra))
    ev = btp.Evaluator(p, evk)

    params_small = ckks.new_parameters(ckks.CKKSParametersLiteral(
        logn=params.log_n - 1, q=tuple(params.q), p=tuple(params.p),
        log_default_scale=lit.log_default_scale))
    sk_small = K.gen_secret_key(jax.random.key(5), params_small)
    evk_up, evk_down = rs.gen_ring_swap_keys(
        jax.random.key(6), params_small, params, sk_small, sk)
    enc_small = ckks.Encoder(params_small)

    rng = np.random.default_rng(0)
    ns = params_small.max_slots
    va = rng.uniform(-1, 1, ns)
    vb = rng.uniform(-1, 1, ns)
    cta = encryptor.encrypt(jax.random.key(3), params_small, sk_small,
                            enc_small.encode(va, level=p.residual_level))
    ctb = encryptor.encrypt(jax.random.key(4), params_small, sk_small,
                            enc_small.encode(vb, level=p.residual_level))

    outs = ev.bootstrap_sparse([cta, ctb], params_small, evk_up, evk_down)
    assert len(outs) == 2
    for out, v in zip(outs, (va, vb)):
        assert out.level == p.residual_level
        got = enc_small.decode(decryptor.decrypt(params_small, sk_small, out))
        err = np.abs(np.asarray(got).real[:ns] - v)
        prec = -np.log2(np.maximum(err.max(), 1e-17))
        assert prec > 7, f"sparse cross-degree refresh precision {prec:.1f}"
