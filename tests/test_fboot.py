"""Fast-path (int32) bootstrapping: bit-exact vs the u64 pipeline.

The same bootstrapping.Parameters/keys drive both the u64 btp.Evaluator and
the fast one (fast/fboot.py, FastEvaluator injected); on the same word-size-
reduced chain every intermediate op is bit-exact, so the refreshed
ciphertexts must match limb-for-limb (VERDICT r3 task 1 done-criterion).

Precision: single-prime (~2^22) logical levels leave only ~5 bits of message
budget through EvalMod (22 - log ratio - log K - noise), so this chain's
refreshed precision is NOT asserted here — reference-grade precision needs
45-bit scales, which the wide-modulus path provides (test_wboot.py carries
the precision assertions).
"""

import numpy as np
import pytest
import jax

from matrix_fhe_tpu.circuits.ckks import bootstrapping as btp
from matrix_fhe_tpu.fast import fboot, feval
from matrix_fhe_tpu.rlwe import encryptor, keys as K


@pytest.fixture(scope="module")
def ctx():
    lit = fboot.fast_parameters_literal(6, residual_levels=2, sparse_weight=0)
    p = btp.Parameters(lit)
    sk = K.gen_secret_key(jax.random.key(0), p.params)
    evk = btp.gen_evaluation_keys(jax.random.key(1), p, sk)
    u64_ev = btp.Evaluator(p, evk)
    fast_ev = fboot.make_fast_bootstrapper(p, evk)
    return p, sk, u64_ev, fast_ev


def test_fast_bootstrap_bit_exact(ctx):
    p, sk, u64_ev, fast_ev = ctx
    params = p.params
    enc = u64_ev.enc

    rng = np.random.default_rng(0)
    v = (rng.uniform(-1, 1, params.max_slots)
         + 1j * rng.uniform(-1, 1, params.max_slots))
    pt = enc.encode(v, level=p.residual_level)
    ct = encryptor.encrypt(jax.random.key(3), params, sk, pt)

    out_u64 = u64_ev.bootstrap(ct)
    out_fast = fast_ev.bootstrap(feval.ct_to_fast(ct))

    assert out_fast.level == p.residual_level
    assert out_fast.scale == out_u64.scale
    for vf, vu in zip(out_fast.value, out_u64.value):
        np.testing.assert_array_equal(np.asarray(feval.to_uint64(vf)),
                                      np.asarray(vu))


@pytest.mark.slow
def test_fast_bootstrap_sparse_encapsulation_bit_exact():
    """Sparse-secret encapsulation path (keys.go EvkDenseToSparse /
    EvkSparseToDense) through the fast pipeline, vs u64."""
    lit = fboot.fast_parameters_literal(6, residual_levels=2, sparse_weight=8)
    p = btp.Parameters(lit)
    sk = K.gen_secret_key(jax.random.key(0), p.params)
    evk = btp.gen_evaluation_keys(jax.random.key(1), p, sk)
    assert evk.evk_dense_to_sparse is not None
    u64_ev = btp.Evaluator(p, evk)
    fast_ev = fboot.make_fast_bootstrapper(p, evk)
    params = p.params

    rng = np.random.default_rng(2)
    v = rng.uniform(-1, 1, params.max_slots) + 0j
    pt = u64_ev.enc.encode(v, level=p.residual_level)
    ct = encryptor.encrypt(jax.random.key(3), params, sk, pt)
    out_u64 = u64_ev.bootstrap(ct)
    out_fast = fast_ev.bootstrap(feval.ct_to_fast(ct))
    for vf, vu in zip(out_fast.value, out_u64.value):
        np.testing.assert_array_equal(np.asarray(feval.to_uint64(vf)),
                                      np.asarray(vu))
