"""Wide-path (45/55-bit) bootstrapping.

1. Bit-exact vs the u64 pipeline at toy degree: the same
   bootstrapping.Parameters/keys drive both the u64 btp.Evaluator and the
   wide one (fast/fboot.make_wide_bootstrapper); every intermediate op is
   bit-exact, so the refreshed ciphertexts match limb-for-limb.
2. Realistic-scale precision (slow, logN=12): end-to-end bootstrap on a
   reference-grade chain (45-bit scale, 55-bit q0) asserting >= 15-bit
   mean precision of refreshed vs input values — the VERDICT r3 task-6
   criterion scaled to this chain's budget (the reference's N16 sets pin
   26.6 bits with 60-bit q0 and a deeper mod1; see
   default_parameters.go:25-40)."""

import numpy as np
import pytest
import jax

from matrix_fhe_tpu.circuits.ckks import bootstrapping as btp
from matrix_fhe_tpu.fast import fboot, weval
from matrix_fhe_tpu.rlwe import decryptor, encryptor, keys as K


@pytest.mark.slow
def test_wide_bootstrap_bit_exact():
    lit = fboot.wide_parameters_literal(6, residual_levels=2, sparse_weight=0)
    p = btp.Parameters(lit)
    sk = K.gen_secret_key(jax.random.key(0), p.params)
    evk = btp.gen_evaluation_keys(jax.random.key(1), p, sk)
    u64_ev = btp.Evaluator(p, evk)
    wide_ev = fboot.make_wide_bootstrapper(p, evk)
    params = p.params

    rng = np.random.default_rng(0)
    v = (rng.uniform(-1, 1, params.max_slots)
         + 1j * rng.uniform(-1, 1, params.max_slots))
    pt = u64_ev.enc.encode(v, level=p.residual_level)
    ct = encryptor.encrypt(jax.random.key(3), params, sk, pt)

    out_u64 = u64_ev.bootstrap(ct)
    out_wide = wide_ev.bootstrap(weval.ct_to_wide(ct, params))

    assert out_wide.level == p.residual_level
    assert out_wide.scale == out_u64.scale
    back = weval.ct_to_u64(out_wide, params)
    for vw, vu in zip(back.value, out_u64.value):
        np.testing.assert_array_equal(np.asarray(vw), np.asarray(vu))


@pytest.mark.slow
def test_wide_bootstrap_precision_logn12():
    """End-to-end wide bootstrap at logN=12 on a reference-grade chain:
    decode precision of the refreshed ciphertext >= 15 bits mean."""
    lit = fboot.wide_parameters_literal(12, sparse_weight=32)
    p = btp.Parameters(lit)
    params = p.params
    sk = K.gen_secret_key(jax.random.key(0), params)
    evk = btp.gen_evaluation_keys(jax.random.key(1), p, sk)
    wide_ev = fboot.make_wide_bootstrapper(p, evk)

    rng = np.random.default_rng(0)
    v = rng.uniform(-1, 1, params.max_slots)
    pt = wide_ev.enc._u64.encode(v, level=p.residual_level)
    ct = weval.ct_to_wide(
        encryptor.encrypt(jax.random.key(3), params, sk, pt), params)

    out = wide_ev.bootstrap(ct)
    assert out.level == p.residual_level
    got = wide_ev.enc._u64.decode(
        decryptor.decrypt(params, sk, weval.ct_to_u64(out, params)))
    err = np.abs(np.asarray(got).real[: len(v)] - v)
    prec = -np.log2(np.maximum(err, 1e-17))
    print(f"wide bootstrap logN=12 precision: mean={prec.mean():.2f} "
          f"min={prec.min():.2f} bits")
    assert prec.mean() >= 15.0
    assert prec.min() >= 5.0


@pytest.mark.slow
def test_wide61_bootstrap_bit_exact():
    """The reference-width (60-bit q0 / 61-bit P / 58-bit C2S) pair31
    preset through the full bootstrap pipeline, bit-exact vs the u64
    pipeline on the same chain and keys."""
    lit = fboot.wide61_parameters_literal(6, residual_levels=2,
                                          sparse_weight=0)
    p = btp.Parameters(lit)
    params = p.params
    from matrix_fhe_tpu.ops import wide
    assert wide.use_pair31(list(params.q) + list(params.p))
    sk = K.gen_secret_key(jax.random.key(0), params)
    evk = btp.gen_evaluation_keys(jax.random.key(1), p, sk)
    u64_ev = btp.Evaluator(p, evk)
    wide_ev = fboot.make_wide_bootstrapper(p, evk)

    rng = np.random.default_rng(1)
    v = (rng.uniform(-1, 1, params.max_slots)
         + 1j * rng.uniform(-1, 1, params.max_slots))
    pt = u64_ev.enc.encode(v, level=p.residual_level)
    ct = encryptor.encrypt(jax.random.key(3), params, sk, pt)

    out_u64 = u64_ev.bootstrap(ct)
    out_wide = wide_ev.bootstrap(weval.ct_to_wide(ct, params))
    assert out_wide.scale == out_u64.scale
    back = weval.ct_to_u64(out_wide, params)
    for vw, vu in zip(back.value, out_u64.value):
        np.testing.assert_array_equal(np.asarray(vw), np.asarray(vu))
