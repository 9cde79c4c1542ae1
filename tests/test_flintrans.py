"""Fast-path double-hoisted BSGS lintrans: bit-exact vs the u64 evaluator."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from matrix_fhe_tpu.circuits import lintrans as lt
from matrix_fhe_tpu.circuits.ckks import lintrans as ckks_lt
from matrix_fhe_tpu.fast import fckks, flintrans, fring
from matrix_fhe_tpu.rlwe import decryptor, encryptor, keys as K
from matrix_fhe_tpu.schemes import ckks


DIAGS = [-15, -4, -1, 0, 1, 2, 3, 4, 15]


@pytest.fixture(scope="module")
def setup():
    logn, lq, lp = 8, 6, 2
    n = 1 << logn
    moduli = fring.find_fast_primes(n, lq + lp)
    params = ckks.new_parameters(ckks.CKKSParametersLiteral(
        logn=logn, q=tuple(moduli[:lq]), p=tuple(moduli[lq:]),
        log_default_scale=40))
    enc = ckks.Encoder(params)
    ks, kr, ke = jax.random.split(jax.random.key(0), 3)
    sk = K.gen_secret_key(ks, params)
    rlk = K.gen_relinearization_key(kr, params, sk)

    slots = params.max_slots
    rng = np.random.default_rng(5)
    diags = {k: rng.uniform(-1, 1, slots) + 1j * rng.uniform(-1, 1, slots)
             for k in DIAGS}
    v = rng.uniform(-1, 1, slots) + 1j * rng.uniform(-1, 1, slots)

    ltp = lt.LinearTransformationParameters(
        diagonals_index_list=list(diags.keys()), level_q=params.max_level,
        level_p=params.max_level_p, scale=params.default_scale,
        log_dimensions=(0, params.log_max_slots), log_bsgs_ratio=0)
    transform = ckks_lt.new_linear_transformation(enc, diags, ltp)
    assert transform.n1 > 0  # BSGS path

    gels = lt.galois_elements(params, list(diags.keys()), slots, 0)
    gks = K.gen_galois_keys(jax.random.key(7), params, sk, gels)

    ct = encryptor.encrypt(ke, params, sk, enc.encode(v))
    fctx = fckks.make_context(params, rlk, gks=gks)
    flt = flintrans.convert_lintrans(params, transform)
    return params, enc, sk, gks, transform, flt, fctx, ct, diags, v


def _i32(v):
    return jnp.asarray(np.asarray(v).astype(np.int64).astype(np.int32))


def test_matvec_bsgs_matches_u64(setup):
    params, enc, sk, gks, transform, flt, fctx, ct, diags, v = setup
    want = lt.evaluate(params, ct, transform, gks)
    got0, got1 = flintrans.matvec_bsgs(
        fctx, flt, _i32(ct.value[0]), _i32(ct.value[1]),
        params.galois_element)
    np.testing.assert_array_equal(np.asarray(got0).astype(np.uint64),
                                  np.asarray(want.value[0]))
    np.testing.assert_array_equal(np.asarray(got1).astype(np.uint64),
                                  np.asarray(want.value[1]))


def test_matvec_decrypts_to_model(setup):
    params, enc, sk, gks, transform, flt, fctx, ct, diags, v = setup
    got0, got1 = flintrans.matvec_bsgs(
        fctx, flt, _i32(ct.value[0]), _i32(ct.value[1]),
        params.galois_element)
    out = ct.with_value((jnp.asarray(np.asarray(got0).astype(np.uint64)),
                         jnp.asarray(np.asarray(got1).astype(np.uint64))))
    out = out.with_metadata(scale=out.metadata.scale * params.default_scale)
    ev = ckks.Evaluator(params)
    dec = enc.decode(decryptor.decrypt(params, sk, ev.rescale(out)))
    slots = params.max_slots
    want = np.zeros(slots, dtype=np.complex128)
    for k, d in diags.items():
        want += np.asarray(d) * np.roll(v, -(k % slots))
    ckks.precision.assert_precision(want, dec, 15)



def test_matvec_naive_matches_u64(setup):
    """The n1 == 0 (log_bsgs_ratio < 0) single-hoisted loop, bit-exact vs
    the u64 naive evaluator (lintrans_evaluator.go:131-255)."""
    params, enc, sk, gks, transform, flt, fctx, ct, diags, v = setup
    ltp = lt.LinearTransformationParameters(
        diagonals_index_list=list(diags.keys()), level_q=params.max_level,
        level_p=params.max_level_p, scale=params.default_scale,
        log_dimensions=(0, params.log_max_slots), log_bsgs_ratio=-1)
    naive_t = ckks_lt.new_linear_transformation(enc, diags, ltp)
    assert naive_t.n1 == 0
    gels = lt.galois_elements(params, list(diags.keys()),
                              params.max_slots, -1)
    gks2 = dict(gks)
    missing = [g for g in gels if g not in gks2]
    if missing:
        gks2.update(K.gen_galois_keys(jax.random.key(9), params, sk, missing))
    want = lt.evaluate(params, ct, naive_t, gks2)
    import dataclasses as _dc
    fctx2 = fckks.make_context(
        params, K.gen_relinearization_key(jax.random.key(1), params, sk),
        gks=gks2)
    fnt = flintrans.convert_lintrans(params, naive_t)
    got0, got1 = flintrans.matvec_naive(
        fctx2, fnt, _i32(ct.value[0]), _i32(ct.value[1]),
        params.galois_element)
    np.testing.assert_array_equal(np.asarray(got0).astype(np.uint64),
                                  np.asarray(want.value[0]))
    np.testing.assert_array_equal(np.asarray(got1).astype(np.uint64),
                                  np.asarray(want.value[1]))
