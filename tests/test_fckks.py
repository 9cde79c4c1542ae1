"""Fast-path CKKS flagship step: bit-exact vs the u64 evaluator.

Same moduli chain (many <2^23 primes), same keys: the int32 fast step
(fast/fckks.py) must reproduce the u64 evaluator's
mul_relin -> rescale -> rescale limbs bit-for-bit, and decrypt-decode to the
expected product.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from matrix_fhe_tpu.fast import fckks, fring
from matrix_fhe_tpu.rlwe import encryptor, keys as K
from matrix_fhe_tpu.rlwe import decryptor
from matrix_fhe_tpu.schemes import ckks


@pytest.fixture(scope="module")
def setup():
    logn, lq, lp = 8, 6, 2
    n = 1 << logn
    moduli = fring.find_fast_primes(n, lq + lp)
    params = ckks.new_parameters(ckks.CKKSParametersLiteral(
        logn=logn, q=tuple(moduli[:lq]), p=tuple(moduli[lq:]),
        log_default_scale=40))
    key = jax.random.key(0)
    ks, kr, k1, k2 = jax.random.split(key, 4)
    sk = K.gen_secret_key(ks, params)
    rlk = K.gen_relinearization_key(kr, params, sk)
    ev = ckks.Evaluator(params, rlk=rlk)
    enc = ckks.Encoder(params)
    rng = np.random.default_rng(0)
    v1 = rng.uniform(-1, 1, params.max_slots)
    v2 = rng.uniform(-1, 1, params.max_slots)
    ct1 = encryptor.encrypt(k1, params, sk, enc.encode(v1))
    ct2 = encryptor.encrypt(k2, params, sk, enc.encode(v2))
    ctx = fckks.make_context(params, rlk, rescale_limbs=2)
    return params, sk, rlk, ev, enc, ct1, ct2, v1, v2, ctx


def _i32(v):
    return jnp.asarray(np.asarray(v).astype(np.int64).astype(np.int32))


def test_tensor_matches_u64(setup):
    params, sk, rlk, ev, enc, ct1, ct2, v1, v2, ctx = setup
    t0, t1, t2 = fckks.tensor(ctx, _i32(ct1.value[0]), _i32(ct1.value[1]),
                              _i32(ct2.value[0]), _i32(ct2.value[1]))
    want = ev.mul(ct1, ct2)  # degree-2, no relin
    for got, w in zip((t0, t1, t2), want.value):
        np.testing.assert_array_equal(
            np.asarray(got).astype(np.uint64), np.asarray(w))


def test_full_step_matches_u64(setup):
    params, sk, rlk, ev, enc, ct1, ct2, v1, v2, ctx = setup
    got0, got1 = fckks.mul_relin_rescale(
        ctx, _i32(ct1.value[0]), _i32(ct1.value[1]),
        _i32(ct2.value[0]), _i32(ct2.value[1]))
    want = ev.rescale(ev.rescale(ev.mul_relin(ct1, ct2)))
    np.testing.assert_array_equal(np.asarray(got0).astype(np.uint64),
                                  np.asarray(want.value[0]))
    np.testing.assert_array_equal(np.asarray(got1).astype(np.uint64),
                                  np.asarray(want.value[1]))


def test_decrypts_to_product(setup):
    params, sk, rlk, ev, enc, ct1, ct2, v1, v2, ctx = setup
    got0, got1 = fckks.mul_relin_rescale(
        ctx, _i32(ct1.value[0]), _i32(ct1.value[1]),
        _i32(ct2.value[0]), _i32(ct2.value[1]))
    want = ev.rescale(ev.rescale(ev.mul_relin(ct1, ct2)))
    out = want.with_value((jnp.asarray(np.asarray(got0).astype(np.uint64)),
                           jnp.asarray(np.asarray(got1).astype(np.uint64))))
    pt = decryptor.decrypt(params, sk, out)
    dec = enc.decode(pt)[: params.max_slots]
    np.testing.assert_allclose(dec.real, v1 * v2, atol=2e-3)


def test_jit_compiles(setup):
    params, sk, rlk, ev, enc, ct1, ct2, v1, v2, ctx = setup
    step = jax.jit(fckks.mul_relin_rescale)
    a = step(ctx, _i32(ct1.value[0]), _i32(ct1.value[1]),
             _i32(ct2.value[0]), _i32(ct2.value[1]))
    b = fckks.mul_relin_rescale(ctx, _i32(ct1.value[0]), _i32(ct1.value[1]),
                                _i32(ct2.value[0]), _i32(ct2.value[1]))
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))


@pytest.fixture(scope="module")
def rot_setup(setup):
    params, sk, rlk, ev, enc, ct1, ct2, v1, v2, ctx = setup
    kg = jax.random.key(7)
    gal_els = [params.galois_element(1), params.galois_element(3)]
    gks = K.gen_galois_keys(kg, params, sk, gal_els)
    ev2 = ckks.Evaluator(params, rlk=rlk, galois_keys=gks)
    fctx = fckks.make_context(params, rlk, gks=gks, rescale_limbs=2)
    return params, sk, ev2, enc, ct1, v1, fctx, gal_els


def test_automorphism_matches_u64(rot_setup):
    params, sk, ev2, enc, ct1, v1, fctx, gal_els = rot_setup
    for g in gal_els:
        got0, got1 = fckks.automorphism(
            fctx, _i32(ct1.value[0]), _i32(ct1.value[1]), g)
        want = ev2._automorphism(ct1, g)
        np.testing.assert_array_equal(np.asarray(got0).astype(np.uint64),
                                      np.asarray(want.value[0]))
        np.testing.assert_array_equal(np.asarray(got1).astype(np.uint64),
                                      np.asarray(want.value[1]))


def test_rotations_hoisted_match_single(rot_setup):
    params, sk, ev2, enc, ct1, v1, fctx, gal_els = rot_setup
    outs = fckks.rotations_hoisted(
        fctx, _i32(ct1.value[0]), _i32(ct1.value[1]), gal_els)
    for g in gal_els:
        want0, want1 = fckks.automorphism(
            fctx, _i32(ct1.value[0]), _i32(ct1.value[1]), g)
        np.testing.assert_array_equal(np.asarray(outs[g][0]),
                                      np.asarray(want0))
        np.testing.assert_array_equal(np.asarray(outs[g][1]),
                                      np.asarray(want1))


def test_rotation_decrypts_to_rotated(rot_setup):
    params, sk, ev2, enc, ct1, v1, fctx, gal_els = rot_setup
    from matrix_fhe_tpu.rlwe import decryptor as D
    g = gal_els[0]  # rotation by 1 slot
    got0, got1 = fckks.automorphism(
        fctx, _i32(ct1.value[0]), _i32(ct1.value[1]), g)
    out = ct1.with_value((jnp.asarray(np.asarray(got0).astype(np.uint64)),
                          jnp.asarray(np.asarray(got1).astype(np.uint64))))
    dec = enc.decode(D.decrypt(params, sk, out))[: params.max_slots]
    np.testing.assert_allclose(dec.real, np.roll(v1, -1), atol=2e-3)
