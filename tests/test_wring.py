"""Wide-path CKKS composites: bit-exact vs the u64 evaluator on 45/55-bit
moduli (the reference's production prime widths, PN14QP438-shaped).

Same chain, same keys: the wide pair/plane step (fast/wckks.py) must
reproduce the u64 evaluator's tensor / relinearize / rotate / rescale
bit-for-bit, and decrypt-decode to the expected values."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from matrix_fhe_tpu.fast import wckks, wrns, wring
from matrix_fhe_tpu.ops import wide, rns_tools as rt
from matrix_fhe_tpu.rlwe import decryptor, encryptor, evaluator as rlwe_eval, \
    keys as K
from matrix_fhe_tpu.schemes import ckks
from matrix_fhe_tpu.utils import primes as pr


@pytest.fixture(scope="module", params=["pair25", "pair31"])
def setup(request):
    logn, n = 8, 256
    if request.param == "pair25":
        # the EXACT PN14QP438 ladder (schemes/ckks/example_parameters.go:
        # 22-30, 70-72) — all primes are 1 mod 2^15, so they are
        # NTT-friendly at this test's N=256 too (512 | 2^15)
        Q = [0x80000000080001, 0x2000000A0001, 0x2000000E0001,
             0x2000001D0001, 0x1FFFFFCF0001, 0x1FFFFFC20001]
        P = [0x80000000130001, 0x7FFFFFFFE90001]
    else:
        # bootstrapping-set widths: 60-bit q0, 61-bit P
        # (circuits/ckks/bootstrapping/default_parameters.go:25-40)
        g60 = pr.NTTFriendlyPrimesGenerator(60, 2 * n)
        g61 = pr.NTTFriendlyPrimesGenerator(61, 2 * n)
        g45 = pr.NTTFriendlyPrimesGenerator(45, 2 * n)
        Q = [g60.next_alternating_prime()] + g45.next_alternating_primes(5)
        P = g61.next_alternating_primes(2)
    params = ckks.new_parameters(ckks.CKKSParametersLiteral(
        logn=logn, q=tuple(Q), p=tuple(P), log_default_scale=45))
    key = jax.random.key(0)
    ks, kr, kg, k1, k2 = jax.random.split(key, 5)
    sk = K.gen_secret_key(ks, params)
    rlk = K.gen_relinearization_key(kr, params, sk)
    rot_el = params.galois_element(1)
    gks = K.gen_galois_keys(kg, params, sk, [rot_el])
    ev = ckks.Evaluator(params, rlk=rlk, galois_keys=gks)
    enc = ckks.Encoder(params)
    rng = np.random.default_rng(0)
    v1 = rng.uniform(-1, 1, params.max_slots)
    v2 = rng.uniform(-1, 1, params.max_slots)
    ct1 = encryptor.encrypt(k1, params, sk, enc.encode(v1))
    ct2 = encryptor.encrypt(k2, params, sk, enc.encode(v2))
    ctx = wckks.make_context(params, rlk, gks, rescale_limbs=1)
    return params, sk, ev, enc, ct1, ct2, v1, v2, ctx, rot_el


def _pair(ct_val, params):
    return jnp.asarray(wide.pack_pair(np.asarray(ct_val), params.q))


def _u64(pair, params, level=None):
    q = params.q if level is None else params.q[: level + 1]
    return wide.unpack_pair(np.asarray(pair), q)


def test_ring_ops_match_u64(setup):
    params, sk, ev, enc, ct1, ct2, v1, v2, ctx, rot_el = setup
    rq = ctx.ring_q
    urq = params.ring_q
    a_u, b_u = ct1.value[0], ct2.value[0]
    a, b = _pair(a_u, params), _pair(b_u, params)
    np.testing.assert_array_equal(
        _u64(rq.add(a, b), params), np.asarray(urq.add(a_u, b_u)))
    np.testing.assert_array_equal(
        _u64(rq.sub(a, b), params), np.asarray(urq.sub(a_u, b_u)))
    np.testing.assert_array_equal(
        _u64(rq.mul_coeffs_montgomery(a, b), params),
        np.asarray(urq.mul_coeffs_montgomery(urq.mform(a_u), b_u)))
    # NTT round-trip on a coeff-domain poly
    x = urq.intt(a_u)
    xp = _pair(np.asarray(x), params)
    np.testing.assert_array_equal(
        _u64(rq.ntt(xp), params), np.asarray(urq.ntt(x)))
    np.testing.assert_array_equal(
        _u64(rq.intt(a), params), np.asarray(x))


def test_rescale_matches_u64(setup):
    params, sk, ev, enc, ct1, ct2, v1, v2, ctx, rot_el = setup
    a_u = ct1.value[0]
    a = _pair(a_u, params)
    want = np.asarray(rt.div_round_by_last_modulus_ntt(params.ring_q, a_u))
    got = _u64(wrns.div_round_by_last_modulus_many_ntt(ctx.ring_q, a, 1),
               params, level=params.max_level - 1)
    np.testing.assert_array_equal(got, want)


def test_tensor_matches_u64(setup):
    params, sk, ev, enc, ct1, ct2, v1, v2, ctx, rot_el = setup
    t0, t1, t2 = wckks.tensor(
        ctx, _pair(ct1.value[0], params), _pair(ct1.value[1], params),
        _pair(ct2.value[0], params), _pair(ct2.value[1], params))
    want = ev.mul(ct1, ct2)
    for got, w in zip((t0, t1, t2), want.value):
        np.testing.assert_array_equal(_u64(got, params), np.asarray(w))


def test_full_step_matches_u64(setup):
    params, sk, ev, enc, ct1, ct2, v1, v2, ctx, rot_el = setup
    got0, got1 = wckks.mul_relin_rescale(
        ctx, _pair(ct1.value[0], params), _pair(ct1.value[1], params),
        _pair(ct2.value[0], params), _pair(ct2.value[1], params))
    want = ev.rescale(ev.mul_relin(ct1, ct2))
    lvl = params.max_level - 1
    np.testing.assert_array_equal(_u64(got0, params, lvl),
                                  np.asarray(want.value[0]))
    np.testing.assert_array_equal(_u64(got1, params, lvl),
                                  np.asarray(want.value[1]))
    # and it decrypts to the product
    out = want.with_value((jnp.asarray(_u64(got0, params, lvl)),
                           jnp.asarray(_u64(got1, params, lvl))))
    dec = enc.decode(decryptor.decrypt(params, sk, out))[: params.max_slots]
    np.testing.assert_allclose(dec.real, v1 * v2, atol=2e-3)


def test_rotation_matches_u64(setup):
    params, sk, ev, enc, ct1, ct2, v1, v2, ctx, rot_el = setup
    want = ev.rotate(ct1, 1)
    got0, got1 = wckks.automorphism(
        ctx, _pair(ct1.value[0], params), _pair(ct1.value[1], params), rot_el)
    np.testing.assert_array_equal(_u64(got0, params), np.asarray(want.value[0]))
    np.testing.assert_array_equal(_u64(got1, params), np.asarray(want.value[1]))


def test_hoisted_rotations_match(setup):
    params, sk, ev, enc, ct1, ct2, v1, v2, ctx, rot_el = setup
    res = wckks.rotations_hoisted(
        ctx, _pair(ct1.value[0], params), _pair(ct1.value[1], params),
        [rot_el])
    want = ev.rotate(ct1, 1)
    got0, got1 = res[rot_el]
    np.testing.assert_array_equal(_u64(got0, params), np.asarray(want.value[0]))
    np.testing.assert_array_equal(_u64(got1, params), np.asarray(want.value[1]))


def test_at_level_step(setup):
    """The composite works identically after dropping to a lower level."""
    params, sk, ev, enc, ct1, ct2, v1, v2, ctx, rot_el = setup
    lvl = params.max_level - 2
    c2 = ctx.at_level(lvl)
    a = [v[..., : lvl + 1, :] for v in ct1.value]
    b = [v[..., : lvl + 1, :] for v in ct2.value]
    qs = params.q[: lvl + 1]

    def pair(v):
        return jnp.asarray(wide.pack_pair(np.asarray(v), qs))

    got0, got1 = wckks.mul_relin_rescale(
        c2, pair(a[0]), pair(a[1]), pair(b[0]), pair(b[1]))
    ct1d = ev.drop_level(ct1, params.max_level - lvl)
    ct2d = ev.drop_level(ct2, params.max_level - lvl)
    want = ev.rescale(ev.mul_relin(ct1d, ct2d))
    np.testing.assert_array_equal(
        wide.unpack_pair(np.asarray(got0), qs[:-1]), np.asarray(want.value[0]))
    np.testing.assert_array_equal(
        wide.unpack_pair(np.asarray(got1), qs[:-1]), np.asarray(want.value[1]))
