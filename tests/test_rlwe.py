"""RLWE core: enc/dec roundtrips, key switching, automorphism, relinearize.

Mirrors the reference's TestRLWE strategy (core/rlwe/rlwe_test.go:121):
decrypt-and-compare with noise-budget assertions using secret-key access.
"""

import numpy as np
import pytest
import jax

from matrix_fhe_tpu.ops import automorphism as am, modmath as mm, rings
from matrix_fhe_tpu import rlwe
from matrix_fhe_tpu.rlwe import decryptor, encryptor, evaluator, keys as K
from matrix_fhe_tpu.rlwe.elements import MetaData


@pytest.fixture(scope="module")
def ctx():
    params = rlwe.new_parameters(rlwe.ParametersLiteral(
        logn=6, logq=(45, 40, 40), logp=(50,)))
    k = jax.random.key(0)
    ks, kp = jax.random.split(k)
    sk = K.gen_secret_key(ks, params)
    pk = K.gen_public_key(kp, params, sk)
    return params, sk, pk


def _centered_noise(params, pt_coeff):
    """Max |centered limb-0 value| of a coeff-domain [L, N] poly."""
    q0 = params.q[0]
    v = np.asarray(pt_coeff)[0].astype(object)
    return max(abs(int(x) if int(x) <= q0 // 2 else int(x) - q0) for x in v)


def _decrypt_coeff(params, sk, ct):
    pt = decryptor.decrypt(params, sk, ct)
    rq = params.ring_q.at_level(ct.level)
    return rq.intt(pt.value) if ct.metadata.is_ntt else pt.value


def test_encrypt_zero_sk_noise(ctx):
    params, sk, _ = ctx
    ct = encryptor.encrypt_zero_sk(jax.random.key(1), params, sk)
    assert _centered_noise(params, _decrypt_coeff(params, sk, ct)) < 20


def test_encrypt_zero_pk_noise(ctx):
    params, sk, pk = ctx
    ct = encryptor.encrypt_zero_pk(jax.random.key(2), params, pk)
    # noise ~ ||e u + e'|| <~ 19.2 * (N * 2/3 + 1) plus ModDown rounding
    assert _centered_noise(params, _decrypt_coeff(params, sk, ct)) < 4000


def _random_message(params, rng, bound=256):
    n, L = params.n, len(params.q)
    m = rng.integers(0, bound, n)
    limbs = np.stack([(m % q).astype(np.uint64) for q in params.q])
    return m, mm.u64(limbs)


def test_encrypt_decrypt_message(ctx):
    params, sk, pk = ctx
    rng = np.random.default_rng(3)
    m, limbs = _random_message(params, rng)
    rq = params.ring_q
    pt = rlwe.Plaintext(value=rq.ntt(limbs), metadata=MetaData())
    for enc_key, bound in ((sk, 64), (pk, 4000)):
        ct = encryptor.encrypt(jax.random.key(4), params, enc_key, pt)
        dec = np.asarray(_decrypt_coeff(params, sk, ct))[0]
        err = [(int(d) - int(v)) % params.q[0] for d, v in zip(dec, m)]
        err = [e if e <= params.q[0] // 2 else e - params.q[0] for e in err]
        assert max(abs(e) for e in err) < bound


def test_apply_evaluation_key(ctx):
    params, sk, _ = ctx
    sk2 = K.gen_secret_key(jax.random.key(5), params)
    evk = K.gen_evaluation_key(jax.random.key(6), params, sk.value.q, sk2)
    rng = np.random.default_rng(7)
    m, limbs = _random_message(params, rng)
    pt = rlwe.Plaintext(value=params.ring_q.ntt(limbs))
    ct = encryptor.encrypt(jax.random.key(8), params, sk, pt)
    ct2 = evaluator.apply_evaluation_key(params, ct, evk)
    dec = np.asarray(_decrypt_coeff(params, sk2, ct2))[0]
    err = [(int(d) - int(v)) % params.q[0] for d, v in zip(dec, m)]
    err = [e if e <= params.q[0] // 2 else e - params.q[0] for e in err]
    assert max(abs(e) for e in err) < 10000


def test_automorphism(ctx):
    params, sk, _ = ctx
    gal_el = params.galois_element(1)  # rotate by 1
    gk = K.gen_galois_key(jax.random.key(9), params, sk, gal_el)
    rng = np.random.default_rng(10)
    m, limbs = _random_message(params, rng)
    rq = params.ring_q
    pt = rlwe.Plaintext(value=rq.ntt(limbs))
    ct = encryptor.encrypt(jax.random.key(11), params, sk, pt)
    ct_rot = evaluator.automorphism(params, ct, gk)
    dec = np.asarray(_decrypt_coeff(params, sk, ct_rot))[0]
    want = np.asarray(am.automorphism_coeff(rq, mm.u64(limbs), gal_el))[0]
    err = [(int(d) - int(v)) % params.q[0] for d, v in zip(dec, want)]
    err = [e if e <= params.q[0] // 2 else e - params.q[0] for e in err]
    assert max(abs(e) for e in err) < 10000


def test_hoisted_automorphism_matches(ctx):
    params, sk, _ = ctx
    gal_el = params.galois_element(2)
    gk = K.gen_galois_key(jax.random.key(12), params, sk, gal_el)
    rng = np.random.default_rng(13)
    _, limbs = _random_message(params, rng)
    pt = rlwe.Plaintext(value=params.ring_q.ntt(limbs))
    ct = encryptor.encrypt(jax.random.key(14), params, sk, pt)
    a = evaluator.automorphism(params, ct, gk)
    digits = evaluator.decompose_ntt(params, ct.level, ct.value[1])
    b = evaluator.automorphism_hoisted(params, ct, digits, gk)
    for x, y in zip(a.value, b.value):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_relinearize_mul(ctx):
    params, sk, _ = ctx
    rlk = K.gen_relinearization_key(jax.random.key(15), params, sk)
    rng = np.random.default_rng(16)
    bound = 64
    m1, l1 = _random_message(params, rng, bound)
    m2, l2 = _random_message(params, rng, bound)
    rq = params.ring_q
    ct1 = encryptor.encrypt(jax.random.key(17), params, sk,
                            rlwe.Plaintext(value=rq.ntt(l1)))
    ct2 = encryptor.encrypt(jax.random.key(18), params, sk,
                            rlwe.Plaintext(value=rq.ntt(l2)))
    # tensor: (c0, c1) x (d0, d1) = (c0 d0, c0 d1 + c1 d0, c1 d1)
    a0m = rq.mform(ct1.value[0])
    a1m = rq.mform(ct1.value[1])
    e0 = rq.mul_coeffs_montgomery(a0m, ct2.value[0])
    e1 = rq.add(rq.mul_coeffs_montgomery(a0m, ct2.value[1]),
                rq.mul_coeffs_montgomery(a1m, ct2.value[0]))
    e2 = rq.mul_coeffs_montgomery(a1m, ct2.value[1])
    ct3 = rlwe.Ciphertext(value=(e0, e1, e2), metadata=ct1.metadata)
    ct3 = evaluator.relinearize(params, ct3, rlk)
    dec = np.asarray(_decrypt_coeff(params, sk, ct3))[0]
    # expected: m1 * m2 in Z_q[X]/(X^N+1)
    import oracle
    want = oracle.negacyclic_mul([int(v) for v in m1], [int(v) for v in m2],
                                 params.q[0])
    err = [(int(d) - int(v)) % params.q[0] for d, v in zip(dec, want)]
    err = [e if e <= params.q[0] // 2 else e - params.q[0] for e in err]
    assert max(abs(e) for e in err) < 2_000_000  # mult noise ~ N * bound * e
