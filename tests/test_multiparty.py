"""Multiparty protocols, N parties in-process (multiparty_test.go pattern):
collective pk / evk / galois / relin keygen, CKS, PCKS, threshold Shamir,
EncToShare/ShareToEnc, masked-transform refresh.
"""

import numpy as np
import pytest
import jax

from matrix_fhe_tpu import multiparty as mp
from matrix_fhe_tpu.multiparty import mpckks
from matrix_fhe_tpu.rlwe import decryptor, encryptor, evaluator as rlwe_eval, keys as K
from matrix_fhe_tpu.rlwe.elements import Ciphertext
from matrix_fhe_tpu.schemes import ckks

N_PARTIES = 3


@pytest.fixture(scope="module")
def ctx():
    params = ckks.new_parameters(ckks.CKKSParametersLiteral(
        logn=7, logq=(55, 45, 45), logp=(60,), log_default_scale=45))
    enc = ckks.Encoder(params)
    keys = jax.random.split(jax.random.key(0), N_PARTIES)
    sks = [K.gen_secret_key(k, params) for k in keys]
    # ideal (sum) secret key for verification
    rq, rp = params.ring_q, params.ring_p
    q_sum = sks[0].value.q
    p_sum = sks[0].value.p
    for s in sks[1:]:
        q_sum = rq.add(q_sum, s.value.q)
        p_sum = rp.add(p_sum, s.value.p)
    sk_ideal = K.SecretKey(value=K.QPPoly(q=q_sum, p=p_sum))
    return params, enc, sks, sk_ideal


def _gen_cpk(ctx, crs_seed=11):
    params, enc, sks, sk_ideal = ctx
    crs = jax.random.key(crs_seed)
    crp = mp.PublicKeyGen.sample_crp(crs, params)
    shares = [mp.PublicKeyGen.gen_share(jax.random.key(100 + i), params, sks[i], crp)
              for i in range(N_PARTIES)]
    agg = shares[0]
    for s in shares[1:]:
        agg = mp.PublicKeyGen.aggregate(params, agg, s)
    return mp.PublicKeyGen.finalize(params, agg, crp)


def test_collective_public_key(ctx):
    params, enc, sks, sk_ideal = ctx
    pk = _gen_cpk(ctx)
    rng = np.random.default_rng(0)
    v = rng.uniform(-1, 1, params.max_slots) + 1j * rng.uniform(-1, 1, params.max_slots)
    ct = encryptor.encrypt(jax.random.key(5), params, pk, enc.encode(v))
    got = enc.decode(decryptor.decrypt(params, sk_ideal, ct))
    ckks.precision.assert_precision(v, got, 15)


def test_collective_galois_key(ctx):
    params, enc, sks, sk_ideal = ctx
    crs = jax.random.key(21)
    gal_el = params.galois_element(1)
    crp = mp.GaloisKeyGen.sample_crp(crs, params)
    shares = [mp.GaloisKeyGen.gen_share(jax.random.key(200 + i), params, sks[i],
                                        gal_el, crp)
              for i in range(N_PARTIES)]
    agg = shares[0]
    for s in shares[1:]:
        agg = mp.GaloisKeyGen.aggregate(params, agg, s)
    gk = mp.GaloisKeyGen.finalize(params, agg, crp, gal_el)

    rng = np.random.default_rng(1)
    v = rng.uniform(-1, 1, params.max_slots) + 1j * rng.uniform(-1, 1, params.max_slots)
    ct = encryptor.encrypt(jax.random.key(6), params, sk_ideal, enc.encode(v))
    rot = rlwe_eval.automorphism(params, ct, gk)
    got = enc.decode(decryptor.decrypt(params, sk_ideal, rot))
    ckks.precision.assert_precision(np.roll(v, -1), got, 12)


def test_collective_relin_key(ctx):
    params, enc, sks, sk_ideal = ctx
    crs = jax.random.key(31)
    crp = mp.RelinKeyGen.sample_crp(crs, params)
    ephs, r1s = [], []
    for i in range(N_PARTIES):
        eph, s1 = mp.RelinKeyGen.gen_share_round1(jax.random.key(300 + i),
                                                  params, sks[i], crp)
        ephs.append(eph)
        r1s.append(s1)
    r1_agg = r1s[0]
    for s in r1s[1:]:
        r1_agg = mp.RelinKeyGen.aggregate_round1(params, r1_agg, s)
    r2s = [mp.RelinKeyGen.gen_share_round2(jax.random.key(400 + i), params,
                                           ephs[i], sks[i], r1_agg)
           for i in range(N_PARTIES)]
    r2_agg = r2s[0]
    for s in r2s[1:]:
        r2_agg = mp.RelinKeyGen.aggregate_round2(params, r2_agg, s)
    rlk = mp.RelinKeyGen.finalize(params, r1_agg, r2_agg)

    ev = ckks.Evaluator(params, rlk=rlk)
    rng = np.random.default_rng(2)
    v = rng.uniform(-1, 1, params.max_slots) + 0j
    ct = encryptor.encrypt(jax.random.key(7), params, sk_ideal, enc.encode(v))
    out = ev.rescale(ev.mul_relin(ct, ct))
    got = enc.decode(decryptor.decrypt(params, sk_ideal, out))
    ckks.precision.assert_precision(v * v, got, 10)


def test_cks_and_pcks(ctx):
    params, enc, sks, sk_ideal = ctx
    rng = np.random.default_rng(3)
    v = rng.uniform(-1, 1, params.max_slots) + 0j
    ct = encryptor.encrypt(jax.random.key(8), params, sk_ideal, enc.encode(v))

    # CKS: switch to a fresh collective key sk_out = sum sk_out_i
    out_keys = jax.random.split(jax.random.key(41), N_PARTIES)
    sk_outs = [K.gen_secret_key(k, params) for k in out_keys]
    rq, rp = params.ring_q, params.ring_p
    qs, ps = sk_outs[0].value.q, sk_outs[0].value.p
    for s in sk_outs[1:]:
        qs, ps = rq.add(qs, s.value.q), rp.add(ps, s.value.p)
    sk_out_ideal = K.SecretKey(value=K.QPPoly(q=qs, p=ps))

    shares = [mp.KeySwitch.gen_share(jax.random.key(500 + i), params, sks[i],
                                     sk_outs[i], ct) for i in range(N_PARTIES)]
    agg = shares[0]
    for s in shares[1:]:
        agg = mp.KeySwitch.aggregate(params, agg, s)
    ct2 = mp.KeySwitch.finalize(params, ct, agg)
    got = enc.decode(decryptor.decrypt(params, sk_out_ideal, ct2))
    ckks.precision.assert_precision(v, got, 12)

    # PCKS: switch to a public key
    pk_out = _gen_cpk(ctx, crs_seed=51)  # cpk of the input parties; reuse as target
    shares = [mp.PublicKeySwitch.gen_share(jax.random.key(600 + i), params,
                                           sks[i], pk_out, ct)
              for i in range(N_PARTIES)]
    agg = shares[0]
    for s in shares[1:]:
        agg = mp.PublicKeySwitch.aggregate(params, agg, s)
    ct3 = mp.PublicKeySwitch.finalize(params, ct, agg)
    got = enc.decode(decryptor.decrypt(params, sk_ideal, ct3))
    ckks.precision.assert_precision(v, got, 10)


def test_threshold_shamir(ctx):
    params, enc, sks, sk_ideal = ctx
    t = 2
    points = [1, 2, 3]
    # each party i Shamir-shares its additive secret to everyone
    received = {p: [] for p in points}
    for i in range(N_PARTIES):
        spoly = mp.Thresholdizer.gen_shamir_polynomial(
            jax.random.key(700 + i), params, t, sks[i])
        for p in points:
            received[p].append(
                mp.Thresholdizer.gen_shamir_secret_share(params, p, spoly))
    # aggregate the received shares per party
    own = {}
    for p in points:
        agg = received[p][0]
        for s in received[p][1:]:
            agg = mp.Thresholdizer.aggregate(params, agg, s)
        own[p] = agg
    # any t active parties can reconstruct an additive sharing of sum(sk_i)
    actives = [1, 3]
    add_shares = []
    for p in actives:
        cmb = mp.Combiner(params, p, points, t)
        add_shares.append(cmb.gen_additive_share(actives, own[p]))
    rq, rp = params.ring_q, params.ring_p
    qs, ps = add_shares[0].value.q, add_shares[0].value.p
    for s in add_shares[1:]:
        qs, ps = rq.add(qs, s.value.q), rp.add(ps, s.value.p)
    np.testing.assert_array_equal(np.asarray(qs), np.asarray(sk_ideal.value.q))


def test_refresh_masked_transform(ctx):
    params, enc, sks, sk_ideal = ctx
    rng = np.random.default_rng(4)
    v = rng.uniform(-1, 1, params.max_slots) + 1j * rng.uniform(-1, 1, params.max_slots)
    # ciphertext at the lowest level, as if depleted
    pt = enc.encode(v, level=0)
    ct = encryptor.encrypt(jax.random.key(9), params, sk_ideal, pt)
    assert ct.level == 0

    crs = jax.random.key(61)
    crs_poly = mpckks.MaskedTransform.sample_crp(crs, params, params.max_level)
    log_bound = 40
    shares = [mpckks.MaskedTransform.gen_share(
        jax.random.key(800 + i), 9000 + i, params, sks[i], sks[i], log_bound,
        ct, crs_poly, params.default_scale) for i in range(N_PARTIES)]
    agg = shares[0]
    for s in shares[1:]:
        agg = mpckks.MaskedTransform.aggregate(params, agg, s)
    out = mpckks.MaskedTransform.transform(params, ct, crs_poly, agg,
                                           params.default_scale)
    assert out.level == params.max_level
    got = enc.decode(decryptor.decrypt(params, sk_ideal, out))
    ckks.precision.assert_precision(v, got, 10)


def test_refresh_with_slot_transform(ctx):
    params, enc, sks, sk_ideal = ctx
    rng = np.random.default_rng(5)
    v = rng.uniform(-1, 1, params.max_slots) + 1j * rng.uniform(-1, 1, params.max_slots)
    ct = encryptor.encrypt(jax.random.key(10), params, sk_ideal,
                           enc.encode(v, level=0))
    crs_poly = mpckks.MaskedTransform.sample_crp(jax.random.key(71), params,
                                                 params.max_level)
    flip = lambda z: -z  # slot-wise linear transform applied during refresh
    shares = [mpckks.MaskedTransform.gen_share(
        jax.random.key(900 + i), 9900 + i, params, sks[i], sks[i], 40,
        ct, crs_poly, params.default_scale, transform=flip)
        for i in range(N_PARTIES)]
    agg = shares[0]
    for s in shares[1:]:
        agg = mpckks.MaskedTransform.aggregate(params, agg, s)
    out = mpckks.MaskedTransform.transform(params, ct, crs_poly, agg,
                                           params.default_scale, transform=flip)
    got = enc.decode(decryptor.decrypt(params, sk_ideal, out))
    ckks.precision.assert_precision(-v, got, 8)


def test_bgv_refresh():
    """mpbgv collective refresh (mpbgv/refresh.go pattern)."""
    from matrix_fhe_tpu.multiparty import mpbgv
    from matrix_fhe_tpu.schemes import bgv
    T = 65537
    params = bgv.new_parameters(bgv.BGVParametersLiteral(
        logn=6, t=T, logq=(45, 40, 40), logp=(50,)))
    enc = bgv.Encoder(params)
    keys = jax.random.split(jax.random.key(50), N_PARTIES)
    sks = [K.gen_secret_key(k, params) for k in keys]
    rq, rp = params.ring_q, params.ring_p
    qs, ps = sks[0].value.q, sks[0].value.p
    for s in sks[1:]:
        qs, ps = rq.add(qs, s.value.q), rp.add(ps, s.value.p)
    sk_ideal = K.SecretKey(value=K.QPPoly(q=qs, p=ps))

    rng = np.random.default_rng(11)
    v = rng.integers(0, T, params.n, dtype=np.uint64)
    pt = enc.encode(v, level=0)
    ct = encryptor.encrypt(jax.random.key(51), params, sk_ideal, pt)
    assert ct.level == 0

    crs_poly = mpbgv.Refresh.sample_crp(jax.random.key(52), params,
                                        params.max_level)
    shares = [mpbgv.Refresh.gen_share(jax.random.key(60 + i), params, sks[i],
                                      ct, crs_poly) for i in range(N_PARTIES)]
    agg = shares[0]
    for s in shares[1:]:
        agg = mpbgv.Refresh.aggregate(params, agg, s)
    out = mpbgv.Refresh.finalize(params, ct, agg, crs_poly)
    assert out.level == params.max_level
    got = enc.decode(decryptor.decrypt(params, sk_ideal, out))
    np.testing.assert_array_equal(got, v)
