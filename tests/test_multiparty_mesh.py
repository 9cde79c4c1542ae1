"""Multiparty share aggregation as a psum over a party mesh axis.

The TPU-native mapping of the reference's host-side AggregateShares
(multiparty/keygen_cpk.go:86; SURVEY §3.5): 8 co-scheduled parties on the
8-device CPU mesh, ONE psum per share plane — bit-identical to the
sequential pairwise aggregation, and the resulting collective pk
encrypts/decrypts against the ideal (sum) secret key."""

import numpy as np
import pytest
import jax
from jax.sharding import Mesh

from matrix_fhe_tpu import multiparty as mp
from matrix_fhe_tpu.multiparty import mesh as mpm
from matrix_fhe_tpu.rlwe import decryptor, encryptor, keys as K
from matrix_fhe_tpu.schemes import ckks


@pytest.fixture(scope="module")
def setup():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    # 45-bit chain: 8 parties * q < 2^52 (the exact-psum bound)
    params = ckks.new_parameters(ckks.CKKSParametersLiteral(
        logn=7, logq=(45, 45), logp=(45,), log_default_scale=40))
    mesh = Mesh(np.array(jax.devices()[:8]), ("party",))
    party_keys = jax.random.split(jax.random.key(0), 8)
    crs = jax.random.key(11)
    pk, sks = mpm.collective_pk_over_mesh(params, mesh, party_keys, crs)
    return params, mesh, party_keys, crs, pk, sks


def test_matches_sequential_aggregation(setup):
    params, mesh, party_keys, crs, pk, sks = setup
    crp = mp.PublicKeyGen.sample_crp(crs, params)
    shares = [mp.PublicKeyGen.gen_share(jax.random.fold_in(k, 1), params,
                                        sks[i], crp)
              for i, k in enumerate(party_keys)]
    agg = shares[0]
    for s in shares[1:]:
        agg = mp.PublicKeyGen.aggregate(params, agg, s)
    want = mp.PublicKeyGen.finalize(params, agg, crp)
    np.testing.assert_array_equal(np.asarray(pk.value[0].q),
                                  np.asarray(want.value[0].q))
    np.testing.assert_array_equal(np.asarray(pk.value[0].p),
                                  np.asarray(want.value[0].p))


def test_collective_pk_encrypts(setup):
    params, mesh, party_keys, crs, pk, sks = setup
    rq, rp = params.ring_q, params.ring_p
    q_sum, p_sum = sks[0].value.q, sks[0].value.p
    for s in sks[1:]:
        q_sum = rq.add(q_sum, s.value.q)
        p_sum = rp.add(p_sum, s.value.p)
    sk_ideal = K.SecretKey(value=K.QPPoly(q=q_sum, p=p_sum))
    enc = ckks.Encoder(params)
    rng = np.random.default_rng(0)
    v = rng.uniform(-1, 1, params.max_slots) + 0j
    ct = encryptor.encrypt(jax.random.key(5), params, pk, enc.encode(v))
    got = enc.decode(decryptor.decrypt(params, sk_ideal, ct))
    ckks.precision.assert_precision(v, got, 10)
