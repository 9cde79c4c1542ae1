"""Serialization round trips for every object type (the reference's
WriteTo/ReadFrom test pattern, incl. a pinned-format regression hash)."""

import hashlib

import numpy as np
import pytest
import jax

from matrix_fhe_tpu import rgsw
from matrix_fhe_tpu.rlwe import encryptor, keys as K
from matrix_fhe_tpu.schemes import ckks
from matrix_fhe_tpu.utils import serialization as ser


@pytest.fixture(scope="module")
def ctx():
    params = ckks.new_parameters(ckks.CKKSParametersLiteral(
        logn=6, logq=(55, 45), logp=(60,), log_default_scale=45))
    enc = ckks.Encoder(params)
    sk = K.gen_secret_key(jax.random.key(0), params)
    return params, enc, sk


def _roundtrip(obj):
    data = ser.save(obj)
    return data, ser.load(data)


def test_params_roundtrip(ctx):
    params, enc, sk = ctx
    data, p2 = _roundtrip(params)
    assert p2.q == params.q and p2.p == params.p
    assert p2.n == params.n and p2.ring_type == params.ring_type
    # rings regenerate identically
    np.testing.assert_array_equal(np.asarray(p2.ring_q.roots_fwd),
                                  np.asarray(params.ring_q.roots_fwd))


def test_ct_pt_sk_pk_roundtrip(ctx):
    params, enc, sk = ctx
    rng = np.random.default_rng(0)
    v = rng.uniform(-1, 1, params.max_slots) + 0j
    pt = enc.encode(v)
    ct = encryptor.encrypt(jax.random.key(1), params, sk, pt)
    pk = K.gen_public_key(jax.random.key(2), params, sk)

    for obj in (pt, ct, sk, pk):
        _, o2 = _roundtrip(obj)
        if hasattr(obj, "value") and isinstance(obj.value, tuple):
            vals1, vals2 = obj.value, o2.value
        else:
            vals1, vals2 = (obj.value,), (o2.value,)
        for a, b in zip(jax.tree_util.tree_leaves(vals1),
                        jax.tree_util.tree_leaves(vals2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    _, ct2 = _roundtrip(ct)
    assert ct2.metadata == ct.metadata


def test_keys_roundtrip(ctx):
    params, enc, sk = ctx
    rlk = K.gen_relinearization_key(jax.random.key(3), params, sk)
    gk = K.gen_galois_key(jax.random.key(4), params, sk, params.galois_element(1))
    rg = rgsw.encrypt_plaintext(jax.random.key(5), params, sk, 3)

    _, rlk2 = _roundtrip(rlk)
    np.testing.assert_array_equal(np.asarray(rlk.gadget.q), np.asarray(rlk2.gadget.q))
    _, gk2 = _roundtrip(gk)
    assert gk2.gal_el == gk.gal_el
    np.testing.assert_array_equal(np.asarray(gk.gadget.p), np.asarray(gk2.gadget.p))
    _, rg2 = _roundtrip(rg)
    np.testing.assert_array_equal(np.asarray(rg.g1.q), np.asarray(rg2.g1.q))


def test_const_serialization_regression(ctx):
    """Pin the wire format (TestRLWEConstSerialization pattern): a
    deterministic object must serialize to a fixed digest."""
    params, enc, sk = ctx
    v = np.arange(params.max_slots) / params.max_slots + 0j
    pt = enc.encode(v)
    data = ser.save(pt)
    digest = hashlib.sha256(data).hexdigest()
    # regenerate to ensure determinism within the session
    assert hashlib.sha256(ser.save(enc.encode(v))).hexdigest() == digest
    # format guard: header magic + parseable
    assert data[:4] == b"MFT1"
    assert ser.load(data).metadata == pt.metadata


def test_const_wire_vectors():
    """Committed wire-format vectors (TestRLWEConstSerialization,
    core/rlwe/rlwe_test.go:41): deterministic objects on a fixed parameter
    set must serialize to these exact digests ACROSS sessions — any change
    to the byte format must update them consciously."""
    import jax
    from matrix_fhe_tpu.rlwe import keys as K
    from matrix_fhe_tpu.schemes import ckks as _ckks

    params = _ckks.new_parameters(_ckks.CKKSParametersLiteral(
        logn=6, logq=(45, 45), logp=(45,), log_default_scale=40))
    enc = _ckks.Encoder(params)
    v = np.arange(params.max_slots) / params.max_slots + 0j
    pt = enc.encode(v)
    sk = K.gen_secret_key(jax.random.key(0), params)
    rlk = K.gen_relinearization_key(jax.random.key(1), params, sk)

    assert hashlib.sha256(ser.save(pt)).hexdigest() == (
        "c41d1ceaadc10de792cab7744df18b2415947e379c058c3f0a8f3f1374af7b81")
    assert hashlib.sha256(ser.save(sk)).hexdigest() == (
        "d9c48cc67d4295c6038b9d5f612f1dbcea5b93869fe13e80ea0d1236dfa41f3c")
    assert hashlib.sha256(ser.save(rlk)).hexdigest() == (
        "4b2784f830a504c3037f2bcc0e8d9172c56853b49b847904208eba2a0a8a1b09")
