"""RGSW external product (core/rgsw/rgsw_test.go pattern)."""

import numpy as np
import pytest
import jax

from matrix_fhe_tpu import rgsw
from matrix_fhe_tpu.rlwe import decryptor, encryptor, keys as K
from matrix_fhe_tpu.schemes import ckks


@pytest.fixture(scope="module")
def ctx():
    params = ckks.new_parameters(ckks.CKKSParametersLiteral(
        logn=7, logq=(55, 45, 45), logp=(60,), log_default_scale=40))
    enc = ckks.Encoder(params)
    sk = K.gen_secret_key(jax.random.key(0), params)
    return params, enc, sk


def test_external_product_scalar(ctx):
    params, enc, sk = ctx
    rng = np.random.default_rng(0)
    v = rng.uniform(-1, 1, params.max_slots) + 0j
    ct = encryptor.encrypt(jax.random.key(3), params, sk, enc.encode(v))
    m = 3
    rg = rgsw.encrypt_plaintext(jax.random.key(4), params, sk, m)
    out = rgsw.external_product(params, ct, rg)
    got = enc.decode(decryptor.decrypt(params, sk, out))
    ckks.precision.assert_precision(m * v, got, 12)


def test_external_product_monomial(ctx):
    """RGSW(X^k) x ct = negacyclic shift of the coefficients."""
    params, enc, sk = ctx
    import jax.numpy as jnp
    rng = np.random.default_rng(1)
    v = rng.uniform(-1, 1, params.max_slots) + 0j
    ct = encryptor.encrypt(jax.random.key(5), params, sk, enc.encode(v))
    k = 5
    rq = params.ring_q
    pt = jnp.zeros((len(params.q), params.n), dtype=jnp.uint64)
    pt = pt.at[:, k].set(1)
    pt_q = rq.mform(rq.ntt(pt))
    rg = rgsw.encrypt(jax.random.key(6), params, sk, pt_q)
    out = rgsw.external_product(params, ct, rg)
    # model: multiply the plaintext polynomial by X^k
    from matrix_fhe_tpu.ops import automorphism as am
    ptd = decryptor.decrypt(params, sk, ct)
    want_poly = am.mult_by_monomial(rq, rq.intt(ptd.value), k)
    from matrix_fhe_tpu.rlwe.elements import Plaintext
    want = enc.decode(Plaintext(value=rq.ntt(want_poly),
                                metadata=ptd.metadata))
    got = enc.decode(decryptor.decrypt(params, sk, out))
    ckks.precision.assert_precision(want, got, 12)
