"""Matrix-CKKS over 3N rings: enc/dec, add, mul, const-mult, rescale.

Mirrors /root/reference/schemes/matrix_ckks/matrix_ckks_test.go (tolerance
0.1 absolute, :63-72) plus a mul test (the reference ships none)."""

import numpy as np
import pytest
import jax

from matrix_fhe_tpu import rlwe
from matrix_fhe_tpu.rlwe import decryptor, encryptor, keys as K
from matrix_fhe_tpu.schemes import matrix_ckks as mc


@pytest.fixture(scope="module")
def ctx():
    # N=48 example set (example_parameters.go:25-36)
    params = mc.new_parameters(mc.example_parameters()[1])
    enc = mc.Encoder(params)
    ev = mc.Evaluator(params)
    sk = K.gen_secret_key(jax.random.key(0), params)
    return params, enc, ev, sk


def _roundtrip(ctx, v, key):
    params, enc, ev, sk = ctx
    pt = enc.encode(v)
    ct = encryptor.encrypt(jax.random.key(key), params, sk, pt)
    return ct


def _dec(ctx, ct):
    params, enc, ev, sk = ctx
    return enc.decode(decryptor.decrypt(params, sk, ct))


def test_encode_decode(ctx):
    params, enc, ev, sk = ctx
    rng = np.random.default_rng(0)
    v = rng.uniform(-1, 1, params.n)
    np.testing.assert_allclose(enc.decode(enc.encode(v)), v, atol=1e-6)


def test_encrypt_decrypt(ctx):
    params, enc, ev, sk = ctx
    rng = np.random.default_rng(1)
    v = rng.uniform(-1, 1, params.n)
    ct = _roundtrip(ctx, v, 2)
    np.testing.assert_allclose(_dec(ctx, ct), v, atol=0.1)


def test_add(ctx):
    params, enc, ev, sk = ctx
    rng = np.random.default_rng(2)
    v1, v2 = rng.uniform(-1, 1, params.n), rng.uniform(-1, 1, params.n)
    ct = ev.add(_roundtrip(ctx, v1, 3), _roundtrip(ctx, v2, 4))
    np.testing.assert_allclose(_dec(ctx, ct), v1 + v2, atol=0.1)


def test_mul_const_and_rescale(ctx):
    params, enc, ev, sk = ctx
    rng = np.random.default_rng(3)
    v = rng.uniform(-1, 1, params.n)
    ct = ev.rescale(ev.mul_const(_roundtrip(ctx, v, 5), 0.5))
    np.testing.assert_allclose(_dec(ctx, ct), 0.5 * v, atol=0.1)


def test_mul(ctx):
    """Negacyclic-like convolution in the 3N ring: multiply by the constant
    polynomial 2 (encoded) — decodes to 2*v; and ct-ct tensor decrypts as the
    ring product of the underlying plaintexts."""
    params, enc, ev, sk = ctx
    rng = np.random.default_rng(4)
    v = rng.uniform(-1, 1, params.n)
    # multiply two ciphertexts whose plaintexts are constants (degree-0 polys)
    a = np.zeros(params.n); a[0] = 0.75
    ct1 = _roundtrip(ctx, v, 6)
    ct2 = _roundtrip(ctx, a, 7)
    ct3 = ev.rescale(ev.mul(ct1, ct2))
    np.testing.assert_allclose(_dec(ctx, ct3), 0.75 * v, atol=0.1)
