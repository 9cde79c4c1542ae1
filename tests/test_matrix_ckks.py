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


def test_mul_relin_3n():
    """Key-switching on the 3N ring (beyond the reference's matrix_ckks)."""
    from matrix_fhe_tpu.rlwe import decryptor, encryptor, keys as K
    from matrix_fhe_tpu.schemes.matrix_ckks import scheme as mx
    import jax
    params = mx.new_parameters(mx.MatrixCKKSParametersLiteral(
        order2=4, order3=1, logq=(50, 40, 40), logp=(60,), log_default_scale=40))
    enc = mx.Encoder(params)
    ev = mx.Evaluator(params)
    ks, kr = jax.random.split(jax.random.key(0))
    sk = K.gen_secret_key(ks, params)
    rlk = K.gen_relinearization_key(kr, params, sk)

    rng = np.random.default_rng(0)
    v1 = rng.uniform(-1, 1, params.n)
    v2 = rng.uniform(-1, 1, params.n)
    # encode() is coefficient-domain, so the ciphertexts are too
    ct1 = encryptor.encrypt(jax.random.key(1), params, sk, enc.encode(v1))
    ct2 = encryptor.encrypt(jax.random.key(2), params, sk, enc.encode(v2))

    out = ev.rescale(ev.mul_relin(ct1, ct2, rlk))
    assert out.degree == 1
    got = enc.decode(decryptor.decrypt(params, sk, out))
    # plaintext model: negacyclic-like product mod X^N - X^{N/2} + 1
    n = params.n
    prod = np.zeros(2 * n)
    for i in range(n):
        prod[i:i + n] += v1[i] * v2
    # reduce: X^{N+k} = X^{N/2+k} - X^k
    for k in range(n - 1, -1, -1):
        c = prod[n + k]
        if c != 0.0:
            prod[n + k] = 0
            prod[k + n // 2] += c
            prod[k] -= c
    want = prod[:n]
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_automorphism_3n():
    from matrix_fhe_tpu.rlwe import decryptor, encryptor, keys as K
    from matrix_fhe_tpu.schemes.matrix_ckks import scheme as mx
    import jax, math
    params = mx.new_parameters(mx.MatrixCKKSParametersLiteral(
        order2=4, order3=1, logq=(50, 40), logp=(60,), log_default_scale=40))
    enc = mx.Encoder(params)
    ev = mx.Evaluator(params)
    ks, kg = jax.random.split(jax.random.key(3))
    sk = K.gen_secret_key(ks, params)
    three_n = params.nth_root
    gal_el = next(g for g in range(2, three_n) if math.gcd(g, three_n) == 1)
    gk = K.gen_galois_key(kg, params, sk, gal_el)

    rng = np.random.default_rng(1)
    v = rng.uniform(-1, 1, params.n)
    ct = encryptor.encrypt(jax.random.key(4), params, sk, enc.encode(v))
    out = ev.automorphism(ct, gk)
    got = enc.decode(decryptor.decrypt(params, sk, out))

    # plaintext model: p(X) -> p(X^g) mod X^N - X^{N/2} + 1
    n = params.n
    acc = np.zeros(3 * n * gal_el + 1)
    for i in range(n):
        acc[i * gal_el] += v[i]
    # reduce top-down: X^e = X^{e-N}(X^{N/2} - 1)... iteratively
    for e in range(len(acc) - 1, n - 1, -1):
        c = acc[e]
        if c != 0.0:
            acc[e] = 0
            acc[e - n + n // 2] += c
            acc[e - n] -= c
    want = acc[:n]
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_mul_relin_3n_large_degree():
    """matrix-CKKS at N = 1152 = 2^7 * 3^2 — the regime the fork's paper
    targets, reachable only through the factorized 3N NTT (the dense
    evaluation matrix capped at N <= 384).  Full encrypt -> mul+relin ->
    rescale -> decrypt with a float schoolbook oracle."""
    from matrix_fhe_tpu.rlwe import decryptor, encryptor, keys as K
    from matrix_fhe_tpu.schemes.matrix_ckks import scheme as mx
    import jax
    params = mx.new_parameters(mx.MatrixCKKSParametersLiteral(
        order2=7, order3=2, logq=(50, 40, 40), logp=(60,),
        log_default_scale=40))
    assert params.n == 1152
    assert params.ring_q.ntt3n is not None      # factorized path engaged
    enc = mx.Encoder(params)
    ev = mx.Evaluator(params)
    ks, kr = jax.random.split(jax.random.key(0))
    sk = K.gen_secret_key(ks, params)
    rlk = K.gen_relinearization_key(kr, params, sk)

    rng = np.random.default_rng(3)
    v1 = rng.uniform(-1, 1, params.n)
    v2 = rng.uniform(-1, 1, params.n)
    ct1 = encryptor.encrypt(jax.random.key(1), params, sk, enc.encode(v1))
    ct2 = encryptor.encrypt(jax.random.key(2), params, sk, enc.encode(v2))

    out = ev.rescale(ev.mul_relin(ct1, ct2, rlk))
    got = enc.decode(decryptor.decrypt(params, sk, out))
    n = params.n
    prod = np.zeros(2 * n)
    for i in range(n):
        prod[i:i + n] += v1[i] * v2
    for k in range(n - 1, -1, -1):
        c = prod[n + k]
        if c != 0.0:
            prod[n + k] = 0
            prod[k + n // 2] += c
            prod[k] -= c
    np.testing.assert_allclose(got, prod[:n], atol=2e-3)
