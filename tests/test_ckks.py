"""CKKS end-to-end: encode/decode, enc/dec, add, mul+relin+rescale, rotate.

Mirrors the reference's TestCKKS sweep (schemes/ckks/ckks_test.go:25-71) with
insecure small-N parameters (test_utils.go testInsecurePrec45 pattern) and
precision-stats assertions (precision.go VerifyTestVectors).
"""

import numpy as np
import pytest
import jax

from matrix_fhe_tpu import rlwe
from matrix_fhe_tpu.ops import rings
from matrix_fhe_tpu.rlwe import decryptor, encryptor, keys as K
from matrix_fhe_tpu.schemes import ckks


@pytest.fixture(scope="module", params=["standard", "conjugate_invariant"])
def ctx(request):
    params = ckks.new_parameters(ckks.CKKSParametersLiteral(
        logn=7, logq=(55, 45, 45, 45), logp=(60,), log_default_scale=45,
        ring_type=request.param))
    enc = ckks.Encoder(params)
    key = jax.random.key(0)
    ks, kp, kr = jax.random.split(key, 3)
    sk = K.gen_secret_key(ks, params)
    pk = K.gen_public_key(kp, params, sk)
    rlk = K.gen_relinearization_key(kr, params, sk)
    ev = ckks.Evaluator(params, rlk=rlk)
    return params, enc, sk, pk, ev


def _rand_values(params, rng):
    n = params.max_slots
    if params.ring_type == rings.CONJUGATE_INVARIANT:
        return rng.uniform(-1, 1, n) + 0j
    return rng.uniform(-1, 1, n) + 1j * rng.uniform(-1, 1, n)


def _enc(ctx, values, key=42):
    params, enc, sk, pk, ev = ctx
    pt = enc.encode(values)
    return encryptor.encrypt(jax.random.key(key), params, sk, pt)


def _dec(ctx, ct):
    params, enc, sk, _, _ = ctx
    return enc.decode(decryptor.decrypt(params, sk, ct))


def test_encode_decode(ctx):
    params, enc, *_ = ctx
    rng = np.random.default_rng(0)
    v = _rand_values(params, rng)
    ckks.precision.assert_precision(v, enc.decode(enc.encode(v)), 30)


def test_encrypt_decrypt(ctx):
    params, enc, sk, pk, _ = ctx
    rng = np.random.default_rng(1)
    v = _rand_values(params, rng)
    ct = _enc(ctx, v)
    ckks.precision.assert_precision(v, _dec(ctx, ct), 25)
    # pk path
    pt = enc.encode(v)
    ct2 = encryptor.encrypt(jax.random.key(5), params, pk, pt)
    ckks.precision.assert_precision(v, _dec(ctx, ct2), 20)


def test_add_sub(ctx):
    params, enc, sk, _, ev = ctx
    rng = np.random.default_rng(2)
    v1, v2 = _rand_values(params, rng), _rand_values(params, rng)
    ct1, ct2 = _enc(ctx, v1, 6), _enc(ctx, v2, 7)
    ckks.precision.assert_precision(v1 + v2, _dec(ctx, ev.add(ct1, ct2)), 25)
    ckks.precision.assert_precision(v1 - v2, _dec(ctx, ev.sub(ct1, ct2)), 25)
    # ct + pt
    ckks.precision.assert_precision(v1 + v2, _dec(ctx, ev.add(ct1, enc.encode(v2))), 25)


def test_mul_relin_rescale(ctx):
    params, enc, sk, _, ev = ctx
    rng = np.random.default_rng(3)
    v1, v2 = _rand_values(params, rng), _rand_values(params, rng)
    ct1, ct2 = _enc(ctx, v1, 8), _enc(ctx, v2, 9)
    ct3 = ev.mul_relin(ct1, ct2)
    assert ct3.degree == 1
    ct3 = ev.rescale(ct3)
    assert ct3.level == params.max_level - 1
    ckks.precision.assert_precision(v1 * v2, _dec(ctx, ct3), 20)
    # without relin: degree-2 decrypts correctly too
    ct4 = ev.mul(ct1, ct2)
    assert ct4.degree == 2
    ckks.precision.assert_precision(v1 * v2, _dec(ctx, ev.rescale(ct4)), 20)
    # plaintext mul
    ct5 = ev.rescale(ev.mul_plain(ct1, enc.encode(v2)))
    ckks.precision.assert_precision(v1 * v2, _dec(ctx, ct5), 20)


def test_mul_const_add_const(ctx):
    params, enc, sk, _, ev = ctx
    rng = np.random.default_rng(4)
    v = _rand_values(params, rng)
    ct = _enc(ctx, v, 10)
    ct2 = ev.rescale(ev.mul_const(ct, 1.5))
    ckks.precision.assert_precision(v * 1.5, _dec(ctx, ct2), 20)
    ct3 = ev._mul_integer(ct, 3)
    ckks.precision.assert_precision(v * 3, _dec(ctx, ct3), 20)


def test_rotate_conjugate(ctx):
    params, enc, sk, _, ev = ctx
    if params.ring_type == rings.CONJUGATE_INVARIANT:
        pytest.skip("rotation keys for CI ring TBD in this test")
    rng = np.random.default_rng(5)
    v = _rand_values(params, rng)
    ct = _enc(ctx, v, 11)
    ks = [1, 5, params.max_slots - 1]
    gels = [params.galois_element(k) for k in ks] + [params.galois_element_inverse()]
    gks = K.gen_galois_keys(jax.random.key(12), params, sk, gels)
    ev2 = ckks.Evaluator(params, rlk=ev.rlk, galois_keys=gks)
    for k in ks:
        got = _dec(ctx, ev2.rotate(ct, k))
        ckks.precision.assert_precision(np.roll(v, -k), got, 20)
    got = _dec(ctx, ev2.conjugate(ct))
    ckks.precision.assert_precision(np.conj(v), got, 20)
    # hoisted matches individual
    hoisted = ev2.rotate_hoisted(ct, ks)
    for k in ks:
        a, b = hoisted[k], ev2.rotate(ct, k)
        for x, y in zip(a.value, b.value):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_inner_sum(ctx):
    params, enc, sk, _, ev = ctx
    if params.ring_type == rings.CONJUGATE_INVARIANT:
        pytest.skip("rotation keys for CI ring TBD in this test")
    rng = np.random.default_rng(6)
    v = _rand_values(params, rng)
    ct = _enc(ctx, v, 13)
    n, batch = 7, 2
    gels = ev.galois_elements_for_inner_sum(batch, n)
    gks = K.gen_galois_keys(jax.random.key(14), params, sk, gels)
    ev2 = ckks.Evaluator(params, rlk=ev.rlk, galois_keys=gks)
    got = _dec(ctx, ev2.inner_sum(ct, batch, n))
    want = sum(np.roll(v, -batch * j) for j in range(n))
    ckks.precision.assert_precision(want, got, 18)
    # generic InnerFunction (inner_sum.go:316) with sub as the fold op:
    # the same recursion with a non-commutative op still folds all n terms
    got_fn = _dec(ctx, ev2.inner_function(ct, batch, n, ev2.add))
    ckks.precision.assert_precision(want, got_fn, 18)


def test_encode_prec128():
    """PREC128 (arbitrary-precision) embed path (encoder.go:325
    embedArbitrary): scales beyond float64's 53-bit mantissa."""
    params = ckks.new_parameters(ckks.CKKSParametersLiteral(
        logn=5, logq=(60, 55, 55), logp=(61,), log_default_scale=80))
    enc = ckks.Encoder(params)
    rng = np.random.default_rng(0)
    v = rng.uniform(-1, 1, params.max_slots) + 1j * rng.uniform(-1, 1, params.max_slots)
    pt = enc.encode(v)  # scale 2^80 -> Decimal path
    assert pt.metadata.scale == 1 << 80
    got = enc.decode(pt)
    # decode is float64-bounded; the embed itself must be high precision
    ckks.precision.assert_precision(v, got, 40)


def test_mul_then_add(ctx):
    """MulThenAdd / MulRelinThenAdd (evaluator.go:918-1094): accumulating
    products into a running sum without intermediate copies."""
    params, enc, sk, pk, ev = ctx
    rng = np.random.default_rng(9)
    va, vb, vr = (_rand_values(params, rng) for _ in range(3))
    a, b = _enc(ctx, va, 50), _enc(ctx, vb, 51)
    # res at the product scale (the accumulation target convention)
    res = ev.mul_relin(_enc(ctx, vr, 52), _enc(ctx, np.ones_like(vr), 53))

    out = ev.mul_relin_then_add(a, b, res)
    assert out.degree == 1
    ckks.precision.assert_precision(vr + va * vb, _dec(ctx, out), 20)

    out2 = ev.mul_then_add(a, b, res)
    assert out2.degree == 2
    ckks.precision.assert_precision(vr + va * vb, _dec(ctx, out2), 20)

    # ct x pt accumulation
    pt = enc.encode(vb)
    out3 = ev.mul_then_add(a, pt, res)
    assert out3.degree == 1
    ckks.precision.assert_precision(vr + va * vb, _dec(ctx, out3), 20)

    # scalar path (mul_const_then_add)
    out4 = ev.mul_const_then_add(a, 0.5 + 0.0j, res)
    ckks.precision.assert_precision(vr + 0.5 * va, _dec(ctx, out4), 20)
