"""BGV/BFV: exact integer SIMD arithmetic mod T.

Mirrors /root/reference/schemes/bgv/bgv_test.go: exact slot comparison after
decryption (test_utils.go)."""

import numpy as np
import pytest
import jax

from matrix_fhe_tpu import rlwe
from matrix_fhe_tpu.rlwe import decryptor, encryptor, keys as K
from matrix_fhe_tpu.schemes import bgv

T = 65537


@pytest.fixture(scope="module")
def ctx():
    params = bgv.new_parameters(bgv.BGVParametersLiteral(
        logn=6, t=T, logq=(45, 40, 40), logp=(50,)))
    enc = bgv.Encoder(params)
    sk = K.gen_secret_key(jax.random.key(0), params)
    rlk = K.gen_relinearization_key(jax.random.key(1), params, sk)
    return params, enc, sk, rlk


def _enc(ctx, vals, key):
    params, enc, sk, _ = ctx
    return encryptor.encrypt(jax.random.key(key), params, sk, enc.encode(vals))


def _dec(ctx, ct):
    params, enc, sk, _ = ctx
    return enc.decode(decryptor.decrypt(params, sk, ct))


def test_encode_decode(ctx):
    params, enc, *_ = ctx
    rng = np.random.default_rng(0)
    v = rng.integers(0, T, params.n, dtype=np.uint64)
    np.testing.assert_array_equal(enc.decode(enc.encode(v)), v)


def test_encrypt_decrypt(ctx):
    params, enc, sk, _ = ctx
    rng = np.random.default_rng(1)
    v = rng.integers(0, T, params.n, dtype=np.uint64)
    np.testing.assert_array_equal(_dec(ctx, _enc(ctx, v, 2)), v)


def test_add_sub(ctx):
    params, *_ = ctx
    ev = bgv.Evaluator(params)
    rng = np.random.default_rng(2)
    v1 = rng.integers(0, T, params.n, dtype=np.uint64)
    v2 = rng.integers(0, T, params.n, dtype=np.uint64)
    ct1, ct2 = _enc(ctx, v1, 3), _enc(ctx, v2, 4)
    np.testing.assert_array_equal(_dec(ctx, ev.add(ct1, ct2)),
                                  (v1.astype(object) + v2) % T)
    np.testing.assert_array_equal(_dec(ctx, ev.sub(ct1, ct2)),
                                  (v1.astype(object) - v2) % T)


def test_mul_relin_rescale_bgv(ctx):
    params, enc, sk, rlk = ctx
    ev = bgv.Evaluator(params, rlk=rlk)
    rng = np.random.default_rng(3)
    v1 = rng.integers(0, T, params.n, dtype=np.uint64)
    v2 = rng.integers(0, T, params.n, dtype=np.uint64)
    ct1, ct2 = _enc(ctx, v1, 5), _enc(ctx, v2, 6)
    ct3 = ev.rescale(ev.mul_relin(ct1, ct2))
    np.testing.assert_array_equal(_dec(ctx, ct3), (v1.astype(object) * v2) % T)
    # plaintext mul
    ct4 = ev.mul(ct1, enc.encode(v2))
    np.testing.assert_array_equal(_dec(ctx, ct4), (v1.astype(object) * v2) % T)
    # addition after scale drift (scale matching)
    ct5 = ev.add(ct3, ct1)
    np.testing.assert_array_equal(_dec(ctx, ct5),
                                  (v1.astype(object) * v2 + v1) % T)


def test_mul_scale_invariant_bfv(ctx):
    params, enc, sk, rlk = ctx
    ev = bgv.Evaluator(params, rlk=rlk, scale_invariant=True)
    rng = np.random.default_rng(4)
    v1 = rng.integers(0, T, params.n, dtype=np.uint64)
    v2 = rng.integers(0, T, params.n, dtype=np.uint64)
    ct1, ct2 = _enc(ctx, v1, 7), _enc(ctx, v2, 8)
    ct3 = ev.mul_relin(ct1, ct2)
    assert ct3.level == ct1.level  # BFV keeps the level
    np.testing.assert_array_equal(_dec(ctx, ct3), (v1.astype(object) * v2) % T)


def test_rotation(ctx):
    params, enc, sk, rlk = ctx
    gels = [params.galois_element(1), params.galois_element_inverse()]
    gks = K.gen_galois_keys(jax.random.key(9), params, sk, gels)
    ev = bgv.Evaluator(params, rlk=rlk, galois_keys=gks)
    rng = np.random.default_rng(5)
    v = rng.integers(0, T, params.n, dtype=np.uint64)
    ct = _enc(ctx, v, 10)
    got = _dec(ctx, ev.rotate_columns(ct, 1))
    half = params.n // 2
    want = np.concatenate([np.roll(v[:half], -1), np.roll(v[half:], -1)])
    np.testing.assert_array_equal(got, want)
    got = _dec(ctx, ev.rotate_rows(ct))
    np.testing.assert_array_equal(got, np.concatenate([v[half:], v[:half]]))


def test_bgv_lintrans(ctx):
    """Integer diagonal linear transform (circuits/bgv/lintrans)."""
    from matrix_fhe_tpu.circuits import bgv_circuits, lintrans as lt
    params, enc, sk, rlk = ctx
    rng = np.random.default_rng(7)
    slots = params.n  # BGV slot count = N (row-interleaved)
    diag_idx = [0, 1, 3]
    diags = {k: rng.integers(0, T, slots, dtype=np.uint64) for k in diag_idx}
    v = rng.integers(0, T, slots, dtype=np.uint64)

    for ratio in (-1, 0):
        ltp = lt.LinearTransformationParameters(
            diagonals_index_list=diag_idx, level_q=params.max_level,
            level_p=params.max_level_p, scale=1,
            log_dimensions=(1, params.log_n - 1), log_bsgs_ratio=ratio)
        transform = bgv_circuits.new_linear_transformation(params, enc, diags, ltp)
        cols = 1 << (params.log_n - 1)
        gels = lt.galois_elements(params, diag_idx, cols, ratio)
        gks = K.gen_galois_keys(jax.random.key(17), params, sk, gels)
        ct = _enc(ctx, v, 18)
        out = bgv_circuits.evaluate(params, ct, transform, gks)
        got = _dec(ctx, out)
        # model: BGV slots rotate within each of the two rows of the
        # [2, N/2] slot matrix
        vm = v.reshape(2, cols)
        want = np.zeros_like(vm)
        for k, d in diags.items():
            dm = np.asarray(d).reshape(2, cols)
            want = (want + dm * np.roll(vm, -k, axis=1)) % T
        np.testing.assert_array_equal(got.reshape(2, cols), want)


def test_bgv_polynomial_ps():
    """Paterson-Stockmeyer integer polynomial, BGV and BFV tensoring
    (circuits/bgv/polynomial/polynomial_evaluator.go parity): degree 7 in
    3 levels (BGV) / 0 levels (BFV), exact mod T."""
    from matrix_fhe_tpu.circuits import bgv_circuits
    params = bgv.new_parameters(bgv.BGVParametersLiteral(
        logn=6, t=T, logq=(45,) + (40,) * 5, logp=(50,)))
    enc = bgv.Encoder(params)
    sk = K.gen_secret_key(jax.random.key(0), params)
    rlk = K.gen_relinearization_key(jax.random.key(1), params, sk)
    rng = np.random.default_rng(11)
    v = rng.integers(0, T, params.n, dtype=np.uint64)
    coeffs = [5, 3, 0, 1, 7, 0, 2, 4]          # degree 7
    want = np.zeros(params.n, dtype=object)
    for c in reversed(coeffs):
        want = (want * v.astype(object) + c) % T

    import os
    modes = (False, True) if os.environ.get("MATRIX_FHE_RUN_SLOW") \
        else (False,)   # BFV P-S shares all machinery; BGV mode suffices in CI
    for invariant in modes:
        ev = bgv.Evaluator(params, rlk=rlk, scale_invariant=invariant)
        ct = encryptor.encrypt(jax.random.key(7), params, sk, enc.encode(v))
        out = bgv_circuits.evaluate_polynomial_ps(ev, enc, ct, coeffs)
        got = enc.decode(decryptor.decrypt(params, sk, out))
        np.testing.assert_array_equal(
            got.astype(object), want,
            err_msg=f"scale_invariant={invariant}")
        if not invariant:
            assert out.level <= ct.level - 3  # log-depth consumption


def test_bgv_polynomial(ctx):
    from matrix_fhe_tpu.circuits import bgv_circuits
    params, enc, sk, rlk = ctx
    ev = bgv.Evaluator(params, rlk=rlk)
    rng = np.random.default_rng(9)
    v = rng.integers(0, 100, params.n, dtype=np.uint64)
    coeffs = [3, 1, 2]  # 3 + x + 2 x^2
    ct = _enc(ctx, v, 19)
    out = bgv_circuits.evaluate_polynomial(ev, enc, ct, coeffs)
    got = _dec(ctx, out)
    want = (3 + v.astype(object) + 2 * v.astype(object) ** 2) % T
    np.testing.assert_array_equal(got.astype(object), want)


def test_small_order_plaintext_modulus():
    """T with cyclotomic order < 2N (params.go:111-123): the plaintext
    ring drops to degree order/2 and coefficients spread into R_Q with a
    gap (encoder.go RingT2Q).  T=97 has order 32, so N=64 gives 16 slots;
    full homomorphic pipeline mod 97."""
    t = 97
    params = bgv.new_parameters(bgv.BGVParametersLiteral(
        logn=6, t=t, logq=(45, 40, 40), logp=(50,)))
    assert params.n_t == 16
    enc = bgv.Encoder(params)
    sk = K.gen_secret_key(jax.random.key(0), params)
    rlk = K.gen_relinearization_key(jax.random.key(1), params, sk)
    ev = bgv.Evaluator(params, rlk=rlk)
    rng = np.random.default_rng(4)
    v1 = rng.integers(0, t, params.n_t, dtype=np.uint64)
    v2 = rng.integers(0, t, params.n_t, dtype=np.uint64)
    ct1 = encryptor.encrypt(jax.random.key(2), params, sk, enc.encode(v1))
    ct2 = encryptor.encrypt(jax.random.key(3), params, sk, enc.encode(v2))
    got = enc.decode(decryptor.decrypt(
        params, sk, ev.rescale(ev.mul_relin(ct1, ct2))))
    want = (v1.astype(object) * v2) % t
    np.testing.assert_array_equal(got.astype(object), want)

    with pytest.raises(ValueError):
        # order 2 (t-1 = 2 * odd) is far below the backend floor
        bgv.new_parameters(bgv.BGVParametersLiteral(
            logn=6, t=8191, logq=(45, 40), logp=(50,)))
