"""Homomorphic DFT: CoeffsToSlots / SlotsToCoeffs round trip.

Mirrors circuits/ckks/dft/dft_test.go with insecure small-N parameters.
"""

import numpy as np
import pytest
import jax

from matrix_fhe_tpu.circuits.ckks import dft
from matrix_fhe_tpu.rlwe import decryptor, encryptor, keys as K
from matrix_fhe_tpu.schemes import ckks


@pytest.fixture(scope="module")
def ctx():
    params = ckks.new_parameters(ckks.CKKSParametersLiteral(
        logn=6, logq=(55,) + (45,) * 7, logp=(60,), log_default_scale=45))
    enc = ckks.Encoder(params)
    ks, kr = jax.random.split(jax.random.key(0))
    sk = K.gen_secret_key(ks, params)
    rlk = K.gen_relinearization_key(kr, params, sk)
    return params, enc, sk, rlk


def test_c2s_s2c_roundtrip_dense(ctx):
    params, enc, sk, rlk = ctx
    log_slots = params.log_max_slots
    L = params.max_level

    c2s_lit = dft.MatrixLiteral(
        type=dft.HOMOMORPHIC_ENCODE, log_slots=log_slots, level_q=L,
        level_p=params.max_level_p, levels=[1, 1, 1],
        format=dft.SPLIT_REAL_AND_IMAG)
    s2c_lit = dft.MatrixLiteral(
        type=dft.HOMOMORPHIC_DECODE, log_slots=log_slots, level_q=L - 3,
        level_p=params.max_level_p, levels=[1, 1, 1],
        format=dft.SPLIT_REAL_AND_IMAG)

    c2s = dft.new_matrix_from_literal(params, c2s_lit, enc)
    s2c = dft.new_matrix_from_literal(params, s2c_lit, enc)

    gels = sorted(set(dft.galois_elements(params, c2s_lit)) |
                  set(dft.galois_elements(params, s2c_lit)))
    gks = K.gen_galois_keys(jax.random.key(7), params, sk, gels)
    ev = ckks.Evaluator(params, rlk=rlk, galois_keys=gks)

    rng = np.random.default_rng(0)
    v = rng.uniform(-1, 1, params.max_slots) + 1j * rng.uniform(-1, 1, params.max_slots)
    ct = encryptor.encrypt(jax.random.key(3), params, sk, enc.encode(v))

    ct_real, ct_imag = dft.coeffs_to_slots(params, ev, ct, c2s, gks)
    assert ct_imag is not None  # dense packing

    # slots of ct_real/ct_imag hold the plaintext polynomial coefficients
    got_real = enc.decode(decryptor.decrypt(params, sk, ct_real))
    got_imag = enc.decode(decryptor.decrypt(params, sk, ct_imag))
    assert np.max(np.abs(np.imag(got_real))) < 1e-3
    assert np.max(np.abs(np.imag(got_imag))) < 1e-3

    out = dft.slots_to_coeffs(params, ev, ct_real, ct_imag, s2c, gks)
    got = enc.decode(decryptor.decrypt(params, sk, out))
    ckks.precision.assert_precision(v, got, 12)


def test_c2s_matches_plain_coeffs(ctx):
    """CoeffsToSlots slots == the plaintext polynomial coefficients / scale."""
    params, enc, sk, rlk = ctx
    log_slots = params.log_max_slots
    L = params.max_level

    c2s_lit = dft.MatrixLiteral(
        type=dft.HOMOMORPHIC_ENCODE, log_slots=log_slots, level_q=L,
        level_p=params.max_level_p, levels=[1, 1, 1],
        format=dft.SPLIT_REAL_AND_IMAG)
    c2s = dft.new_matrix_from_literal(params, c2s_lit, enc)
    gels = dft.galois_elements(params, c2s_lit)
    gks = K.gen_galois_keys(jax.random.key(8), params, sk, gels)
    ev = ckks.Evaluator(params, rlk=rlk, galois_keys=gks)

    rng = np.random.default_rng(1)
    v = rng.uniform(-1, 1, params.max_slots) + 1j * rng.uniform(-1, 1, params.max_slots)
    pt = enc.encode(v)
    ct = encryptor.encrypt(jax.random.key(5), params, sk, pt)

    # plaintext model: the raw (centered) coefficients of pt, divided by scale
    from matrix_fhe_tpu.schemes.ckks.encoder import crt_reconstruct_centered
    ring = params.ring_q
    coeffs = crt_reconstruct_centered(np.asarray(ring.intt(pt.value)), params.q)
    coeffs = np.array([float(c) for c in coeffs]) / float(pt.scale)

    ct_real, ct_imag = dft.coeffs_to_slots(params, ev, ct, c2s, gks)
    got_real = np.real(enc.decode(decryptor.decrypt(params, sk, ct_real)))
    got_imag = np.real(enc.decode(decryptor.decrypt(params, sk, ct_imag)))

    # the factorized (non-bit-reversed) IDFT outputs coefficients in
    # bit-reversed slot order (dft.go BitReversed=false convention)
    from matrix_fhe_tpu.schemes.ckks.encoder import _bit_reverse_perm
    br = _bit_reverse_perm(params.max_slots)
    n2 = params.max_slots
    ckks.precision.assert_precision(coeffs[:n2][br], got_real, 10)
    ckks.precision.assert_precision(coeffs[n2:][br], got_imag, 10)


def test_c2s_s2c_fractional_levels(ctx):
    """levels=[2, 1]: two DFT factors amortize ONE rescaling prime
    (dft.go:183-211 Levels[i] > 1), each encoded at the prime's square
    root carried as a high-precision Fraction scale.  The roundtrip burns
    2 levels for 3 factors instead of 3."""
    params, enc, sk, rlk = ctx
    log_slots = params.log_max_slots
    L = params.max_level

    c2s_lit = dft.MatrixLiteral(
        type=dft.HOMOMORPHIC_ENCODE, log_slots=log_slots, level_q=L,
        level_p=params.max_level_p, levels=[2, 1],
        format=dft.SPLIT_REAL_AND_IMAG)
    s2c_lit = dft.MatrixLiteral(
        type=dft.HOMOMORPHIC_DECODE, log_slots=log_slots, level_q=L - 2,
        level_p=params.max_level_p, levels=[2, 1],
        format=dft.SPLIT_REAL_AND_IMAG)

    c2s = dft.new_matrix_from_literal(params, c2s_lit, enc)
    s2c = dft.new_matrix_from_literal(params, s2c_lit, enc)
    assert len(c2s.matrices) == 3        # sum(levels) factors

    gels = sorted(set(dft.galois_elements(params, c2s_lit)) |
                  set(dft.galois_elements(params, s2c_lit)))
    gks = K.gen_galois_keys(jax.random.key(8), params, sk, gels)
    ev = ckks.Evaluator(params, rlk=rlk, galois_keys=gks)

    rng = np.random.default_rng(1)
    v = (rng.uniform(-1, 1, params.max_slots)
         + 1j * rng.uniform(-1, 1, params.max_slots))
    ct = encryptor.encrypt(jax.random.key(4), params, sk, enc.encode(v))

    ct_real, ct_imag = dft.coeffs_to_slots(params, ev, ct, c2s, gks)
    assert ct_real.level == L - 2        # only 2 primes consumed

    out = dft.slots_to_coeffs(params, ev, ct_real, ct_imag, s2c, gks)
    assert out.level == L - 4
    got = enc.decode(decryptor.decrypt(params, sk, out))
    ckks.precision.assert_precision(v, got, 10)
