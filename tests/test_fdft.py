"""Fast-path homomorphic DFT chain: bit-exact vs the u64 evaluator."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from matrix_fhe_tpu.circuits.ckks import dft
from matrix_fhe_tpu.fast import fckks, fdft, fring
from matrix_fhe_tpu.rlwe import encryptor, keys as K
from matrix_fhe_tpu.schemes import ckks


@pytest.fixture(scope="module")
def setup():
    logn, lq, lp = 7, 6, 2
    n = 1 << logn
    moduli = fring.find_fast_primes(n, lq + lp)
    params = ckks.new_parameters(ckks.CKKSParametersLiteral(
        logn=logn, q=tuple(moduli[:lq]), p=tuple(moduli[lq:]),
        log_default_scale=21))
    enc = ckks.Encoder(params)
    ks, kr, ke = jax.random.split(jax.random.key(0), 3)
    sk = K.gen_secret_key(ks, params)
    rlk = K.gen_relinearization_key(kr, params, sk)

    L = params.max_level
    c2s_lit = dft.MatrixLiteral(
        type=dft.HOMOMORPHIC_ENCODE, log_slots=params.log_max_slots,
        level_q=L, level_p=params.max_level_p, levels=[1, 1, 1],
        format=dft.SPLIT_REAL_AND_IMAG)
    c2s = dft.new_matrix_from_literal(params, c2s_lit, enc)
    gels = dft.galois_elements(params, c2s_lit)
    gks = K.gen_galois_keys(jax.random.key(7), params, sk, gels)
    ev = ckks.Evaluator(params, rlk=rlk, galois_keys=gks)

    rng = np.random.default_rng(0)
    v = rng.uniform(-1, 1, params.max_slots) \
        + 1j * rng.uniform(-1, 1, params.max_slots)
    ct = encryptor.encrypt(ke, params, sk, enc.encode(v))

    fctx = fckks.make_context(params, rlk, gks=gks)
    fmats = fdft.convert_matrices(params, c2s.matrices)
    return params, enc, sk, gks, ev, c2s, ct, fctx, fmats


def _i32(v):
    return jnp.asarray(np.asarray(v).astype(np.int64).astype(np.int32))


def test_dft_chain_matches_u64(setup):
    params, enc, sk, gks, ev, c2s, ct, fctx, fmats = setup
    want = dft._dft(params, ev, ct, c2s.matrices, gks)
    got0, got1, level = fdft.dft(
        fctx, fmats, _i32(ct.value[0]), _i32(ct.value[1]),
        params.galois_element, ct.level)
    assert level == want.level
    np.testing.assert_array_equal(np.asarray(got0).astype(np.uint64),
                                  np.asarray(want.value[0]))
    np.testing.assert_array_equal(np.asarray(got1).astype(np.uint64),
                                  np.asarray(want.value[1]))
