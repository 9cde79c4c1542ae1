"""Linear-transformation circuit: naive + BSGS vs plaintext model; trace.

Mirrors the reference's lintrans tests (circuits/ckks/lintrans evaluation in
schemes/ckks tests) with insecure small-N parameters.
"""

import numpy as np
import pytest
import jax

from matrix_fhe_tpu import rlwe
from matrix_fhe_tpu.circuits import lintrans as lt
from matrix_fhe_tpu.circuits.ckks import lintrans as ckks_lt
from matrix_fhe_tpu.rlwe import decryptor, encryptor, evaluator as rlwe_eval, keys as K
from matrix_fhe_tpu.schemes import ckks


@pytest.fixture(scope="module")
def ctx():
    params = ckks.new_parameters(ckks.CKKSParametersLiteral(
        logn=7, logq=(55, 45, 45), logp=(60,), log_default_scale=45))
    enc = ckks.Encoder(params)
    key = jax.random.key(0)
    ks, kr = jax.random.split(key)
    sk = K.gen_secret_key(ks, params)
    rlk = K.gen_relinearization_key(kr, params, sk)
    ev = ckks.Evaluator(params, rlk=rlk)
    return params, enc, sk, ev


def _apply_diag_model(diags, v):
    slots = len(v)
    out = np.zeros(slots, dtype=np.complex128)
    for k, d in diags.items():
        out += np.asarray(d) * np.roll(v, -(k % slots))
    return out


def _run_lintrans(ctx, log_bsgs_ratio, diag_idx, seed=0):
    params, enc, sk, ev = ctx
    slots = params.max_slots
    rng = np.random.default_rng(seed)
    diags = {k: rng.uniform(-1, 1, slots) + 1j * rng.uniform(-1, 1, slots)
             for k in diag_idx}
    v = rng.uniform(-1, 1, slots) + 1j * rng.uniform(-1, 1, slots)

    ltp = lt.LinearTransformationParameters(
        diagonals_index_list=list(diags.keys()), level_q=params.max_level,
        level_p=params.max_level_p, scale=params.default_scale,
        log_dimensions=(0, params.log_max_slots), log_bsgs_ratio=log_bsgs_ratio)
    transform = ckks_lt.new_linear_transformation(enc, diags, ltp)

    gels = lt.galois_elements(params, list(diags.keys()), slots, log_bsgs_ratio)
    gks = K.gen_galois_keys(jax.random.key(7), params, sk, gels)

    pt = enc.encode(v)
    ct = encryptor.encrypt(jax.random.key(3), params, sk, pt)
    out = lt.evaluate(params, ct, transform, gks)
    ev2 = ckks.Evaluator(params, rlk=ev.rlk)
    out = ev2.rescale(out)
    got = enc.decode(decryptor.decrypt(params, sk, out))
    want = _apply_diag_model(diags, v)
    ckks.precision.assert_precision(want, got, 17)


def test_lintrans_naive(ctx):
    _run_lintrans(ctx, -1, [0, 1, 2, 3], seed=1)


def test_lintrans_naive_no_zero_diag(ctx):
    _run_lintrans(ctx, -1, [1, 5, -2], seed=2)


def test_lintrans_bsgs(ctx):
    _run_lintrans(ctx, 0, [-15, -4, -1, 0, 1, 2, 3, 4, 15], seed=3)


def test_lintrans_bsgs_ratio2(ctx):
    _run_lintrans(ctx, 2, list(range(-8, 9)), seed=4)


def test_permutation(ctx):
    params, enc, sk, ev = ctx
    slots = params.max_slots
    rng = np.random.default_rng(9)
    perm = rng.permutation(slots)
    scalings = rng.uniform(-1, 1, slots)
    mappings = [ckks_lt.PermutationMapping(from_idx=int(perm[i]),
                                           scaling=complex(scalings[i]))
                for i in range(slots)]
    diags = ckks_lt.permutation_diagonals(mappings, slots)
    v = rng.uniform(-1, 1, slots) + 1j * rng.uniform(-1, 1, slots)

    ltp = lt.LinearTransformationParameters(
        diagonals_index_list=list(diags.keys()), level_q=params.max_level,
        level_p=params.max_level_p, scale=params.default_scale,
        log_dimensions=(0, params.log_max_slots), log_bsgs_ratio=1)
    transform = ckks_lt.new_linear_transformation(enc, diags, ltp)
    gels = lt.galois_elements(params, list(diags.keys()), slots, 1)
    gks = K.gen_galois_keys(jax.random.key(8), params, sk, gels)

    ct = encryptor.encrypt(jax.random.key(4), params, sk, enc.encode(v))
    out = ckks.Evaluator(params).rescale(lt.evaluate(params, ct, transform, gks))
    got = enc.decode(decryptor.decrypt(params, sk, out))
    want = scalings * v[perm]
    ckks.precision.assert_precision(want, got, 15)


def test_trace(ctx):
    params, enc, sk, ev = ctx
    rng = np.random.default_rng(10)
    # Trace onto the subring of degree 2^log_n: sums slot orbits.
    log_n = 3
    gels = rlwe_eval.galois_elements_for_trace(params, log_n)
    gks = K.gen_galois_keys(jax.random.key(11), params, sk, gels)
    v = rng.uniform(-1, 1, params.max_slots) + 1j * rng.uniform(-1, 1, params.max_slots)
    ct = encryptor.encrypt(jax.random.key(12), params, sk, enc.encode(v))
    out = rlwe_eval.trace(params, ct, log_n, gks)
    got = enc.decode(decryptor.decrypt(params, sk, out))
    # Plaintext model: the trace loop adds rotations by 2^i slots for
    # i in [log_n, logN-1), pre-scaled by gap^-1 = (N / 2^{log_n+1})^-1:
    # out = gap^-1 * sum_j roll(v, -j * 2^log_n).
    m = 1 << log_n
    want = np.zeros_like(v)
    reps = params.max_slots // m
    for j in range(reps):
        want += np.roll(v, -j * m)
    want /= 1 << (params.log_n - log_n - 1)
    ckks.precision.assert_precision(want, got, 12)
