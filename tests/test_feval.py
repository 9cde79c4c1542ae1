"""FastEvaluator (int32 path) bit-exactness vs the u64 CKKS evaluator.

Every overridden op of fast/feval.py is checked limb-for-limb against the
u64 evaluator on the same small-prime chain and the same keys (the fast
path's correctness contract, SURVEY.md §7.1: exactness at fully-reduced op
boundaries).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from matrix_fhe_tpu.circuits import lintrans as lt
from matrix_fhe_tpu.fast import feval
from matrix_fhe_tpu.rlwe import encryptor, keys as K
from matrix_fhe_tpu.schemes import ckks

LOGN = 6


@pytest.fixture(scope="module")
def ctx():
    params = ckks.new_parameters(ckks.CKKSParametersLiteral(
        logn=LOGN, logq=(22,) * 6, logp=(22, 22), log_default_scale=15))
    sk = K.gen_secret_key(jax.random.key(0), params)
    rlk = K.gen_relinearization_key(jax.random.key(1), params, sk)
    gal_els = [params.galois_element(1), params.galois_element(2),
               params.galois_element(4), params.galois_element(-1),
               params.galois_element_inverse()]
    gks = K.gen_galois_keys(jax.random.key(2), params, sk, gal_els)
    u64 = ckks.Evaluator(params, rlk=rlk, galois_keys=gks)
    fast = feval.make_fast_evaluator(params, rlk, gks)
    enc = ckks.Encoder(params)
    fenc = feval.FastEncoder(params)

    rng = np.random.default_rng(7)
    vals = [rng.standard_normal(params.max_slots)
            + 1j * rng.standard_normal(params.max_slots) for _ in range(2)]
    cts = [encryptor.encrypt(jax.random.key(10 + i), params, sk,
                             enc.encode(v)) for i, v in enumerate(vals)]
    return params, sk, u64, fast, enc, fenc, cts


def _eq(a, b):
    for va, vb in zip(a.value, b.value):
        np.testing.assert_array_equal(np.asarray(feval.to_uint64(va)),
                                      np.asarray(vb))
    assert a.scale == b.scale
    assert a.level == b.level


def test_encode_cast(ctx):
    params, sk, u64, fast, enc, fenc, cts = ctx
    v = np.arange(params.max_slots) / 7.0
    pu = enc.encode(v)
    pf = fenc.encode(v)
    np.testing.assert_array_equal(np.asarray(feval.to_uint64(pf.value)),
                                  np.asarray(pu.value))
    np.testing.assert_allclose(fenc.decode(pf), enc.decode(pu))


def test_linear_and_scalar_ops(ctx):
    params, sk, u64, fast, enc, fenc, cts = ctx
    a, b = cts
    fa, fb = feval.ct_to_fast(a), feval.ct_to_fast(b)
    _eq(fast.add(fa, fb), u64.add(a, b))
    _eq(fast.sub(fa, fb), u64.sub(a, b))
    _eq(fast.neg(fa), u64.neg(a))
    _eq(fast.add_const(fa, 1.25 - 0.5j), u64.add_const(a, 1.25 - 0.5j))
    _eq(fast.sub_const(fa, 0.75), u64.sub_const(a, 0.75))
    _eq(fast.mul_const(fa, 1.5), u64.mul_const(a, 1.5))
    _eq(fast.mul_const_complex(fa, 0.3 + 0.1j),
        u64.mul_const_complex(a, 0.3 + 0.1j))
    _eq(fast.scale_up(fa, 9), u64.scale_up(a, 9))
    pt = enc.encode(np.ones(params.max_slots) * 0.5)
    fpt = fenc.encode(np.ones(params.max_slots) * 0.5)
    _eq(fast.add_plain(fa, fpt), u64.add_plain(a, pt))
    _eq(fast.mul_plain(fa, fpt), u64.mul_plain(a, pt))


def test_mul_relin_rescale(ctx):
    params, sk, u64, fast, enc, fenc, cts = ctx
    a, b = cts
    fa, fb = feval.ct_to_fast(a), feval.ct_to_fast(b)
    pu = u64.mul_relin(a, b)
    pf = fast.mul_relin(fa, fb)
    _eq(pf, pu)
    _eq(fast.rescale(pf), u64.rescale(pu))
    # set_scale consumes a level through mul_const+rescale
    _eq(fast.set_scale(pf, params.default_scale),
        u64.set_scale(pu, params.default_scale))


def test_automorphisms(ctx):
    params, sk, u64, fast, enc, fenc, cts = ctx
    a = cts[0]
    fa = feval.ct_to_fast(a)
    _eq(fast.rotate(fa, 2), u64.rotate(a, 2))
    _eq(fast.conjugate(fa), u64.conjugate(a))
    ru = u64.rotate_hoisted(a, [0, 1, 4])
    rf = fast.rotate_hoisted(fa, [0, 1, 4])
    for k in ru:
        _eq(rf[k], ru[k])


def test_trace_and_mod_raise(ctx):
    params, sk, u64, fast, enc, fenc, cts = ctx
    a = cts[0]
    fa = feval.ct_to_fast(a)
    # extra galois keys for the trace orbit
    els = [params.galois_element(1 << i) for i in range(3, params.log_n - 1)]
    gks2 = dict(u64.gks)
    gks2.update(K.gen_galois_keys(jax.random.key(3), params, sk, els))
    u64b = ckks.Evaluator(params, rlk=u64.rlk, galois_keys=gks2)
    fastb = feval.make_fast_evaluator(params, u64.rlk, gks2)
    _eq(fastb.trace_log_n(fa, 3), u64b.trace_log_n(a, 3))

    low = u64._drop_level(a, 0)
    flow = feval.ct_to_fast(low)
    _eq(fast.mod_raise(flow), u64.mod_raise(low))


def test_apply_evaluation_key(ctx):
    params, sk, u64, fast, enc, fenc, cts = ctx
    sk2 = K.gen_secret_key(jax.random.key(20), params)
    evk = K.gen_evaluation_key(jax.random.key(21), params, sk.value.q, sk2)
    a = cts[0]
    fa = feval.ct_to_fast(a)
    _eq(fast.apply_evaluation_key(fa, evk), u64.apply_evaluation_key(a, evk))


def test_evaluate_lintrans(ctx):
    params, sk, u64, fast, enc, fenc, cts = ctx
    a = cts[0]
    fa = feval.ct_to_fast(a)
    slots = params.max_slots
    rng = np.random.default_rng(3)
    diags = {0: rng.standard_normal(slots), 1: rng.standard_normal(slots),
             slots - 1: rng.standard_normal(slots)}
    from fractions import Fraction
    ltp = lt.LinearTransformationParameters(
        diagonals_index_list=list(diags.keys()), level_q=a.level,
        level_p=params.max_level_p, scale=Fraction(params.q[a.level]),
        log_dimensions=(0, params.log_max_slots), log_bsgs_ratio=1)
    ltr = lt.encode(enc.embed_qp, diags, ltp)
    els = lt.galois_elements(params, list(diags.keys()), slots, 1)
    gks2 = dict(u64.gks)
    gks2.update(K.gen_galois_keys(jax.random.key(4), params, sk, els))
    u64b = ckks.Evaluator(params, rlk=u64.rlk, galois_keys=gks2)
    fastb = feval.make_fast_evaluator(params, u64.rlk, gks2)
    _eq(fastb.evaluate_lintrans(fa, ltr), u64b.evaluate_lintrans(a, ltr))
