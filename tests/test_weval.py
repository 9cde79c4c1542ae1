"""WideEvaluator (45/55-bit path) bit-exactness vs the u64 CKKS evaluator.

Mirror of tests/test_feval.py over the wide pair kernels: every overridden
op of fast/weval.py is checked limb-for-limb against the u64 evaluator on
the same production-width chain and the same keys."""

import numpy as np
import pytest
import jax

from matrix_fhe_tpu.circuits import lintrans as lt
from matrix_fhe_tpu.fast import weval
from matrix_fhe_tpu.ops import wide
from matrix_fhe_tpu.rlwe import encryptor, keys as K
from matrix_fhe_tpu.schemes import ckks
from matrix_fhe_tpu.utils import primes as pr

LOGN = 6


@pytest.fixture(scope="module")
def ctx():
    n = 1 << LOGN
    g55 = pr.NTTFriendlyPrimesGenerator(55, 2 * n)
    g45 = pr.NTTFriendlyPrimesGenerator(45, 2 * n)
    Q = [g55.next_alternating_prime()] + g45.next_alternating_primes(5)
    P = g55.next_alternating_primes(2)
    params = ckks.new_parameters(ckks.CKKSParametersLiteral(
        logn=LOGN, q=tuple(Q), p=tuple(P), log_default_scale=45))
    sk = K.gen_secret_key(jax.random.key(0), params)
    rlk = K.gen_relinearization_key(jax.random.key(1), params, sk)
    gal_els = [params.galois_element(1), params.galois_element(2),
               params.galois_element(4), params.galois_element(-1),
               params.galois_element_inverse()]
    gks = K.gen_galois_keys(jax.random.key(2), params, sk, gal_els)
    u64 = ckks.Evaluator(params, rlk=rlk, galois_keys=gks)
    wev = weval.make_wide_evaluator(params, rlk, gks)
    enc = ckks.Encoder(params)
    wenc = weval.WideEncoder(params)

    rng = np.random.default_rng(7)
    vals = [rng.standard_normal(params.max_slots)
            + 1j * rng.standard_normal(params.max_slots) for _ in range(2)]
    cts = [encryptor.encrypt(jax.random.key(10 + i), params, sk,
                             enc.encode(v)) for i, v in enumerate(vals)]
    return params, sk, u64, wev, enc, wenc, cts


def _mk_eq(params):
    def _eq(a, b):
        for va, vb in zip(a.value, b.value):
            lq = np.asarray(vb).shape[-2]
            np.testing.assert_array_equal(
                wide.unpack_pair(np.asarray(va), params.q[:lq]),
                np.asarray(vb))
        assert a.scale == b.scale
        assert a.level == b.level
    return _eq


def test_encode_cast(ctx):
    params, sk, u64, wev, enc, wenc, cts = ctx
    v = np.arange(params.max_slots) / 7.0
    pu = enc.encode(v)
    pf = wenc.encode(v)
    np.testing.assert_array_equal(
        wide.unpack_pair(np.asarray(pf.value), params.q), np.asarray(pu.value))
    np.testing.assert_allclose(wenc.decode(pf), enc.decode(pu))


def test_linear_and_scalar_ops(ctx):
    params, sk, u64, wev, enc, wenc, cts = ctx
    _eq = _mk_eq(params)
    a, b = cts
    fa = weval.ct_to_wide(a, params)
    fb = weval.ct_to_wide(b, params)
    _eq(wev.add(fa, fb), u64.add(a, b))
    _eq(wev.sub(fa, fb), u64.sub(a, b))
    _eq(wev.neg(fa), u64.neg(a))
    _eq(wev.add_const(fa, 1.25 - 0.5j), u64.add_const(a, 1.25 - 0.5j))
    _eq(wev.sub_const(fa, 0.75), u64.sub_const(a, 0.75))
    _eq(wev.mul_const(fa, 1.5), u64.mul_const(a, 1.5))
    _eq(wev.mul_const_complex(fa, 0.3 + 0.1j),
        u64.mul_const_complex(a, 0.3 + 0.1j))
    _eq(wev.scale_up(fa, 9), u64.scale_up(a, 9))
    pt = enc.encode(np.ones(params.max_slots) * 0.5)
    fpt = wenc.encode(np.ones(params.max_slots) * 0.5)
    _eq(wev.add_plain(fa, fpt), u64.add_plain(a, pt))
    _eq(wev.mul_plain(fa, fpt), u64.mul_plain(a, pt))


def test_mul_relin_rescale(ctx):
    params, sk, u64, wev, enc, wenc, cts = ctx
    _eq = _mk_eq(params)
    a, b = cts
    fa = weval.ct_to_wide(a, params)
    fb = weval.ct_to_wide(b, params)
    pu = u64.mul_relin(a, b)
    pf = wev.mul_relin(fa, fb)
    _eq(pf, pu)
    _eq(wev.rescale(pf), u64.rescale(pu))
    _eq(wev.set_scale(pf, params.default_scale),
        u64.set_scale(pu, params.default_scale))


def test_automorphisms(ctx):
    params, sk, u64, wev, enc, wenc, cts = ctx
    _eq = _mk_eq(params)
    a = cts[0]
    fa = weval.ct_to_wide(a, params)
    _eq(wev.rotate(fa, 2), u64.rotate(a, 2))
    _eq(wev.conjugate(fa), u64.conjugate(a))
    ru = u64.rotate_hoisted(a, [0, 1, 4])
    rf = wev.rotate_hoisted(fa, [0, 1, 4])
    for k in ru:
        _eq(rf[k], ru[k])


def test_trace_and_mod_raise(ctx):
    params, sk, u64, wev, enc, wenc, cts = ctx
    _eq = _mk_eq(params)
    a = cts[0]
    fa = weval.ct_to_wide(a, params)
    els = [params.galois_element(1 << i) for i in range(3, params.log_n - 1)]
    gks2 = dict(u64.gks)
    gks2.update(K.gen_galois_keys(jax.random.key(3), params, sk, els))
    u64b = ckks.Evaluator(params, rlk=u64.rlk, galois_keys=gks2)
    wevb = weval.make_wide_evaluator(params, u64.rlk, gks2)
    _eq(wevb.trace_log_n(fa, 3), u64b.trace_log_n(a, 3))

    low = u64._drop_level(a, 0)
    flow = weval.ct_to_wide(low, params)
    _eq(wev.mod_raise(flow), u64.mod_raise(low))


def test_apply_evaluation_key(ctx):
    params, sk, u64, wev, enc, wenc, cts = ctx
    _eq = _mk_eq(params)
    sk2 = K.gen_secret_key(jax.random.key(20), params)
    evk = K.gen_evaluation_key(jax.random.key(21), params, sk.value.q, sk2)
    a = cts[0]
    fa = weval.ct_to_wide(a, params)
    _eq(wev.apply_evaluation_key(fa, evk), u64.apply_evaluation_key(a, evk))


def test_evaluate_lintrans(ctx):
    params, sk, u64, wev, enc, wenc, cts = ctx
    _eq = _mk_eq(params)
    a = cts[0]
    fa = weval.ct_to_wide(a, params)
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
    wevb = weval.make_wide_evaluator(params, u64.rlk, gks2)
    _eq(wevb.evaluate_lintrans(fa, ltr), u64b.evaluate_lintrans(a, ltr))


def test_evaluate_lintrans_naive(ctx):
    """The n1 == 0 single-hoisted loop on the wide kernels, bit-exact vs
    the u64 naive evaluator."""
    params, sk, u64, wev, enc, wenc, cts = ctx
    _eq = _mk_eq(params)
    a = cts[0]
    fa = weval.ct_to_wide(a, params)
    slots = params.max_slots
    rng = np.random.default_rng(5)
    diags = {0: rng.standard_normal(slots), 2: rng.standard_normal(slots),
             slots - 2: rng.standard_normal(slots)}
    from fractions import Fraction
    ltp = lt.LinearTransformationParameters(
        diagonals_index_list=list(diags.keys()), level_q=a.level,
        level_p=params.max_level_p, scale=Fraction(params.q[a.level]),
        log_dimensions=(0, params.log_max_slots), log_bsgs_ratio=-1)
    ltr = lt.encode(enc.embed_qp, diags, ltp)
    assert ltr.n1 == 0
    els = lt.galois_elements(params, list(diags.keys()), slots, -1)
    gks2 = dict(u64.gks)
    gks2.update(K.gen_galois_keys(jax.random.key(6), params, sk, els))
    u64b = ckks.Evaluator(params, rlk=u64.rlk, galois_keys=gks2)
    wevb = weval.make_wide_evaluator(params, u64.rlk, gks2)
    _eq(wevb.evaluate_lintrans(fa, ltr), u64b.evaluate_lintrans(a, ltr))
