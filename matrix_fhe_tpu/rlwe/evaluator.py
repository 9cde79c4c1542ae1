"""RLWE evaluator: gadget products, key switching, automorphisms, trace.

Counterpart of /root/reference/core/rlwe/evaluator*.go.  All functions are
pure; the reference's scratch-buffer machinery (evaluator.go:24-62) is
unnecessary under XLA.  Lazy-reduction scheduling (QiOverflowMargin windows,
evaluator_gadget_product.go:148-177) is an implementation detail of the Go
scalar code; we fully reduce per step, which is bit-identical at op
boundaries.
"""

from __future__ import annotations

import collections

import jax
import jax.numpy as jnp

from matrix_fhe_tpu.ops import automorphism as am
from matrix_fhe_tpu.ops import rns_tools as rt
from matrix_fhe_tpu.rlwe.elements import Ciphertext
from matrix_fhe_tpu.rlwe.keys import GadgetCiphertext, GaloisKey, RelinearizationKey
from matrix_fhe_tpu.rlwe.params import Parameters


def decompose_ntt(params: Parameters, level: int, cx: jnp.ndarray,
                  cx_is_ntt: bool = True) -> list[tuple[jnp.ndarray, jnp.ndarray]]:
    """DecomposeNTT (evaluator_gadget_product.go:431-452): all RNS digits of
    cx, each in the NTT domain over (Q, P).  This is the hoistable part of
    rotations (SURVEY.md section 3.4)."""
    rq = params.ring_q.at_level(level)
    rp = params.ring_p
    if cx_is_ntt:
        cx_ntt, cx_inv = cx, rq.intt(cx)
    else:
        cx_ntt, cx_inv = rq.ntt(cx), cx
    dec = params.decomposer(level)
    digits = params.base_rns_decomposition_vector_size(level)
    fn = _pjit("decompose_ntt", params, level, lambda: (
        lambda a, b: [rt.decompose_single_ntt(dec, i, a, b, rq, rp)
                      for i in range(digits)]))
    return fn(cx_ntt, cx_inv)


def decompose_ntt_base2(params: Parameters, level: int, cx: jnp.ndarray,
                        base_two: int, level_p: int, cx_is_ntt: bool = True
                        ) -> list[tuple[jnp.ndarray, jnp.ndarray | None]]:
    """Single-P/bit decomposition of cx (the mask/shift loop of
    gadgetProductSinglePAndBitDecompLazy, evaluator_gadget_product.go:190-303):
    digit (i, j) is the unsigned base-2^B digit j of limb i of INTT(cx),
    broadcast (reduced) to every (Q, P') limb and NTT'd.  Ragged-flattened
    (i)-major, matching the key layout of keys._gen_evaluation_key_arrays_b2."""
    from matrix_fhe_tpu.ops import modmath as mm
    from matrix_fhe_tpu.rlwe.keys import base_two_counts
    rq = params.ring_q.at_level(level)
    rp = None if level_p < 0 else params.ring_p.at_level(level_p)
    cx_inv = rq.intt(cx) if cx_is_ntt else cx
    counts = base_two_counts(params.q[: level + 1], base_two)
    mask = jnp.uint64((1 << base_two) - 1)
    out = []
    for i in range(level + 1):
        ci = cx_inv[..., i, :]
        for j in range(counts[i]):
            cw = (ci >> jnp.uint64(j * base_two)) & mask   # [N] < 2^B
            tq = mm.bred_add(cw[..., None, :], rq.moduli[:, None],
                             rq.bhi[:, None])
            yq = rq.ntt(tq)
            yp = None
            if rp is not None:
                tp = mm.bred_add(cw[..., None, :], rp.moduli[:, None],
                                 rp.bhi[:, None])
                yp = rp.ntt(tp)
            out.append((yq, yp))
    return out


def gadget_product_hoisted_lazy(params: Parameters, level: int,
                                digits: list[tuple[jnp.ndarray, jnp.ndarray]],
                                gadget: GadgetCiphertext):
    """<decomp(cx), gadget> over the extended basis (Q, P) — the P-scaled
    accumulator before ModDown (gadgetProductMultiplePLazy,
    evaluator_gadget_product.go:123-190).  Returns (d0q, d1q, d0p, d1p);
    the p parts are None when the gadget has no auxiliary primes.  The
    auxiliary ring follows the *gadget's* P level (single-P keys carry one
    limb, evaluator_gadget_product.go:190)."""
    rq = params.ring_q.at_level(level)
    rp = None if gadget.p is None else params.ring_p.at_level(gadget.level_p)
    lq = level + 1

    acc = [None, None, None, None]  # d0q, d1q, d0p, d1p
    for i, (yq, yp) in enumerate(digits):
        gq = gadget.q[i, :, :lq, :]
        prod0q = rq.mul_coeffs_montgomery(gq[0], yq)
        prod1q = rq.mul_coeffs_montgomery(gq[1], yq)
        if rp is not None:
            gp = gadget.p[i]
            prod0p = rp.mul_coeffs_montgomery(gp[0], yp)
            prod1p = rp.mul_coeffs_montgomery(gp[1], yp)
        if i == 0:
            acc = [prod0q, prod1q,
                   prod0p if rp is not None else None,
                   prod1p if rp is not None else None]
        else:
            acc[0] = rq.add(acc[0], prod0q)
            acc[1] = rq.add(acc[1], prod1q)
            if rp is not None:
                acc[2] = rp.add(acc[2], prod0p)
                acc[3] = rp.add(acc[3], prod1p)
    return acc


def mod_down_qp(params: Parameters, level: int, xq: jnp.ndarray,
                xp: jnp.ndarray | None) -> jnp.ndarray:
    """Divide a (Q, P') element by P' -> Q (BasisExtender.ModDownQPtoQNTT,
    ring/basis_extension.go:241); P' is read off ``xp`` so truncated-P
    gadget accumulators divide by their own auxiliary basis.  xp None = the
    P-less path (ModDown is the identity, evaluator_gadget_product.go:70)."""
    if params.ring_p is None or xp is None:
        return xq
    lp = int(xp.shape[-2]) - 1
    mdc = params.moddown_constants(level, lp)
    return rt.mod_down(xq, xp, mdc, params.ring_q.at_level(level),
                       params.ring_p.at_level(lp), ntt=True)


def gadget_product_hoisted(params: Parameters, level: int,
                           digits: list[tuple[jnp.ndarray, jnp.ndarray]],
                           gadget: GadgetCiphertext) -> tuple[jnp.ndarray, jnp.ndarray]:
    """<decomp(cx), gadget> over Q after ModDown by P
    (gadgetProductMultiplePLazy + ModDown, evaluator_gadget_product.go:16-60).
    Returns (d0, d1) in the NTT domain over Q at ``level``."""
    def _gph_impl(digits_, gadget_):
        acc = gadget_product_hoisted_lazy(params, level, digits_, gadget_)
        if params.ring_p is None:
            return acc[0], acc[1]
        return (mod_down_qp(params, level, acc[0], acc[2]),
                mod_down_qp(params, level, acc[1], acc[3]))

    fn = _pjit("gadget_product_hoisted", params, level, lambda: _gph_impl)
    return fn(digits, gadget)


# Per-(params, level) compiled key-switch kernels: relin, rotations and
# evk application all funnel through gadget_product with recurring shapes,
# so caching one XLA executable per (params fingerprint, level, flavor)
# replaces thousands of tiny eager dispatches (the dominant cost of
# bootstrapping / lintrans on host backends).  params is closed over.
# Bounded LRU so long-lived processes touching many parameter sets do not
# pin executables forever (ADVICE r3, low).
_JIT_CACHE: collections.OrderedDict = collections.OrderedDict()
_JIT_CACHE_MAX = 1024


def _pjit(name: str, params: Parameters, level: int, make):
    ck = (name, params.n, tuple(params.q), tuple(params.p or ()),
          params.ring_type, level)
    fn = _JIT_CACHE.get(ck)
    if fn is None:
        fn = jax.jit(make())
        _JIT_CACHE[ck] = fn
        while len(_JIT_CACHE) > _JIT_CACHE_MAX:
            _JIT_CACHE.popitem(last=False)
    else:
        _JIT_CACHE.move_to_end(ck)
    return fn


def gadget_product(params: Parameters, level: int, cx: jnp.ndarray,
                   gadget: GadgetCiphertext) -> tuple[jnp.ndarray, jnp.ndarray]:
    """GadgetProduct (evaluator_gadget_product.go:16-30), NTT-domain cx.
    Dispatches on the gadget flavor: multiple-P RNS digits (default) or the
    single-P/base-2^B path (:190-325)."""
    if gadget.base_two > 0:
        def _gp_b2_impl(cx_, g):
            digits = decompose_ntt_base2(params, level, cx_, g.base_two,
                                         g.level_p)
            acc = gadget_product_hoisted_lazy(params, level, digits, g)
            return (mod_down_qp(params, level, acc[0], acc[2]),
                    mod_down_qp(params, level, acc[1], acc[3]))
        fn = _pjit(f"gadget_product_b2_{gadget.base_two}_{gadget.level_p}",
                   params, level, lambda: _gp_b2_impl)
        return fn(cx, gadget)
    fn = _pjit("gadget_product", params, level, lambda: (
        lambda cx_, g: gadget_product_hoisted(
            params, level, decompose_ntt(params, level, cx_), g)))
    return fn(cx, gadget)


def apply_evaluation_key(params: Parameters, ct: Ciphertext, evk) -> Ciphertext:
    """ApplyEvaluationKey (evaluator_evaluationkey.go:37): re-encrypt a
    degree-1 ciphertext from skIn to skOut."""
    level = ct.level
    rq = params.ring_q.at_level(level)
    d0, d1 = gadget_product(params, level, ct.value[1], evk.gadget)
    return ct.with_value((rq.add(d0, ct.value[0]), d1))


def relinearize(params: Parameters, ct: Ciphertext,
                rlk: RelinearizationKey) -> Ciphertext:
    """Relinearize degree-2 -> degree-1 (evaluator_evaluationkey.go:128-153)."""
    if ct.degree != 2:
        raise ValueError("relinearize expects a degree-2 ciphertext")
    level = ct.level
    rq = params.ring_q.at_level(level)
    d0, d1 = gadget_product(params, level, ct.value[2], rlk.gadget)
    return ct.with_value((rq.add(ct.value[0], d0), rq.add(ct.value[1], d1)))


def automorphism(params: Parameters, ct: Ciphertext, gk: GaloisKey) -> Ciphertext:
    """Automorphism X^i -> X^{i galEl} (evaluator_automorphism.go:14-60):
    gadget product of c1 with the Galois key, add c0, then permute both limbs."""
    if ct.degree != 1:
        raise ValueError("automorphism expects a degree-1 ciphertext")
    gal_el = gk.gal_el
    if gal_el == 1:
        return ct
    level = ct.level
    rq = params.ring_q.at_level(level)
    d0, d1 = gadget_product(params, level, ct.value[1], gk.gadget)
    d0 = rq.add(d0, ct.value[0])
    if ct.metadata.is_ntt:
        d0 = am.automorphism_ntt(rq, d0, gal_el)
        d1 = am.automorphism_ntt(rq, d1, gal_el)
    else:
        d0 = am.automorphism_coeff(rq, d0, gal_el)
        d1 = am.automorphism_coeff(rq, d1, gal_el)
    return ct.with_value((d0, d1))


def p_scalar_mform(params: Parameters, level: int) -> jnp.ndarray:
    """MForm(P mod q_i) per Q-limb — for the P-scaling of c0 in lazy
    hoisted paths (MulScalarBigint with ringP.ModulusAtLevel)."""
    big_p = params.big_p()
    return jnp.array([(big_p << 64) % q for q in params.q[:level + 1]],
                     dtype=jnp.uint64)


def automorphism_hoisted_lazy(params: Parameters, ct: Ciphertext,
                              digits: list[tuple[jnp.ndarray, jnp.ndarray]],
                              gk: GaloisKey):
    """AutomorphismHoistedLazy (evaluator_automorphism.go:107-160): returns
    the rotated ciphertext modulo (Q, P), scaled by P:
    (phi(P c0 + d0), phi(d1)) with (d0, d1) the lazy gadget product of c1."""
    level = ct.level
    rq = params.ring_q.at_level(level)
    rp = params.ring_p
    d0q, d1q, d0p, d1p = gadget_product_hoisted_lazy(params, level, digits,
                                                    gk.gadget)
    if rp is not None:
        c0_p = rq.mul_scalar_montgomery(ct.value[0], p_scalar_mform(params, level))
        d0q = rq.add(d0q, c0_p)
    else:
        d0q = rq.add(d0q, ct.value[0])
    out = []
    for xq, xp in ((d0q, d0p), (d1q, d1p)):
        xq = am.automorphism_ntt(rq, xq, gk.gal_el)
        if rp is not None:
            xp = am.automorphism_ntt(rp, xp, gk.gal_el)
        out.append((xq, xp))
    return out


def trace(params: Parameters, ct: Ciphertext, log_n: int,
          gks: dict[int, GaloisKey]) -> Ciphertext:
    """Trace (core/rlwe/inner_sum.go:36-124): projects onto the subring of
    degree 2^log_n — X^k survives iff (N/2^log_n) | k.  The output is
    pre-multiplied by (N/n)^-1 so surviving coefficients keep their value."""
    if ct.degree != 1:
        raise ValueError("trace expects a degree-1 ciphertext")
    level = ct.level
    rq = params.ring_q.at_level(level)
    gap = 1 << (params.log_n - log_n - 1)
    if log_n == 0:
        gap <<= 1
    if params.ring_type == "conjugate_invariant":
        gap >>= 1
    if gap <= 1:
        return ct
    n_inv = pow(gap, -1, rq.modulus_at_level(level))
    sc = jnp.array([(n_inv % q) * (1 << 64) % q for q in rq.moduli_tuple],
                   dtype=jnp.uint64)
    out = ct.with_value(tuple(rq.mul_scalar_montgomery(v, sc) for v in ct.value))
    if not ct.metadata.is_ntt:
        out = out.with_value(tuple(rq.ntt(v) for v in out.value))
        out = out.with_metadata(is_ntt=True)
    for i in range(log_n, params.log_n - 1):
        gal_el = params.galois_element(1 << i)
        out_rot = automorphism(params, out, gks[gal_el])
        out = out.with_value((rq.add(out.value[0], out_rot.value[0]),
                              rq.add(out.value[1], out_rot.value[1])))
    if log_n == 0 and params.ring_type == "standard":
        gal_el = params.nth_root - 1
        out_rot = automorphism(params, out, gks[gal_el])
        out = out.with_value((rq.add(out.value[0], out_rot.value[0]),
                              rq.add(out.value[1], out_rot.value[1])))
    if not ct.metadata.is_ntt:
        out = out.with_value(tuple(rq.intt(v) for v in out.value))
        out = out.with_metadata(is_ntt=False)
    return out


def galois_elements_for_trace(params: Parameters, log_n: int) -> list[int]:
    """GaloisElementsForTrace (inner_sum.go:125-151)."""
    els = [params.galois_element(1 << i) for i in range(log_n, params.log_n - 1)]
    if log_n == 0 and params.ring_type == "standard":
        els.append(params.nth_root - 1)
    return els


def automorphism_hoisted(params: Parameters, ct: Ciphertext,
                         digits: list[tuple[jnp.ndarray, jnp.ndarray]],
                         gk: GaloisKey) -> Ciphertext:
    """AutomorphismHoisted (evaluator_automorphism.go:62-105): reuse a
    precomputed decomposition of c1 across many rotations."""
    level = ct.level
    rq = params.ring_q.at_level(level)
    d0, d1 = gadget_product_hoisted(params, level, digits, gk.gadget)
    d0 = rq.add(d0, ct.value[0])
    d0 = am.automorphism_ntt(rq, d0, gk.gal_el)
    d1 = am.automorphism_ntt(rq, d1, gk.gal_el)
    return ct.with_value((d0, d1))
