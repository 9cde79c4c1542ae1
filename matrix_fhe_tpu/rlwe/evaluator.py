"""RLWE evaluator: gadget products, key switching, automorphisms, trace.

Counterpart of /root/reference/core/rlwe/evaluator*.go.  All functions are
pure; the reference's scratch-buffer machinery (evaluator.go:24-62) is
unnecessary under XLA.  Lazy-reduction scheduling (QiOverflowMargin windows,
evaluator_gadget_product.go:148-177) is an implementation detail of the Go
scalar code; we fully reduce per step, which is bit-identical at op
boundaries.
"""

from __future__ import annotations

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
    return [rt.decompose_single_ntt(dec, i, cx_ntt, cx_inv, rq, rp)
            for i in range(digits)]


def gadget_product_hoisted(params: Parameters, level: int,
                           digits: list[tuple[jnp.ndarray, jnp.ndarray]],
                           gadget: GadgetCiphertext) -> tuple[jnp.ndarray, jnp.ndarray]:
    """<decomp(cx), gadget> over Q after ModDown by P
    (gadgetProductMultiplePLazy + ModDown, evaluator_gadget_product.go:16-60).
    Returns (d0, d1) in the NTT domain over Q at ``level``."""
    rq = params.ring_q.at_level(level)
    rp = params.ring_p
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

    if rp is None:
        return acc[0], acc[1]
    mdc = params.moddown_constants(level, params.max_level_p)
    d0 = rt.mod_down(acc[0], acc[2], mdc, rq, rp, ntt=True)
    d1 = rt.mod_down(acc[1], acc[3], mdc, rq, rp, ntt=True)
    return d0, d1


def gadget_product(params: Parameters, level: int, cx: jnp.ndarray,
                   gadget: GadgetCiphertext) -> tuple[jnp.ndarray, jnp.ndarray]:
    """GadgetProduct (evaluator_gadget_product.go:16-30), NTT-domain cx."""
    return gadget_product_hoisted(params, level, decompose_ntt(params, level, cx), gadget)


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
