"""Fast-path (int32) double-hoisted BSGS diagonal-matrix multiplication.

Mirror of circuits/lintrans.py:_multiply_by_diag_matrix_bsgs (itself the
reference's lintrans_evaluator.go:256-430) on the int32 fast domain: the
ciphertext is decomposed ONCE, baby-step rotations stay P-scaled in the
(Q, P) basis (no per-rotation ModDown), plaintext diagonals multiply-
accumulate in QP, and each giant step costs one ModDown + one key-switch.
This is the core operator of CoeffsToSlots/SlotsToCoeffs and bootstrapping.

Bit-exact vs the u64 circuits/lintrans.py evaluator on the same moduli and
keys (tests/test_flintrans.py).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from matrix_fhe_tpu.circuits import lintrans as lt_mod
from matrix_fhe_tpu.fast import fring, frns
from matrix_fhe_tpu.fast.fckks import (FastCKKSContext, _auto_index,
                                       decompose_ks, ks_mac)


@dataclasses.dataclass(frozen=True)
class FastLinearTransformation:
    """int32 plain-domain mirror of circuits/lintrans.LinearTransformation."""
    n1: int
    log_dimensions: tuple[int, int]
    vec: dict[int, tuple[jnp.ndarray, jnp.ndarray]]  # int32 (ptq, ptp)

    def bsgs_index(self):
        cols = 1 << self.log_dimensions[1]
        return lt_mod.bsgs_index(list(self.vec.keys()), cols, self.n1)


def convert_lintrans(params, lt: lt_mod.LinearTransformation
                     ) -> FastLinearTransformation:
    """u64 (Montgomery/NTT) encoded diagonals -> plain-domain int32."""
    uq, up = params.ring_q, params.ring_p
    vec = {}
    for k, (ptq, ptp) in lt.vec.items():
        q32 = np.asarray(uq.at_level(ptq.shape[-2] - 1).imform(ptq)
                         ).astype(np.int64).astype(np.int32)
        p32 = np.asarray(up.imform(ptp)).astype(np.int64).astype(np.int32)
        vec[k] = (jnp.asarray(q32), jnp.asarray(p32))
    return FastLinearTransformation(
        n1=lt.n1, log_dimensions=lt.log_dimensions, vec=vec)


def _p_mod_q(ctx: FastCKKSContext) -> jnp.ndarray:
    """(P mod q_i) per Q limb, int32 (the P-scaling of c0/c1 in lazy
    hoisted paths)."""
    big_p = 1
    for p in ctx.ring_p.moduli_tuple:
        big_p *= p
    return jnp.asarray(np.array(
        [big_p % q for q in ctx.ring_q.moduli_tuple], dtype=np.int32))


def _mul_acc(ring: fring.FastRing, pt, x, acc):
    """acc += pt * x (lazy-centered product, canonical accumulate)."""
    prod = fring.mulmod_lazy_centered(pt, x, ring.moduli[:, None],
                                      ring.qinv_f[:, None])
    prod = fring.canon(prod, ring.moduli[:, None])
    return prod if acc is None else ring.add(acc, prod)


def rotations_hoisted_lazy(ctx: FastCKKSContext, c0, c1, gal_els):
    """phi_i of the P-scaled key-switched ciphertext, in (Q, P), one shared
    decomposition (AutomorphismHoistedLazy,
    core/rlwe/evaluator_automorphism.go:107-160).

    Returns {gal_el: ((r0q, r0p), (r1q, r1p))}."""
    rq, rp = ctx.ring_q, ctx.ring_p
    yq, yp = decompose_ks(ctx, c1)
    p_sc = _p_mod_q(ctx)[:, None]
    c0_p = rq.mul_coeffs_montgomery(c0, jnp.broadcast_to(p_sc, c0.shape))
    out = {}
    for g in gal_els:
        gk_q, gk_p = ctx.galois_key(g)
        d_q, d_p = ks_mac(ctx, gk_q, gk_p, yq, yp)
        r0q = rq.add(d_q[0], c0_p)
        idx = _auto_index(ctx, g)
        out[g] = ((r0q[..., idx], d_p[0][..., idx]),
                  (d_q[1][..., idx], d_p[1][..., idx]))
    return out


def matvec_bsgs(ctx: FastCKKSContext, flt: FastLinearTransformation,
                c0, c1, galois_element):
    """Double-hoisted BSGS diagonal-matrix multiply of an NTT-domain
    degree-1 ciphertext.  ``galois_element(k)`` maps a rotation amount to
    its galois element (params.galois_element of the u64 path).

    Returns (out0, out1) int32 [LQ, N] at the input level (caller rescales).
    """
    rq, rp = ctx.ring_q, ctx.ring_p
    index, _, rot_n2 = flt.bsgs_index()

    # hoisted P-scaled baby-step rotations (one decomposition)
    inner = [i for i in rot_n2 if i != 0]
    pre = rotations_hoisted_lazy(ctx, c0, c1,
                                 [galois_element(i) for i in inner])
    pre = {i: pre[galois_element(i)] for i in inner}

    p_sc = _p_mod_q(ctx)[:, None]
    c0_p = rq.mul_coeffs_montgomery(c0, jnp.broadcast_to(p_sc, c0.shape))
    c1_p = rq.mul_coeffs_montgomery(c1, jnp.broadcast_to(p_sc, c1.shape))

    out = [None, None, None, None]  # out0q, out1q, out0p, out1p
    lq = rq.num_limbs
    for j in sorted(index.keys()):
        t0q = t1q = t0p = t1p = None
        for i in index[j]:
            ptq, ptp = flt.vec[j + i]
            ptq = ptq[..., :lq, :]  # pts are encoded at their top level and
            #                         sliced to the live limbs (_slice_pt)
            if i == 0:
                t0q = _mul_acc(rq, ptq, c0_p, t0q)
                t1q = _mul_acc(rq, ptq, c1_p, t1q)
            else:
                (r0q, r0p), (r1q, r1p) = pre[i]
                t0q = _mul_acc(rq, ptq, r0q, t0q)
                t0p = _mul_acc(rp, ptp, r0p, t0p)
                t1q = _mul_acc(rq, ptq, r1q, t1q)
                t1p = _mul_acc(rp, ptp, r1p, t1p)
        if t0p is None:
            t0p = jnp.zeros(c0.shape[:-2] + (rp.num_limbs, rq.n), jnp.int32)
        if t1p is None:
            t1p = jnp.zeros_like(t0p)

        if j != 0:
            t1 = frns.mod_down(t1q, t1p, ctx.mdc, rq, rp, ntt=True)
            g = galois_element(j)
            gk_q, gk_p = ctx.galois_key(g)
            d_q, d_p = ks_mac(ctx, gk_q, gk_p, *decompose_ks(ctx, t1))
            d0q = rq.add(d_q[0], t0q)
            d0p = rp.add(d_p[0], t0p)
            d1q, d1p = d_q[1], d_p[1]
            idx = _auto_index(ctx, g)
            d0q, d0p = d0q[..., idx], d0p[..., idx]
            d1q, d1p = d1q[..., idx], d1p[..., idx]
        else:
            d0q, d1q, d0p, d1p = t0q, t1q, t0p, t1p

        out[0] = d0q if out[0] is None else rq.add(out[0], d0q)
        out[1] = d1q if out[1] is None else rq.add(out[1], d1q)
        out[2] = d0p if out[2] is None else rp.add(out[2], d0p)
        out[3] = d1p if out[3] is None else rp.add(out[3], d1p)

    out0 = frns.mod_down(out[0], out[2], ctx.mdc, rq, rp, ntt=True)
    out1 = frns.mod_down(out[1], out[3], ctx.mdc, rq, rp, ntt=True)
    return out0, out1


def matvec_naive(ctx: FastCKKSContext, flt: FastLinearTransformation,
                 c0, c1, galois_element):
    """Naive single-hoisted diagonal loop (lintrans_evaluator.go:131-255,
    the n1 == 0 / log_bsgs_ratio < 0 form): one shared decomposition, one
    lazy key-switched rotation per nonzero diagonal, one final ModDown.
    Mirrors circuits/lintrans._multiply_by_diag_matrix on the int32
    kernels."""
    rq, rp = ctx.ring_q, ctx.ring_p
    slots = 1 << flt.log_dimensions[1]
    keys = sorted(flt.vec.keys())
    state = bool(keys) and keys[0] == 0
    if state:
        keys = keys[1:]
    keys = [k & (slots - 1) for k in keys]
    gal = {k: galois_element(k) for k in keys}
    pre = rotations_hoisted_lazy(ctx, c0, c1,
                                 [gal[k] for k in keys]) if keys else {}

    acc = [None, None, None, None]  # out0q, out1q, out0p, out1p
    lq = rq.num_limbs
    for k in keys:
        (r0q, r0p), (r1q, r1p) = pre[gal[k]]
        ptq, ptp = flt.vec[k]
        ptq = ptq[..., :lq, :]
        acc[0] = _mul_acc(rq, ptq, r0q, acc[0])
        acc[2] = _mul_acc(rp, ptp, r0p, acc[2])
        acc[1] = _mul_acc(rq, ptq, r1q, acc[1])
        acc[3] = _mul_acc(rp, ptp, r1p, acc[3])

    if acc[0] is None:
        out0 = jnp.zeros_like(c0)
        out1 = jnp.zeros_like(c1)
    else:
        out0 = frns.mod_down(acc[0], acc[2], ctx.mdc, rq, rp, ntt=True)
        out1 = frns.mod_down(acc[1], acc[3], ctx.mdc, rq, rp, ntt=True)

    if state:
        ptq = flt.vec[0][0][..., :lq, :]
        out0 = rq.add(out0, fring.canon(fring.mulmod_lazy_centered(
            ptq, c0, rq.moduli[:, None], rq.qinv_f[:, None]),
            rq.moduli[:, None]))
        out1 = rq.add(out1, fring.canon(fring.mulmod_lazy_centered(
            ptq, c1, rq.moduli[:, None], rq.qinv_f[:, None]),
            rq.moduli[:, None]))
    return out0, out1
