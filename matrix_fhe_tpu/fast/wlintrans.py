"""Wide-path (45-55-bit) double-hoisted BSGS diagonal-matrix multiply.

Mirror of fast/flintrans.py (itself mirroring circuits/lintrans.py and the
reference's lintrans_evaluator.go:256-430) over the wide pair kernels: one
shared decomposition, P-scaled lazy baby-step rotations in the (Q, P)
basis, per-giant-step ModDown + key-switch.  The core operator of
CoeffsToSlots/SlotsToCoeffs and wide bootstrapping.

Bit-exact vs the u64 circuits/lintrans.py evaluator on the same moduli and
keys (tests/test_weval.py).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from matrix_fhe_tpu.circuits import lintrans as lt_mod
from matrix_fhe_tpu.ops import wide
from matrix_fhe_tpu.fast import wrns
from matrix_fhe_tpu.fast.wckks import (WideCKKSContext, _auto_index,
                                       decompose_ks, ks_mac)


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["vec"],
    meta_fields=["n1", "log_dimensions"],
)
@dataclasses.dataclass(frozen=True)
class WideLinearTransformation:
    """Wide plain-domain mirror of circuits/lintrans.LinearTransformation."""
    n1: int
    log_dimensions: tuple[int, int]
    vec: dict[int, tuple[jnp.ndarray, jnp.ndarray]]  # pair (ptq, ptp)

    def bsgs_index(self):
        cols = 1 << self.log_dimensions[1]
        return lt_mod.bsgs_index(list(self.vec.keys()), cols, self.n1)


def convert_lintrans(params, lt: lt_mod.LinearTransformation
                     ) -> WideLinearTransformation:
    """u64 (Montgomery/NTT) encoded diagonals -> plain-domain wide pairs."""
    uq, up = params.ring_q, params.ring_p
    m = wide.use_pair31(list(params.q) + list(params.p or ()))
    vec = {}
    for k, (ptq, ptp) in lt.vec.items():
        lq = ptq.shape[-2]
        q_pair = wide.pack_pair(
            np.asarray(uq.at_level(lq - 1).imform(ptq)), params.q[:lq], m)
        p_pair = wide.pack_pair(np.asarray(up.imform(ptp)), params.p, m)
        vec[k] = (jnp.asarray(q_pair), jnp.asarray(p_pair))
    return WideLinearTransformation(
        n1=lt.n1, log_dimensions=lt.log_dimensions, vec=vec)


def _p_planes(ctx: WideCKKSContext):
    """(P mod q_i) per Q limb as const digit planes."""
    big_p = 1
    for p in ctx.ring_p.moduli_tuple:
        big_p *= p
    return wide.const_planes(ctx.ring_q.tabs,
                             [big_p % q for q in ctx.ring_q.moduli_tuple])


def _mul_acc(ring, pt, x, acc):
    prod = wide.mulmod(ring.tabs, pt, x)
    return prod if acc is None else ring.add(acc, prod)


def rotations_hoisted_lazy(ctx: WideCKKSContext, c0, c1, gal_els):
    """phi_i of the P-scaled key-switched ciphertext, in (Q, P), one shared
    decomposition (AutomorphismHoistedLazy,
    core/rlwe/evaluator_automorphism.go:107-160)."""
    rq = ctx.ring_q
    yq, yp = decompose_ks(ctx, c1)
    c0_p = wide.mulmod_planes(rq.tabs, c0, _p_planes(ctx))
    out = {}
    for g in gal_els:
        gk_q, gk_p = ctx.galois_key(g)
        d_q, d_p = ks_mac(ctx, gk_q, gk_p, yq, yp)
        r0q = rq.add(d_q[0], c0_p)
        idx = _auto_index(ctx, g)
        out[g] = ((r0q[..., idx], d_p[0][..., idx]),
                  (d_q[1][..., idx], d_p[1][..., idx]))
    return out


def matvec_bsgs(ctx: WideCKKSContext, wlt: WideLinearTransformation,
                c0, c1, galois_element):
    """Double-hoisted BSGS diagonal-matrix multiply of an NTT-domain
    degree-1 wide ciphertext.  Returns (out0, out1) pairs [2, LQ, N] at the
    input level (caller rescales)."""
    rq, rp = ctx.ring_q, ctx.ring_p
    index, _, rot_n2 = wlt.bsgs_index()

    inner = [i for i in rot_n2 if i != 0]
    pre = rotations_hoisted_lazy(ctx, c0, c1,
                                 [galois_element(i) for i in inner])
    pre = {i: pre[galois_element(i)] for i in inner}

    pp = _p_planes(ctx)
    c0_p = wide.mulmod_planes(rq.tabs, c0, pp)
    c1_p = wide.mulmod_planes(rq.tabs, c1, pp)

    out = [None, None, None, None]  # out0q, out1q, out0p, out1p
    lq = rq.num_limbs
    for j in sorted(index.keys()):
        t0q = t1q = t0p = t1p = None
        for i in index[j]:
            ptq, ptp = wlt.vec[j + i]
            ptq = ptq[..., :lq, :]
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
            t0p = jnp.zeros(c0.shape[:-3] + (2, rp.num_limbs, rq.n),
                            jnp.int32)
        if t1p is None:
            t1p = jnp.zeros_like(t0p)

        if j != 0:
            t1 = wrns.mod_down(t1q, t1p, ctx.mdc, rq, rp, ntt=True)
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

    out0 = wrns.mod_down(out[0], out[2], ctx.mdc, rq, rp, ntt=True)
    out1 = wrns.mod_down(out[1], out[3], ctx.mdc, rq, rp, ntt=True)
    return out0, out1


def matvec_naive(ctx: WideCKKSContext, wlt: WideLinearTransformation,
                 c0, c1, galois_element):
    """Naive single-hoisted diagonal loop (lintrans_evaluator.go:131-255)
    on the wide pair kernels — the n1 == 0 form matvec_bsgs does not
    cover."""
    rq, rp = ctx.ring_q, ctx.ring_p
    slots = 1 << wlt.log_dimensions[1]
    keys = sorted(wlt.vec.keys())
    state = bool(keys) and keys[0] == 0
    if state:
        keys = keys[1:]
    keys = [k & (slots - 1) for k in keys]
    gal = {k: galois_element(k) for k in keys}
    pre = rotations_hoisted_lazy(ctx, c0, c1,
                                 [gal[k] for k in keys]) if keys else {}

    acc = [None, None, None, None]
    lq = rq.num_limbs
    for k in keys:
        (r0q, r0p), (r1q, r1p) = pre[gal[k]]
        ptq, ptp = wlt.vec[k]
        ptq = ptq[..., :lq, :]
        acc[0] = _mul_acc(rq, ptq, r0q, acc[0])
        acc[2] = _mul_acc(rp, ptp, r0p, acc[2])
        acc[1] = _mul_acc(rq, ptq, r1q, acc[1])
        acc[3] = _mul_acc(rp, ptp, r1p, acc[3])

    if acc[0] is None:
        out0 = jnp.zeros_like(c0)
        out1 = jnp.zeros_like(c1)
    else:
        out0 = wrns.mod_down(acc[0], acc[2], ctx.mdc, rq, rp, ntt=True)
        out1 = wrns.mod_down(acc[1], acc[3], ctx.mdc, rq, rp, ntt=True)

    if state:
        ptq = wlt.vec[0][0][..., :lq, :]
        out0 = rq.add(out0, wide.mulmod(rq.tabs, ptq, c0))
        out1 = rq.add(out1, wide.mulmod(rq.tabs, ptq, c1))
    return out0, out1
