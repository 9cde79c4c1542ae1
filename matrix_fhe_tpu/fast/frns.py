"""Fast-path RNS meta-operations: rescale, basis extension, decomposition.

int32/f32 mirrors of ops/rns_tools.py (which itself mirrors
/root/reference/ring/scaling.go and ring/basis_extension.go).  Value
semantics at fully-reduced op boundaries are identical; the float64
``v``-correction of the approximate base extension keeps the reference's
ordered-accumulation semantics (basis_extension.go:550-594) so outputs match
the u64 path bit-for-bit on the same moduli.

All polynomials are int32 [..., L, N], canonical in [0, q).  Bounds: with
q < 2^23 and <= 40 limbs, every lazy-centered accumulation stays below 2^29,
inside the exact range of ``fring.reduce_once``.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from matrix_fhe_tpu.fast import fring
from matrix_fhe_tpu.fast.fring import FastRing, canon, mulmod, reduce_once


# ---------------------------------------------------------------------------
# Rescaling (ring/scaling.go, fast mirror of ops/rns_tools.py:49-116).
# ---------------------------------------------------------------------------

def _red_to(v: jnp.ndarray, ring: FastRing) -> jnp.ndarray:
    """Reduce nonneg int32 values (< 2^30) into [0, q) per limb."""
    q = ring.moduli[:, None]
    return canon(reduce_once(v, q, ring.qinv_f[:, None]), q)


def div_round_by_last_modulus(ring: FastRing, p: jnp.ndarray) -> jnp.ndarray:
    """Rounded coeff-domain rescale [.., L, N] -> [.., L-1, N]
    (scaling.go:111-126): out_i = (x_i + h - t) * q_l^{-1} mod q_i."""
    L = p.shape[-2]
    lvl = L - 1
    ql = ring.moduli_tuple[lvl]
    h = (ql - 1) >> 1
    t = p[..., lvl:lvl + 1, :] + jnp.int32(h)
    t = jnp.where(t >= ql, t - ql, t)  # (x_l + h) mod q_l

    sub = ring.at_level(lvl - 1)
    q = sub.moduli[:, None]
    t_red = _red_to(t, sub)
    h_mod = jnp.array([h % m for m in ring.moduli_tuple[:lvl]],
                      dtype=jnp.int32)[:, None]
    qlinv = jnp.array([pow(ql, -1, m) for m in ring.moduli_tuple[:lvl]],
                      dtype=jnp.int32)
    acc = p[..., :lvl, :] + h_mod + (2 * q - t_red)  # in [0, 4q)
    acc = canon(reduce_once(acc, q, sub.qinv_f[:, None]), q)
    return sub.mul_scalar_montgomery(acc, qlinv)


def div_round_by_last_modulus_many_ntt(ring: FastRing, p: jnp.ndarray,
                                       nb: int) -> jnp.ndarray:
    """NTT-domain rounded rescale dropping ``nb`` limbs
    (DivRoundByLastModulusManyNTT, scaling.go:130-162)."""
    if nb == 0:
        return p
    L = p.shape[-2]
    x = ring.at_level(L - 1).intt(p)
    for k in range(nb):
        x = div_round_by_last_modulus(ring.at_level(L - 1 - k), x)
    return ring.at_level(L - 1 - nb).ntt(x)


# ---------------------------------------------------------------------------
# Basis extension (basis_extension.go, fast mirror of rns_tools.py:134-251).
# ---------------------------------------------------------------------------

@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["qoverqi_inv_qi", "qoverqi_mod_p", "negq_mod_p",
                 "qhalf_mod_qi", "qhalf_mod_p", "src_q_f64"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class FastModUpConstants:
    qoverqi_inv_qi: jnp.ndarray  # int32 [LQ]     (Q/qi)^-1 mod qi (plain)
    qoverqi_mod_p: jnp.ndarray   # int32 [LP, LQ] Q/qi mod pj (plain)
    negq_mod_p: jnp.ndarray      # int32 [LP]     (-Q) mod pj
    qhalf_mod_qi: jnp.ndarray    # int32 [LQ]     (Q>>1) mod qi
    qhalf_mod_p: jnp.ndarray     # int32 [LP]     (Q>>1) mod pj
    src_q_f64: jnp.ndarray       # f64 [LQ]       qi (v correction divides,
    #                              matching basis_extension.go:550-594 exactly)


def gen_fast_modup_constants(Q: list[int], P: list[int]) -> FastModUpConstants:
    LQ, LP = len(Q), len(P)
    big_q = 1
    for q in Q:
        big_q *= q
    qhalf = big_q >> 1
    inv = np.zeros(LQ, dtype=np.int32)
    mod_p = np.zeros((LP, LQ), dtype=np.int32)
    for i, qi in enumerate(Q):
        qstar = big_q // qi
        inv[i] = pow(qstar % qi, qi - 2, qi)
        for j, pj in enumerate(P):
            mod_p[j, i] = qstar % pj
    return FastModUpConstants(
        qoverqi_inv_qi=jnp.asarray(inv),
        qoverqi_mod_p=jnp.asarray(mod_p),
        negq_mod_p=jnp.asarray(np.array(
            [(p - big_q % p) % p for p in P], dtype=np.int32)),
        qhalf_mod_qi=jnp.asarray(np.array([qhalf % q for q in Q],
                                          dtype=np.int32)),
        qhalf_mod_p=jnp.asarray(np.array([qhalf % p for p in P],
                                         dtype=np.int32)),
        src_q_f64=jnp.asarray(np.array(Q, dtype=np.float64)),
    )


def mod_up(x: jnp.ndarray, muc: FastModUpConstants, src: FastRing,
           dst: FastRing, centered: bool = True) -> jnp.ndarray:
    """ModUpExact (basis_extension.go:282-308): x [.., LQ, N] -> [.., LP, N].

    The per-term products are lazy-centered (|.| < 1.6 p); the sum over LQ
    terms stays < 2^29 for LQ <= 40, one reduce_once restores (-1.6p, 1.6p).
    """
    LQ = x.shape[-2]
    sq = src.moduli[:, None]
    if centered:
        t = x + muc.qhalf_mod_qi[:, None]
        x = jnp.where(t >= sq, t - sq, t)
    y = mulmod(x, muc.qoverqi_inv_qi[:, None], sq, src.qinv_f[:, None])

    # v = floor(sum_i y_i / q_i): ordered f64 accumulation, matching the
    # reference (and rns_tools.mod_up) exactly.
    vf = jnp.zeros(y.shape[:-2] + (y.shape[-1],), dtype=jnp.float64)
    for i in range(LQ):
        vf = vf + y[..., i, :].astype(jnp.float64) / muc.src_q_f64[i]
    v = vf.astype(jnp.int32)  # trunc toward zero

    dq = dst.moduli[:, None]
    dqinv = dst.qinv_f[:, None]
    acc = jnp.zeros(y.shape[:-2] + (dst.moduli.shape[0], y.shape[-1]),
                    dtype=jnp.int32)
    for i in range(LQ):
        c = muc.qoverqi_mod_p[:, i][:, None]
        acc = acc + fring.mulmod_lazy_centered(
            y[..., i:i + 1, :], c, dq, dqinv)
    acc = reduce_once(acc, dq, dqinv)
    out = canon(acc, dq)
    # correction term (v * (-Q)) mod p, elementwise (no gather): v <= LQ < 64
    # and (-Q mod p) < 2^23, so the product fits int32 exactly and one
    # reduce_once + canon restores [0, p)
    vt = v[..., None, :] * muc.negq_mod_p[:, None]      # [.., LP, N]
    vt = canon(reduce_once(vt, dq, dqinv), dq)
    out = out + vt
    out = jnp.where(out >= dq, out - dq, out)
    if centered:
        out = out - muc.qhalf_mod_p[:, None]
        out = jnp.where(out < 0, out + dq, out)
    return out


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["modup_p_to_q", "pinv_mod_q"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class FastModDownConstants:
    modup_p_to_q: FastModUpConstants
    pinv_mod_q: jnp.ndarray  # int32 [LQ]  P^{-1} mod qi


def gen_fast_moddown_constants(Q: list[int], P: list[int]) -> FastModDownConstants:
    const = np.zeros(len(Q), dtype=np.int32)
    for i, qi in enumerate(Q):
        acc = 1
        for pj in P:
            acc = acc * pow(pj, qi - 2, qi) % qi
        const[i] = acc
    return FastModDownConstants(
        modup_p_to_q=gen_fast_modup_constants(P, Q),
        pinv_mod_q=jnp.asarray(const),
    )


def mod_down(xq: jnp.ndarray, xp: jnp.ndarray, mdc: FastModDownConstants,
             ring_q: FastRing, ring_p: FastRing, ntt: bool = False) -> jnp.ndarray:
    """ModDownQPtoQ[NTT] (basis_extension.go:219-258):
    out = (xq - ModUp_{P->Q}(xp)) * P^{-1} mod q_i."""
    if ntt:
        xp = ring_p.intt(xp)
    lift = mod_up(xp, mdc.modup_p_to_q, ring_p, ring_q, centered=True)
    if ntt:
        lift = ring_q.ntt(lift)
    diff = ring_q.sub(xq, lift)
    return ring_q.mul_scalar_montgomery(diff, mdc.pinv_mod_q)


# ---------------------------------------------------------------------------
# Hybrid key-switching digit decomposer (basis_extension.go:310-502).
# ---------------------------------------------------------------------------

@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["mucs"],
    meta_fields=["alpha", "num_digits", "lq", "lp"],
)
@dataclasses.dataclass(frozen=True)
class FastDecomposer:
    mucs: tuple[FastModUpConstants | None, ...]
    alpha: int
    num_digits: int
    lq: int
    lp: int


def gen_fast_decomposer(Q: list[int], P: list[int]) -> FastDecomposer:
    alpha = len(P)
    nd = -(-len(Q) // alpha)
    mucs = []
    for i in range(nd):
        qd = Q[i * alpha: min((i + 1) * alpha, len(Q))]
        mucs.append(None if len(qd) == 1
                    else gen_fast_modup_constants(qd, list(Q) + list(P)))
    return FastDecomposer(mucs=tuple(mucs), alpha=alpha, num_digits=nd,
                          lq=len(Q), lp=len(P))


def _lift_digit_coeff(dec: FastDecomposer, digit: int, x_inv_ntt: jnp.ndarray,
                      ring_q: FastRing, ring_p: FastRing
                      ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Coefficient-domain lift of hybrid digit ``digit`` to bases Q and P
    (the per-digit body of DecomposeSingleNTT,
    core/rlwe/evaluator_gadget_product.go:455-480): single-limb digits are
    centered and sign-extended directly; multi-limb digits go through the
    approximate ModUp.  Shared by decompose_single_ntt / decompose_all_coeff
    so the two paths cannot drift (ADVICE r2)."""
    lq = x_inv_ntt.shape[-2]
    start = digit * dec.alpha
    end = min(start + dec.alpha, lq)
    muc = dec.mucs[digit]

    if muc is None or end - start == 1:
        c = x_inv_ntt[..., start:end, :]
        q_src = ring_q.moduli[start]
        neg = c >= (q_src >> 1)
        mag = jnp.where(neg, q_src - c, c)
        qq = ring_q.moduli[:, None]
        tq = _red_to(mag, ring_q)
        yq = jnp.where(neg & (tq != 0), qq - tq, tq)
        pp = ring_p.moduli[:, None]
        tp = _red_to(mag, ring_p)
        yp = jnp.where(neg & (tp != 0), pp - tp, tp)
    else:
        src = x_inv_ntt[..., start:end, :]
        cat = _concat_rings(ring_q, ring_p)
        both = mod_up(src, muc, _limb_band(ring_q, start, end), cat,
                      centered=True)
        yq, yp = both[..., :lq, :], both[..., lq:, :]
    return yq, yp


def decompose_single_ntt(dec: FastDecomposer, digit: int, x_ntt: jnp.ndarray,
                         x_inv_ntt: jnp.ndarray, ring_q: FastRing,
                         ring_p: FastRing) -> tuple[jnp.ndarray, jnp.ndarray]:
    """DecomposeSingleNTT (core/rlwe/evaluator_gadget_product.go:455-480),
    fast mirror of rns_tools.decompose_single_ntt."""
    lq = x_ntt.shape[-2]
    start = digit * dec.alpha
    end = min(start + dec.alpha, lq)
    yq, yp = _lift_digit_coeff(dec, digit, x_inv_ntt, ring_q, ring_p)

    yq = ring_q.ntt(yq)
    yq = jnp.concatenate(
        [yq[..., :start, :], x_ntt[..., start:end, :], yq[..., end:, :]],
        axis=-2)
    yp = ring_p.ntt(yp)
    return yq, yp


def decompose_all_coeff(dec: FastDecomposer, x_inv_ntt: jnp.ndarray,
                        ring_q: FastRing, ring_p: FastRing
                        ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """All hybrid digits, coefficient domain, stacked for one batched NTT:
    returns (yq [D, LQ, N], yp [D, LP, N]).

    Same per-digit math as decompose_single_ntt minus the NTT/splice: the
    caller NTTs the stacks in ONE kernel launch each (grid-parallel over
    digits x limbs instead of D sequential launches) and splices the
    NTT-domain source band per digit.  Bit-exact with the sequential path."""
    yqs, yps = [], []
    for digit in range(dec.num_digits):
        yq, yp = _lift_digit_coeff(dec, digit, x_inv_ntt, ring_q, ring_p)
        yqs.append(yq)
        yps.append(yp)
    return jnp.stack(yqs, axis=-3), jnp.stack(yps, axis=-3)


def _limb_band(ring: FastRing, start: int, end: int) -> FastRing:
    """View of limbs [start, end) (tables sliced like at_level)."""
    s = slice(start, end)
    return dataclasses.replace(
        ring,
        moduli_tuple=ring.moduli_tuple[s],
        moduli=ring.moduli[s], qinv_f=ring.qinv_f[s],
        v2_tabs=None if ring.v2_tabs is None
        else fring._slice_tables(ring.v2_tabs, s),
        mxu_tabs=fring._slice_tables(ring.mxu_tabs, s),
    )


def _concat_rings(rq: FastRing, rp: FastRing) -> FastRing:
    """Moduli-only concatenation (no NTT tables; used as a mod_up dst)."""
    return dataclasses.replace(
        rq,
        moduli_tuple=rq.moduli_tuple + rp.moduli_tuple,
        moduli=jnp.concatenate([rq.moduli, rp.moduli]),
        qinv_f=jnp.concatenate([rq.qinv_f, rp.qinv_f]),
        v2_tabs=None,
    )
