"""Wide-path RNS meta-operations: rescale, basis extension, decomposition.

Pair/plane mirrors of fast/frns.py (itself mirroring ops/rns_tools.py and
/root/reference/ring/scaling.go + ring/basis_extension.go) over 41-55-bit
moduli.  Polynomials are centered int32 pairs [..., 2, L, N] (ops/wide.py).

Bit-exactness strategy: every step is exact integer arithmetic on
representatives; where the reference's math depends on a *specific
representative* (the ModUp f64 v-correction sums canonical [0, q) digits;
rescaling subtracts the canonical lift of the last limb), the canonical
value is reconstructed exactly from the centered pair first.  Outputs agree
with the u64 path limb-for-limb after canonicalization
(tests/test_wring.py).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from matrix_fhe_tpu.ops import wide
from matrix_fhe_tpu.fast.wring import WideRing


def _is_neg(lo: jnp.ndarray, hi: jnp.ndarray) -> jnp.ndarray:
    """Exact sign of a normalized pair value (either base)."""
    return (hi < 0) | ((hi == 0) & (lo < 0))


def spread_value(lo: jnp.ndarray, hi: jnp.ndarray,
                 dst_tabs: wide.WideTables,
                 src_tabs: wide.WideTables | None = None) -> jnp.ndarray:
    """Reduce an integer (centered pair within mode capacity, given WITHOUT
    a limb axis: [.., N]) into every destination modulus: -> pairs
    [.., 2, LD, N].

    The base-2^12 digit planes of the value are modulus-independent; one
    planes_to_pair against the destination tables reduces them mod every
    q_j at once (broadcast [.., 1, N] against the [LD, 1] tables).  The
    PAIR is interpreted in ``src_tabs``'s base (defaults to dst — contexts
    are mode-uniform, so the two agree)."""
    p = wide.pair_to_planes(lo[..., None, :], hi[..., None, :],
                            src_tabs if src_tabs is not None else dst_tabs)
    p = wide.fold_excess(p, dst_tabs)
    out_lo, out_hi = wide.planes_to_pair(p, dst_tabs)
    return jnp.stack([out_lo, out_hi], axis=-3)


# ---------------------------------------------------------------------------
# Rescaling (ring/scaling.go:111-162).
# ---------------------------------------------------------------------------

def div_round_by_last_modulus(ring: WideRing, p: jnp.ndarray) -> jnp.ndarray:
    """Rounded coeff-domain rescale [.., 2, L, N] -> [.., 2, L-1, N]:
    out_i = (x_i + h - t) * q_l^{-1} mod q_i with t = (x_l + h) mod q_l
    canonical, h = (q_l - 1)/2 (scaling.go:111-126)."""
    L = p.shape[-2]
    lvl = L - 1
    ql = ring.moduli_tuple[lvl]
    h = (ql - 1) >> 1
    band = ring.limb_band(lvl, lvl + 1)
    t = band.add_scalar(p[..., :, lvl:lvl + 1, :], h)   # centered mod q_l
    # canonical [0, q_l) representative (the reference's t)
    t_lo, t_hi = t[..., 0, :, :], t[..., 1, :, :]
    neg = _is_neg(t_lo, t_hi)
    q_lo = band.tabs.q_lo[0]
    q_hi = band.tabs.q_hi[0]
    lo2 = jnp.where(neg, t_lo + q_lo, t_lo)
    hi2 = jnp.where(neg, t_hi + q_hi, t_hi)
    lo_b, hi2 = wide._renorm(lo2, hi2, band.tabs.shift)

    sub = ring.at_level(lvl - 1)
    t_red = spread_value(lo_b[..., 0, :], hi2[..., 0, :], sub.tabs)
    acc = sub.sub(sub.add_scalar(p[..., :, :lvl, :], h), t_red)
    qlinv = [pow(ql, -1, m) for m in ring.moduli_tuple[:lvl]]
    return sub.mul_scalar_montgomery(acc, np.array(qlinv, dtype=np.uint64))


def div_round_by_last_modulus_many_ntt(ring: WideRing, p: jnp.ndarray,
                                       nb: int) -> jnp.ndarray:
    """NTT-domain rounded rescale dropping ``nb`` limbs (scaling.go:130-162)."""
    if nb == 0:
        return p
    L = p.shape[-2]
    x = ring.at_level(L - 1).intt(p)
    for k in range(nb):
        x = div_round_by_last_modulus(ring.at_level(L - 1 - k), x)
    return ring.at_level(L - 1 - nb).ntt(x)


# ---------------------------------------------------------------------------
# Basis extension (basis_extension.go:52-308).
# ---------------------------------------------------------------------------

@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["inv_planes", "cij_planes", "negq_planes", "qhalf_src",
                 "qhalf_dst", "src_q_f64"],
    meta_fields=["lq", "ld"],
)
@dataclasses.dataclass(frozen=True)
class WideModUpConstants:
    lq: int
    ld: int
    inv_planes: jnp.ndarray    # int32 [5, LQ, 1]  (Q/qi)^-1 mod qi digits
    cij_planes: jnp.ndarray    # int32 [LQ, 5, LD, 1] (Q/qi) mod dj digits
    negq_planes: jnp.ndarray   # int32 [5, LD, 1]  (-Q) mod dj digits
    qhalf_src: jnp.ndarray     # int32 [2, LQ, 1]  (Q>>1) mod qi pair
    qhalf_dst: jnp.ndarray     # int32 [2, LD, 1]  (Q>>1) mod dj pair
    src_q_f64: jnp.ndarray     # f64 [LQ]


def gen_wide_modup_constants(Q: list[int], D: list[int],
                             nplanes: int = 5) -> WideModUpConstants:
    big_q = 1
    for q in Q:
        big_q *= q
    qhalf = big_q >> 1

    def digs(vals, mods):
        return np.array([wide._digits12(wide._center(int(v), q), nplanes)
                         for v, q in zip(vals, mods)], np.int32)

    inv = digs([pow((big_q // qi) % qi, qi - 2, qi) for qi in Q], Q)
    cij = np.stack([digs([(big_q // qi) % dj for dj in D], D) for qi in Q])
    negq = digs([(-big_q) % dj for dj in D], D)
    pair31 = nplanes == 6
    qh_src = wide.pack_pair(
        np.array([qhalf % q for q in Q], np.uint64)[:, None], Q, pair31)
    qh_dst = wide.pack_pair(
        np.array([qhalf % d for d in D], np.uint64)[:, None], D, pair31)
    return WideModUpConstants(
        lq=len(Q), ld=len(D),
        inv_planes=jnp.asarray(np.moveaxis(inv, 1, 0)[..., None]),  # [5,LQ,1]
        cij_planes=jnp.asarray(np.moveaxis(cij, 2, 1)[..., None]),  # [LQ,5,LD,1]
        negq_planes=jnp.asarray(np.moveaxis(negq, 1, 0)[..., None]),
        qhalf_src=jnp.asarray(qh_src), qhalf_dst=jnp.asarray(qh_dst),
        src_q_f64=jnp.asarray(np.array(Q, dtype=np.float64)))


def mod_up(x: jnp.ndarray, muc: WideModUpConstants, src: WideRing,
           dst: WideRing, centered: bool = True) -> jnp.ndarray:
    """ModUpExact (basis_extension.go:282-308): x [.., 2, LQ, N] ->
    [.., 2, LD, N].

    v-correction: the reference sums the canonical [0, q) digits in f64 and
    truncates; the canonical value is reconstructed exactly from the
    centered pair (f64 holds 2^55 integers exactly), and the plane-space
    accumulation uses the centered digits with the sign count folded into
    v (an exact integer identity)."""
    st = src.tabs
    P = st.nplanes
    if centered:
        x = wide.add(st, x, muc.qhalf_src)
    y = wide.mulmod_planes(st, x, [muc.inv_planes[k] for k in range(P)])
    y_lo, y_hi = y[..., 0, :, :], y[..., 1, :, :]
    neg = _is_neg(y_lo, y_hi)

    # v = trunc(sum_i canonical(y_i) / q_i), ordered accumulation (f64,
    # matching basis_extension.go:550-594 / rns_tools.mod_up), minus the
    # count of negative centered digits (y_canon = y_cent + neg * q).
    vf = jnp.zeros(y.shape[:-3] + (y.shape[-1],), dtype=jnp.float64)
    for i in range(muc.lq):
        yc = (y_lo[..., i, :].astype(jnp.float64)
              + y_hi[..., i, :].astype(jnp.float64) * float(1 << st.shift))
        yc = yc + jnp.where(neg[..., i, :], muc.src_q_f64[i], 0.0)
        vf = vf + yc / muc.src_q_f64[i]
    v = vf.astype(jnp.int32) - jnp.sum(neg, axis=-2, dtype=jnp.int32)

    dt = dst.tabs
    acc = None
    period = wide.mac_period(dt)
    for i in range(muc.lq):
        pa = wide.pair_to_planes(y_lo[..., i:i + 1, :], y_hi[..., i:i + 1, :],
                                 st)
        pb = [muc.cij_planes[i, k] for k in range(dt.nplanes)]
        acc = wide.mac_planes(acc, pa, pb, dt)
        if (i + 1) % period == 0 and i + 1 < muc.lq:
            acc = wide.fold_excess(acc, dt)
    # v * (-Q mod dj): |v| <= LQ so the plane products are tiny
    for k in range(dt.nplanes):
        acc[k] = acc[k] + v[..., None, :] * muc.negq_planes[k]
    acc = wide.fold_excess(acc, dt)
    lo, hi = wide.planes_to_pair(acc, dt)
    out = jnp.stack([lo, hi], axis=-3)
    if centered:
        out = wide.sub(dt, out, muc.qhalf_dst)
    return out


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["modup_p_to_q", "pinv_planes"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class WideModDownConstants:
    modup_p_to_q: WideModUpConstants
    pinv_planes: jnp.ndarray  # int32 [5, LQ, 1]  digits of P^{-1} mod qi


def gen_wide_moddown_constants(Q: list[int], P: list[int],
                               nplanes: int = 5) -> WideModDownConstants:
    digs = []
    for qi in Q:
        acc = 1
        for pj in P:
            acc = acc * pow(pj, qi - 2, qi) % qi
        digs.append(wide._digits12(wide._center(acc, qi), nplanes))
    planes = np.moveaxis(np.array(digs, np.int32), 1, 0)[..., None]
    return WideModDownConstants(
        modup_p_to_q=gen_wide_modup_constants(P, Q, nplanes),
        pinv_planes=jnp.asarray(planes))


def mod_down(xq: jnp.ndarray, xp: jnp.ndarray, mdc: WideModDownConstants,
             ring_q: WideRing, ring_p: WideRing,
             ntt: bool = False) -> jnp.ndarray:
    """ModDownQPtoQ[NTT] (basis_extension.go:219-258)."""
    if ntt:
        xp = ring_p.intt(xp)
    lift = mod_up(xp, mdc.modup_p_to_q, ring_p, ring_q, centered=True)
    if ntt:
        lift = ring_q.ntt(lift)
    diff = ring_q.sub(xq, lift)
    return wide.mulmod_planes(ring_q.tabs, diff,
                              [mdc.pinv_planes[k]
                               for k in range(ring_q.tabs.nplanes)])


# ---------------------------------------------------------------------------
# Hybrid key-switching digit decomposer (basis_extension.go:310-502).
# ---------------------------------------------------------------------------

@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["mucs"],
    meta_fields=["alpha", "num_digits", "lq", "lp"],
)
@dataclasses.dataclass(frozen=True)
class WideDecomposer:
    mucs: tuple[WideModUpConstants | None, ...]
    alpha: int
    num_digits: int
    lq: int
    lp: int


def gen_wide_decomposer(Q: list[int], P: list[int],
                        nplanes: int = 5) -> WideDecomposer:
    alpha = len(P)
    nd = -(-len(Q) // alpha)
    mucs = []
    for i in range(nd):
        qd = Q[i * alpha: min((i + 1) * alpha, len(Q))]
        mucs.append(None if len(qd) == 1
                    else gen_wide_modup_constants(qd, list(Q) + list(P),
                                                  nplanes))
    return WideDecomposer(mucs=tuple(mucs), alpha=alpha, num_digits=nd,
                          lq=len(Q), lp=len(P))


def _lift_digit_coeff(dec: WideDecomposer, digit: int, x_inv: jnp.ndarray,
                      ring_q: WideRing, ring_p: WideRing):
    """Coefficient-domain lift of hybrid digit ``digit`` to bases Q and P
    (DecomposeSingleNTT body, evaluator_gadget_product.go:455-480).
    Single-limb digits: the centered pair value spreads to every limb via
    its modulus-independent digit planes; multi-limb digits: ModUp."""
    lq = x_inv.shape[-2]
    start = digit * dec.alpha
    end = min(start + dec.alpha, lq)
    muc = dec.mucs[digit]

    if muc is None or end - start == 1:
        # exact reference-convention centered lift (the pair representation
        # near +-q/2 is ambiguous; the u64 path lifts c >= q>>1 negative)
        lo, hi = wide.center_lift(ring_q.limb_band(start, end).tabs,
                                  x_inv[..., 0, start, :],
                                  x_inv[..., 1, start, :])
        band_tabs = ring_q.limb_band(start, end).tabs
        yq = spread_value(lo, hi, ring_q.tabs, band_tabs)
        yp = spread_value(lo, hi, ring_p.tabs, band_tabs)
    else:
        src = x_inv[..., :, start:end, :]
        both = mod_up(src, muc, ring_q.limb_band(start, end),
                      _concat_rings(ring_q, ring_p), centered=True)
        yq, yp = both[..., :, :lq, :], both[..., :, lq:, :]
    return yq, yp


def decompose_all_coeff(dec: WideDecomposer, x_inv: jnp.ndarray,
                        ring_q: WideRing, ring_p: WideRing):
    """All hybrid digits, coefficient domain, stacked for one batched NTT:
    -> (yq [D, 2, LQ, N], yp [D, 2, LP, N])."""
    yqs, yps = [], []
    for digit in range(dec.num_digits):
        yq, yp = _lift_digit_coeff(dec, digit, x_inv, ring_q, ring_p)
        yqs.append(yq)
        yps.append(yp)
    return jnp.stack(yqs, axis=-4), jnp.stack(yps, axis=-4)


def _concat_rings(rq: WideRing, rp: WideRing) -> WideRing:
    """Moduli-only concatenation (as a mod_up destination)."""
    moduli = rq.moduli_tuple + rp.moduli_tuple
    t1, t2 = rq.tabs, rp.tabs
    assert t1.shift == t2.shift, "q/p rings of one context must share a mode"
    tb = wide.WideTables(
        moduli=moduli, nplanes=t1.nplanes, shift=t1.shift,
        q_dig=jnp.concatenate([t1.q_dig, t2.q_dig]),
        fold=jnp.concatenate([t1.fold, t2.fold]),
        q_lo=jnp.concatenate([t1.q_lo, t2.q_lo]),
        q_hi=jnp.concatenate([t1.q_hi, t2.q_hi]),
        qinv_f=jnp.concatenate([t1.qinv_f, t2.qinv_f]))
    return dataclasses.replace(rq, moduli_tuple=moduli, tabs=tb)
