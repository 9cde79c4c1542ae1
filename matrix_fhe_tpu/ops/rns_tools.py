"""RNS meta-operations: rescaling, basis extension, digit decomposition.

Counterparts of /root/reference/ring/scaling.go and ring/basis_extension.go.
Exact value semantics (fully-reduced op boundaries):

  * div_floor_by_last_modulus:  out_i = q_l^{-1} (x_i - x_l)  mod q_i
                                (== floor(X / q_l), scaling.go:19-28)
  * div_round_by_last_modulus:  out_i = q_l^{-1} (x_i + h - t) mod q_i with
                                h = (q_l-1)/2, t = (x_l + h) mod q_l
                                (== floor((X + h) / q_l), scaling.go:111-126)
  * mod_up (Q->P):              y_i = x_i (Q/q_i)^{-1} mod q_i,
                                v   = floor(sum_i y_i / q_i)   [float64],
                                out_j = sum_i y_i (Q/q_i) - v Q  mod p_j
                                (eprint 2018/117; basis_extension.go:280-308)
  * mod_down (QP->Q):           out = (xQ - mod_up_{P->Q}(xP)) P^{-1} mod q_i
                                (basis_extension.go:219-258)
  * decompose digit j:          centered ModUp of Q-limb block j to all other
                                limbs of (Q, P) (basis_extension.go:379-502)

The reference computes the v correction with ordered float64 accumulation
(basis_extension.go:504-594); we reproduce exactly that (same summation
order).  float64 on TPU is XLA-emulated; the bit-exactness contract is pinned
by the CPU test suite.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from matrix_fhe_tpu.ops import modmath as mm
from matrix_fhe_tpu.ops import rings as rg

MASK64 = (1 << 64) - 1


# ---------------------------------------------------------------------------
# Rescaling (ring/scaling.go).
# ---------------------------------------------------------------------------

def _rescale_row(ring: rg.Ring, level: int) -> jnp.ndarray:
    """MForm(-q_level^{-1} mod q_i) for i < level (ring/ring.go:363)."""
    return ring.rescale[level - 1, :level]


def div_floor_by_last_modulus(ring: rg.Ring, p: jnp.ndarray) -> jnp.ndarray:
    """Coefficient domain; input [L, N] -> output [L-1, N]."""
    L = p.shape[-2]
    lvl = L - 1
    c = _rescale_row(ring, lvl)[:, None]
    q, qinv = ring.moduli[:lvl, None], ring.qinv[:lvl, None]
    # (x_l - x_i) * MForm(-ql^{-1}) = (x_i - x_l) ql^{-1} mod q_i
    return mm.mred(p[..., lvl:lvl + 1, :] + 2 * q - p[..., :lvl, :], c, q, qinv)


def div_round_by_last_modulus(ring: rg.Ring, p: jnp.ndarray) -> jnp.ndarray:
    """Coefficient domain rounded rescale; [L, N] -> [L-1, N]."""
    L = p.shape[-2]
    lvl = L - 1
    ql = ring.moduli_tuple[lvl]
    p_half = (ql - 1) >> 1
    t = mm.cred(p[..., lvl:lvl + 1, :] + jnp.uint64(p_half), jnp.uint64(ql))
    q, qinv = ring.moduli[:lvl, None], ring.qinv[:lvl, None]
    half_mod = jnp.array([p_half % m for m in ring.moduli_tuple[:lvl]],
                         dtype=jnp.uint64)[:, None]
    c = _rescale_row(ring, lvl)[:, None]
    # out = -(t - h - x_i) * ql^{-1} = (x_i + h - t) ql^{-1} mod q_i
    acc = t + (q - half_mod) + (2 * q - p[..., :lvl, :])
    return mm.mred(acc, c, q, qinv)


def div_round_by_last_modulus_ntt(ring: rg.Ring, p: jnp.ndarray) -> jnp.ndarray:
    """NTT domain rounded rescale (scaling.go:91-109): INTT the last limb,
    lift to the remaining limbs, NTT back, combine."""
    L = p.shape[-2]
    lvl = L - 1
    last_ring = _single_limb_view(ring, lvl)
    coeff = last_ring.intt(p[..., lvl:lvl + 1, :])
    ql = ring.moduli_tuple[lvl]
    p_half = (ql - 1) >> 1
    t = mm.cred(coeff + jnp.uint64(p_half), jnp.uint64(ql))  # [.., 1, N]

    sub = ring.at_level(lvl - 1)
    q = sub.moduli[:, None]
    half_mod = jnp.array([p_half % m for m in ring.moduli_tuple[:lvl]],
                         dtype=jnp.uint64)[:, None]
    lifted = mm.bred_add(t + (q - half_mod), q, sub.bhi[:, None])
    lifted = sub.ntt(lifted)
    c = _rescale_row(ring, lvl)[:, None]
    acc = lifted + (2 * q - p[..., :lvl, :])
    return mm.mred(acc, c, q, sub.qinv[:, None])


def div_by_last_modulus_many(ring: rg.Ring, p: jnp.ndarray, nb: int,
                             rounded: bool = True, ntt: bool = False) -> jnp.ndarray:
    """DivFloor/DivRoundByLastModulusMany[NTT] (scaling.go:30-192)."""
    if nb == 0:
        return p
    L = p.shape[-2]
    if ntt:
        if nb == 1 and rounded:
            return div_round_by_last_modulus_ntt(ring, p)
        x = ring.at_level(L - 1).intt(p)
        for k in range(nb):
            r = ring.at_level(L - 1 - k)
            x = div_round_by_last_modulus(r, x) if rounded else div_floor_by_last_modulus(r, x)
        return ring.at_level(L - 1 - nb).ntt(x)
    x = p
    for k in range(nb):
        r = ring.at_level(L - 1 - k)
        x = div_round_by_last_modulus(r, x) if rounded else div_floor_by_last_modulus(r, x)
    return x


def _single_limb_view(ring: rg.Ring, i: int) -> rg.Ring:
    s = slice(i, i + 1)
    return dataclasses.replace(
        ring,
        moduli_tuple=ring.moduli_tuple[i:i + 1],
        moduli=ring.moduli[s], qinv=ring.qinv[s], bhi=ring.bhi[s],
        blo=ring.blo[s], ninv=ring.ninv[s],
        roots_fwd=None if ring.roots_fwd is None else ring.roots_fwd[s],
        roots_bwd=None if ring.roots_bwd is None else ring.roots_bwd[s],
        rescale=ring.rescale,
        ntt_fwd_mat=None if ring.ntt_fwd_mat is None else ring.ntt_fwd_mat[s],
        ntt_bwd_mat=None if ring.ntt_bwd_mat is None else ring.ntt_bwd_mat[s],
    )


# ---------------------------------------------------------------------------
# Basis extension (ring/basis_extension.go).
# ---------------------------------------------------------------------------

@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["qoverqi_inv_qi", "qoverqi_mod_p", "vtimesq_mod_p", "qhalf_mod_qi"],
    meta_fields=["qhalf_mod_p_tuple"],
)
@dataclasses.dataclass(frozen=True)
class ModUpConstants:
    """GenModUpConstants (basis_extension.go:92-164), Montgomery form."""
    qoverqi_inv_qi: jnp.ndarray   # [LQ]      MForm((Q/qi)^-1 mod qi)
    qoverqi_mod_p: jnp.ndarray    # [LP, LQ]  MForm(Q/qi mod pj)
    vtimesq_mod_p: jnp.ndarray    # [LP, LQ+1] (-v*Q) mod pj
    qhalf_mod_qi: jnp.ndarray     # [LQ]      (Q>>1) mod qi  (centering)
    qhalf_mod_p_tuple: tuple[int, ...]  # (Q>>1) mod pj (host ints)


def gen_modup_constants(Q: list[int], P: list[int]) -> ModUpConstants:
    LQ, LP = len(Q), len(P)
    big_q = 1
    for q in Q:
        big_q *= q
    qhalf = big_q >> 1
    inv = np.zeros(LQ, dtype=np.uint64)
    mod_p = np.zeros((LP, LQ), dtype=np.uint64)
    vq = np.zeros((LP, LQ + 1), dtype=np.uint64)
    for i, qi in enumerate(Q):
        qstar = big_q // qi
        inv[i] = (pow(qstar % qi, qi - 2, qi) << 64) % qi
        for j, pj in enumerate(P):
            mod_p[j, i] = ((qstar % pj) << 64) % pj
    for j, pj in enumerate(P):
        v = (pj - big_q % pj) % pj
        for k in range(1, LQ + 1):
            vq[j, k] = (vq[j, k - 1] + v) % pj
    return ModUpConstants(
        qoverqi_inv_qi=jnp.asarray(inv),
        qoverqi_mod_p=jnp.asarray(mod_p),
        vtimesq_mod_p=jnp.asarray(vq),
        qhalf_mod_qi=jnp.asarray(np.array([qhalf % q for q in Q], dtype=np.uint64)),
        qhalf_mod_p_tuple=tuple(qhalf % p for p in P),
    )


def _mod_up_core(x: jnp.ndarray, muc: ModUpConstants, src_q: jnp.ndarray,
                 src_qinv: jnp.ndarray, dst_q: jnp.ndarray, dst_qinv: jnp.ndarray,
                 dst_bhi: jnp.ndarray, centered: bool) -> jnp.ndarray:
    """ModUpExact (basis_extension.go:282-308): x [..., LQ, N] -> [..., LP, N]."""
    LQ = x.shape[-2]
    if centered:
        x = mm.cred(x + muc.qhalf_mod_qi[:, None], src_q[:, None])
    y = mm.mred(x, muc.qoverqi_inv_qi[:, None], src_q[:, None], src_qinv[:, None])

    # v = floor(sum_i y_i / q_i), ordered float64 accumulation
    # (basis_extension.go:550-594).
    vf = jnp.zeros(y.shape[:-2] + (y.shape[-1],), dtype=jnp.float64)
    for i in range(LQ):
        vf = vf + y[..., i, :].astype(jnp.float64) / src_q[i].astype(jnp.float64)
    v = vf.astype(jnp.uint64)  # trunc toward zero == Go uint64(float64)

    # out_j = Montgomery-reduce(sum_i y_i * MForm(Q/qi mod pj)) + (-vQ mod pj)
    # 128-bit accumulation then a single Montgomery reduction
    # (basis_extension.go:597-673 multSum).
    hi = jnp.zeros_like(y[..., :1, :].repeat(muc.qoverqi_mod_p.shape[0], axis=-2))
    lo = jnp.zeros_like(hi)
    for i in range(LQ):
        c = muc.qoverqi_mod_p[:, i][:, None]
        phi, plo = mm.mul64_hi_lo(y[..., i:i + 1, :], c)
        lo, carry = mm.add64_carry(lo, plo)
        hi = hi + phi + carry
    red = mm.mul64_hi(lo * dst_qinv[:, None], dst_q[:, None])
    out = hi - red + dst_q[:, None]  # [0, 2p)
    out = out + _gather_vtimes(muc.vtimesq_mod_p, v)  # [0, 3p)
    out = mm.bred_add(out, dst_q[:, None], dst_bhi[:, None])
    if centered:
        qh = jnp.array(muc.qhalf_mod_p_tuple, dtype=jnp.uint64)[:, None]
        out = mm.cred(out + (dst_q[:, None] - qh), dst_q[:, None])
    return out


def _gather_vtimes(table: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """table [LP, LQ+1], v [..., N] -> [..., LP, N]: table[j, v]."""
    return jnp.moveaxis(table[:, v], 0, -2)


def mod_up(x: jnp.ndarray, muc: ModUpConstants, src: rg.Ring, dst: rg.Ring,
           centered: bool = True) -> jnp.ndarray:
    """ModUpQtoP with the reference's centering wrapper
    (basis_extension.go:185-217): exact signed-lift basis extension."""
    return _mod_up_core(x, muc, src.moduli, src.qinv, dst.moduli, dst.qinv,
                        dst.bhi, centered)


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["modup_p_to_q", "moddown_const"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class ModDownConstants:
    modup_p_to_q: ModUpConstants
    moddown_const: jnp.ndarray  # [LQ] MForm(P^{-1} mod qi) (basis_extension.go:25-49)


def gen_moddown_constants(Q: list[int], P: list[int]) -> ModDownConstants:
    const = np.zeros(len(Q), dtype=np.uint64)
    for i, qi in enumerate(Q):
        acc = 1
        for pj in P:
            acc = acc * pow(pj, qi - 2, qi) % qi
        const[i] = (acc << 64) % qi
    return ModDownConstants(
        modup_p_to_q=gen_modup_constants(P, Q),
        moddown_const=jnp.asarray(const),
    )


# ---------------------------------------------------------------------------
# Hybrid key-switching digit decomposer (basis_extension.go:310-502).
# ---------------------------------------------------------------------------

@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["mucs"],
    meta_fields=["alpha", "num_digits", "lq", "lp"],
)
@dataclasses.dataclass(frozen=True)
class Decomposer:
    """Per-digit ModUp constants for the RNS digit decomposition used by
    hybrid key-switching: digit i = centered lift of Q-limb block
    [i*alpha, (i+1)*alpha) to the full (Q, P) basis."""
    mucs: tuple[ModUpConstants | None, ...]  # None => single-limb signed lift
    alpha: int
    num_digits: int
    lq: int
    lp: int


def gen_decomposer(Q: list[int], P: list[int]) -> Decomposer:
    # P-less parameter sets (levelP = -1): one single-limb digit per Q prime
    # (BaseRNSDecompositionVectorSize, core/rlwe/params.go:635-642).
    alpha = max(len(P), 1)
    nd = -(-len(Q) // alpha)
    mucs = []
    for i in range(nd):
        qd = Q[i * alpha: min((i + 1) * alpha, len(Q))]
        mucs.append(None if len(qd) == 1 else gen_modup_constants(qd, list(Q) + list(P)))
    return Decomposer(mucs=tuple(mucs), alpha=alpha, num_digits=nd,
                      lq=len(Q), lp=len(P))


def decompose_single_ntt(dec: Decomposer, digit: int, x_ntt: jnp.ndarray,
                         x_inv_ntt: jnp.ndarray, ring_q: rg.Ring,
                         ring_p: rg.Ring) -> tuple[jnp.ndarray, jnp.ndarray]:
    """DecomposeSingleNTT (core/rlwe/evaluator_gadget_product.go:455-480):
    digit ``digit`` of x, returned in the NTT domain over (Q, P).

    ``x_ntt``/``x_inv_ntt`` are the same polynomial in/out of the NTT domain,
    both [LQ, N].  Source limbs of the digit are copied from ``x_ntt``
    directly; all other limbs go through the centered ModUp + forward NTT.
    """
    lq = x_ntt.shape[-2]
    start = digit * dec.alpha
    end = min(start + dec.alpha, lq)
    muc = dec.mucs[digit]

    if muc is None or end - start == 1:
        # Single-limb digit: exact signed lift with the reference's threshold
        # coeff >= q_src >> 1 => negative (basis_extension.go:402-436).
        c = x_inv_ntt[..., start:end, :]
        q_src = ring_q.moduli[start]
        neg = c >= (q_src >> jnp.uint64(1))
        mag = jnp.where(neg, q_src - c, c)
        qq = ring_q.moduli[:, None]
        tq = mm.bred_add(mag, qq, ring_q.bhi[:, None])
        yq = jnp.where(neg, mm.cred(qq - tq, qq), tq)
        if ring_p is None:  # P-less key switch (levelP = -1)
            yq = ring_q.ntt(yq)
            yq = jnp.concatenate(
                [yq[..., :start, :], x_ntt[..., start:end, :],
                 yq[..., end:, :]], axis=-2)
            return yq, None
        pp = ring_p.moduli[:, None]
        tp = mm.bred_add(mag, pp, ring_p.bhi[:, None])
        yp = jnp.where(neg, mm.cred(pp - tp, pp), tp)
    else:
        src = x_inv_ntt[..., start:end, :]
        qcat = jnp.concatenate([ring_q.moduli, ring_p.moduli])
        qinvcat = jnp.concatenate([ring_q.qinv, ring_p.qinv])
        bhicat = jnp.concatenate([ring_q.bhi, ring_p.bhi])
        both = _mod_up_core(src, muc, ring_q.moduli[start:end],
                            ring_q.qinv[start:end], qcat, qinvcat, bhicat,
                            centered=True)
        yq, yp = both[..., :lq, :], both[..., lq:lq + ring_p.num_limbs, :]

    yq = ring_q.ntt(yq)
    # Source limbs: the NTT-domain original (no INTT/NTT roundtrip).
    yq = jnp.concatenate(
        [yq[..., :start, :], x_ntt[..., start:end, :], yq[..., end:, :]], axis=-2)
    yp = ring_p.ntt(yp)
    return yq, yp


def mod_down(xq: jnp.ndarray, xp: jnp.ndarray, mdc: ModDownConstants,
             ring_q: rg.Ring, ring_p: rg.Ring, ntt: bool = False) -> jnp.ndarray:
    """ModDownQPtoQ[NTT] (basis_extension.go:219-258):
    out = (xq - ModUp_{P->Q}(xp)) * P^{-1} mod q_i (rounded division by P)."""
    if ntt:
        xp = ring_p.intt(xp)
    lift = mod_up(xp, mdc.modup_p_to_q, ring_p, ring_q, centered=True)
    if ntt:
        lift = ring_q.ntt(lift)
    q, qinv = ring_q.moduli[:, None], ring_q.qinv[:, None]
    return mm.mred(xq + 2 * q - lift, mdc.moddown_const[:, None], q, qinv)
