"""Wide-modulus (41-55-bit) residue arithmetic on 32-bit integer lanes.

The reference's production parameter sets use 45/55-bit primes
(schemes/ckks/example_parameters.go:22-30, ring/modular_reduction.go:78-197
64-bit Montgomery).  TPUs have no 64-bit (nor widening 32x32) multiplier, so
this module implements exact mod-q arithmetic for 2^41 <= q < 1.5 * 2^55
out of int32 lanes only:

* **Storage**: a residue is a *centered pair* ``(lo, hi)`` of int32 with
  ``x = lo + 2^25 * hi``, ``lo`` balanced 25-bit (|lo| <= 2^24) and
  ``|hi| < 2^31`` — 8 bytes/coefficient, the same HBM footprint as the u64
  path, capacity |x| < 2^56.  Array layout: ``int32 [..., 2, L, N]`` with
  the pair axis in front of the (limb, coeff) plane so limb-sliced level
  views stay contiguous.

* **Compute**: balanced base-2^12 digit *planes* (5 int32 planes cover
  |x| < 2^58).  Every multiply is (<=2^12) x (<=2^12) -> <= 2^24 so all
  products and their few-dozen-term accumulations stay far inside int32;
  wide weights (2^{12s}, s >= 5) are folded down with per-modulus tables of
  the digits of ``2^{12s} mod q``, and nearest-multiple subtractions use f32
  ``rint`` quotient estimates whose *error tolerance* (not exactness) is all
  that correctness needs — the arithmetic itself is exact integer math
  throughout, so results are exact mod q.  Inline comments carry the
  overflow proofs; the worst cases are q = 2^41 (largest quotients) and
  q = 1.5*2^55 (largest words).

All ops are elementwise over arrays shaped [..., 2, L, N] (pairs),
vectorized over (limb, coeff) exactly like ops/modmath.py; bit-exactness vs
the u64 path is pinned in tests/test_wide.py.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

MIN_WIDE_MODULUS = 1 << 41
MAX_WIDE_MODULUS = 3 << 54          # 1.5 * 2^55, covers the 55-bit primes

_B12 = 1 << 11                      # balanced base-2^12 bias
_B25 = 1 << 24                      # balanced base-2^25 bias


def _rint_i32(a: jnp.ndarray) -> jnp.ndarray:
    """Round-to-nearest-even of f32 |a| < 2^22, as int32.

    Must be jnp.rint, NOT the magic-constant trick ((a + 1.5*2^23) -
    1.5*2^23): under jit XLA's algebraic simplifier folds the add/sub pair
    away, silently turning the round into a truncation (the Pallas kernels
    can use the trick because Mosaic does not run that rewrite)."""
    return jnp.rint(a).astype(jnp.int32)


def _bal12(v: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """v -> (balanced 12-bit digit, remaining v >> 12), exact."""
    d = ((v + jnp.int32(_B12)) & 0xFFF) - jnp.int32(_B12)
    return d, (v - d) >> 12


# ---------------------------------------------------------------------------
# Host-side tables.
# ---------------------------------------------------------------------------

def _digits12(x: int) -> list[int]:
    """Balanced base-2^12 digits (5) of a centered integer |x| < 2^58."""
    out = []
    for _ in range(5):
        d = ((x + (1 << 11)) & 0xFFF) - (1 << 11)
        out.append(d)
        x = (x - d) >> 12
    assert x == 0, "value too wide for 5 digits"
    return out


def _center(x: int, q: int) -> int:
    x %= q
    return x - q if x > q // 2 else x


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["q_dig", "fold", "q_lo", "q_hi", "qinv_f"],
    meta_fields=["moduli"],
)
@dataclasses.dataclass(frozen=True)
class WideTables:
    """Per-limb constants for pair/plane arithmetic over moduli Q."""
    moduli: tuple[int, ...]
    q_dig: jnp.ndarray    # int32 [L, 5]    balanced digits of q
    fold: jnp.ndarray     # int32 [L, 7, 5] digits of centered(2^{12s} mod q), s=5..11
    q_lo: jnp.ndarray     # int32 [L] balanced 25-bit low word of q
    q_hi: jnp.ndarray     # int32 [L] (q - q_lo) >> 25  (< 2^30.6)
    qinv_f: jnp.ndarray   # f32 [L] 1/q

    @property
    def level(self) -> int:
        return len(self.moduli) - 1

    def at_level(self, level: int) -> "WideTables":
        if level == self.level:
            return self
        if level > self.level:
            raise ValueError(f"at_level({level}) above built level {self.level}")
        k = level + 1
        return WideTables(
            moduli=self.moduli[:k], q_dig=self.q_dig[:k], fold=self.fold[:k],
            q_lo=self.q_lo[:k], q_hi=self.q_hi[:k], qinv_f=self.qinv_f[:k])


def build_wide_tables(moduli) -> WideTables:
    moduli = tuple(int(q) for q in moduli)
    q_dig, fold, q_lo, q_hi = [], [], [], []
    for q in moduli:
        if not MIN_WIDE_MODULUS <= q < MAX_WIDE_MODULUS:
            raise ValueError(f"modulus {q} outside the wide path range "
                             f"[2^41, 1.5*2^55)")
        q_dig.append(_digits12(q))
        fold.append([_digits12(_center(1 << (12 * s), q)) for s in range(5, 12)])
        lo = ((q + _B25) & 0x1FFFFFF) - _B25
        q_lo.append(lo)
        q_hi.append((q - lo) >> 25)
    return WideTables(
        moduli=moduli,
        q_dig=jnp.asarray(np.array(q_dig, np.int32)),
        fold=jnp.asarray(np.array(fold, np.int32)),
        q_lo=jnp.asarray(np.array(q_lo, np.int32)),
        q_hi=jnp.asarray(np.array(q_hi, np.int32)),
        qinv_f=jnp.asarray(np.array([1.0 / q for q in moduli], np.float32)),
    )


def _col(v: jnp.ndarray) -> jnp.ndarray:
    """[L] table -> [L, 1] broadcast over the coeff axis."""
    return v[:, None]


# ---------------------------------------------------------------------------
# Pair <-> integer conversion (host/test utilities, exact object math).
# ---------------------------------------------------------------------------

def pack_pair(x: np.ndarray, moduli) -> np.ndarray:
    """uint64 [.., L, N] canonical [0, q) -> int32 [.., 2, L, N] centered
    pair."""
    x = np.asarray(x, dtype=np.uint64).astype(np.int64)
    q = np.array([int(m) for m in moduli], dtype=np.int64).reshape(
        (1,) * (x.ndim - 2) + (-1, 1))
    c = np.where(x > q // 2, x - q, x)
    lo = ((c + _B25) & 0x1FFFFFF) - _B25
    hi = (c - lo) >> 25
    out = np.stack([lo, hi], axis=-3)
    assert np.all(np.abs(out) < (1 << 31))
    return out.astype(np.int32)


def unpack_pair(p: np.ndarray, moduli) -> np.ndarray:
    """int32 [.., 2, L, N] pair (any bounded representative) -> uint64
    canonical [0, q)."""
    p = np.asarray(p).astype(np.int64)
    lo, hi = p[..., 0, :, :], p[..., 1, :, :]
    q = np.array([int(m) for m in moduli], dtype=np.int64).reshape(
        (1,) * (lo.ndim - 2) + (-1, 1))
    return (((lo + (hi << 25)) % q) % q).astype(np.uint64)


# ---------------------------------------------------------------------------
# Planes: balanced base-2^12 digit extraction / recombination (device).
# ---------------------------------------------------------------------------

def pair_to_planes(lo: jnp.ndarray, hi: jnp.ndarray) -> list[jnp.ndarray]:
    """Pair -> 5 balanced base-2^12 planes (exact, any pair within
    capacity).  |d_k| <= 2^11 for k < 4; |d4| <= |x|/2^48 + 1."""
    d0, r = _bal12(lo)
    d1, r = _bal12(r)                       # r in {-1, 0, 1}: lo is 25-bit
    h = r + hi * 2                          # weight 2^24: x = ... + 2^24 h
    d2, h = _bal12(h)
    d3, d4 = _bal12(h)
    return [d0, d1, d2, d3, d4]


def carry_planes(p: list[jnp.ndarray]) -> list[jnp.ndarray]:
    """Normalize planes: p0..p3 balanced 12-bit exact, excess into p4."""
    out = []
    c = jnp.zeros((), dtype=jnp.int32)
    for k in range(4):
        d, c = _bal12(p[k] + c)
        out.append(d)
    out.append(p[4] + c)
    return out


def fold_excess(p: list[jnp.ndarray], t: WideTables) -> list[jnp.ndarray]:
    """Fold p4's bits above weight 2^59 down via the 2^{12s} mod q tables
    (two rounds), then carry-normalize.  Input |p_k| <= 2^28; output p0..p3
    balanced 12-bit and |p4| <= ~2^14, so the plane value is < 2^62.

    Round 1: excess e = p4 >> 12 (|e| <= 2^17) splits into balanced-12
    pieces e_lo, e_hi multiplied into the digit tables of 2^60 / 2^72 mod q
    (products <= 2^23; fold digits at plane 4 are <= 2^7 since the fold
    constants are < q/2 < 2^55, so plane 4 only reaches ~2^19).
    Round 2: the remaining excess (<= 2^7) folds the same way."""
    p = carry_planes(p)                     # |p4| <= 2^28 + 2^16
    f5 = t.fold[:, 0, :]                    # [L, 5] digits of 2^60 mod q
    f6 = t.fold[:, 1, :]
    for _ in range(2):
        d4, e = _bal12(p[4])
        e_lo, e_hi = _bal12(e)
        out = [p[k] + e_lo * _col(f5[:, k]) + e_hi * _col(f6[:, k])
               for k in range(4)]
        out.append(d4 + e_lo * _col(f5[:, 4]) + e_hi * _col(f6[:, 4]))
        p = carry_planes(out)
    return p


def _sub_mq_planes(p: list[jnp.ndarray], m: jnp.ndarray,
                   t: WideTables) -> list[jnp.ndarray]:
    """planes -= m * q, exact, for |m| <= 2^22: m splits into balanced-12
    m_lo + 2^12 m_hi (|m_hi| <= 2^10); products with the q digits are
    <= 2^22, and m_hi * q_dig[4] (weight 2^60, <= 2^17) folds down via the
    2^60/2^72 tables."""
    m_lo, m_hi = _bal12(m)
    out = [p[k] - m_lo * _col(t.q_dig[:, k]) for k in range(5)]
    for k in range(4):
        out[k + 1] = out[k + 1] - m_hi * _col(t.q_dig[:, k])
    extra = m_hi * _col(t.q_dig[:, 4])      # weight 2^60, |.| <= 2^17
    u, v = _bal12(extra)
    f5 = t.fold[:, 0, :]
    f6 = t.fold[:, 1, :]
    return [out[k] - u * _col(f5[:, k]) - v * _col(f6[:, k])
            for k in range(5)]


def planes_to_pair(p: list[jnp.ndarray], t: WideTables,
                   ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Normalized folded planes (|value| < 2^62) -> centered pair with
    |value| <= 0.51q.

    m = rint(value/q) is estimated in f32 (|m| <= 2^62/2^41 = 2^21, within
    the magic-rint range; absolute f32 error <= 2^62 * 2^-21.7 = 2^40.3, so
    the residual after the exact plane-space subtraction is
    <= (0.5 + 2^40.3/q) q <= 1.2q — within pair capacity for every
    admissible q).  One exact conditional centering step finishes."""
    vf = p[4].astype(jnp.float32)
    for k in (3, 2, 1, 0):
        vf = vf * 4096.0 + p[k].astype(jnp.float32)
    m = _rint_i32(vf * _col(t.qinv_f))
    w = carry_planes(_sub_mq_planes(p, m, t))   # |value| <= 1.2q, |w4| <= 2^8
    lo = w[0] + (w[1] << 12)                # |lo| <= 2^23 + 2^11
    hi = (w[2] >> 1) + (w[3] << 11) + (w[4] << 23)  # weight 2^25 units
    # exact base change: value = lo + 2^24 (w2 + 2^12 w3 + 2^24 w4)
    #                          = lo + 2^24 (w2 & 1) + 2^25 hi
    lo = lo + ((w[2] & 1) << 24)
    lo_b = ((lo + jnp.int32(_B25)) & 0x1FFFFFF) - jnp.int32(_B25)
    hi = hi + ((lo - lo_b) >> 25)
    return _cond_sub(lo_b, hi, t)


def _cond_sub(lo, hi, t: WideTables):
    """One exact centering step: subtract m*q, m = rint(value/q), valid for
    |value| <= ~2.5q (m in {-2..2}; m * q_hi <= 2 * 2^30.6 < 2^31 only when
    q is large enough that m <= 1 — for small q, q_hi <= 2^14 so m * q_hi
    is tiny; the product is always safe).  The f32 estimate of the pair is
    accurate to ~2^-23 relative, far below the q/2 threshold margin."""
    vf = lo.astype(jnp.float32) + hi.astype(jnp.float32) * 33554432.0
    m = _rint_i32(vf * _col(t.qinv_f))
    lo2 = lo - m * _col(t.q_lo)
    hi2 = hi - m * _col(t.q_hi)
    lo_b = ((lo2 + jnp.int32(_B25)) & 0x1FFFFFF) - jnp.int32(_B25)
    hi2 = hi2 + ((lo2 - lo_b) >> 25)
    return lo_b, hi2


# ---------------------------------------------------------------------------
# Elementwise modular ops on pair arrays [.., 2, L, N].
# ---------------------------------------------------------------------------

def _split(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    x = jnp.asarray(x, dtype=jnp.int32)  # numpy inputs misbehave under
    return x[..., 0, :, :], x[..., 1, :, :]  # mixed numpy/jnp promotion


def _join(lo: jnp.ndarray, hi: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([lo, hi], axis=-3)


def add(t: WideTables, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    alo, ahi = _split(a)
    blo, bhi = _split(b)
    lo = alo + blo                          # |.| <= 2^25
    hi = ahi + bhi
    lo_b = ((lo + jnp.int32(_B25)) & 0x1FFFFFF) - jnp.int32(_B25)
    hi = hi + ((lo - lo_b) >> 25)
    return _join(*_cond_sub(lo_b, hi, t))


def sub(t: WideTables, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return add(t, a, -b)


def neg(t: WideTables, a: jnp.ndarray) -> jnp.ndarray:
    return -a


def _mul_planes(pa: list[jnp.ndarray], pb: list[jnp.ndarray],
                t: WideTables) -> list[jnp.ndarray]:
    """Schoolbook product of two 5-plane values, folded back to 5 planes.

    |pa_k|, |pb_k| <= 2^11 (plane 4 may reach 2^12): weight sums
    |w_s| <= 5 * 2^24 < 2^27; each w_s (s >= 5) splits into a balanced-12
    low piece and a high piece (<= 2^15) multiplied into the digit tables
    of 2^{12s} / 2^{12(s+1)} mod q (products <= 2^27)."""
    w = [None] * 9
    for i in range(5):
        for j in range(5):
            s = i + j
            prod = pa[i] * pb[j]
            w[s] = prod if w[s] is None else w[s] + prod
    out = list(w[:5])
    for s in range(5, 9):
        u, v = _bal12(w[s])                 # v: weight 2^{12(s+1)}, <= 2^15
        fs = t.fold[:, s - 5, :]            # [L, 5]
        fs1 = t.fold[:, s - 4, :]
        out = [out[k] + u * _col(fs[:, k]) + v * _col(fs1[:, k])
               for k in range(5)]
    return out


def mulmod(t: WideTables, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Exact a*b mod q on pairs of mod-q magnitude (|x| <= ~2q)."""
    pa = pair_to_planes(*_split(a))
    pb = pair_to_planes(*_split(b))
    p = _mul_planes(pa, pb, t)
    p = fold_excess(p, t)
    return _join(*planes_to_pair(p, t))


def mulmod_planes(t: WideTables, a: jnp.ndarray,
                  c_planes: list[jnp.ndarray]) -> jnp.ndarray:
    """a * c mod q with c pre-extracted as 5 balanced planes (each
    broadcastable against [.., L, N])."""
    pa = pair_to_planes(*_split(a))
    p = _mul_planes(pa, c_planes, t)
    p = fold_excess(p, t)
    return _join(*planes_to_pair(p, t))


def const_planes(t: WideTables, values) -> list[jnp.ndarray]:
    """Host: per-limb scalar constants -> 5 planes of shape [L, 1]."""
    rows = np.array([_digits12(_center(int(v), q))
                     for q, v in zip(t.moduli, values)], np.int32)
    tbl = jnp.asarray(rows)
    return [_col(tbl[:, k]) for k in range(5)]


def mac_planes(acc: list[jnp.ndarray] | None, pa: list[jnp.ndarray],
               pb: list[jnp.ndarray], t: WideTables) -> list[jnp.ndarray]:
    """acc += a*b in folded-plane space WITHOUT the final pair conversion —
    the lazy-accumulation primitive for key-switch MACs
    (gadgetProductMultiplePLazy, evaluator_gadget_product.go:123-190).
    Each term adds <= 2^27 per plane, so up to 8 MACs may accumulate before
    a ``fold_excess`` + ``planes_to_pair`` renormalization (2^27 * 8 = 2^30)."""
    p = _mul_planes(pa, pb, t)
    if acc is None:
        return p
    return [acc[k] + p[k] for k in range(5)]


def center_lift(t: WideTables, lo: jnp.ndarray, hi: jnp.ndarray
                ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact reference-convention centered lift of a pair mod q (single-limb
    tables [1]-shaped or scalar per-limb broadcast): value -> canonical
    c in [0, q), then c - q iff c >= (q-1)/2 (the u64 path's
    ``coeff >= q >> 1`` rule, rlwe/evaluator.py mod_raise and the
    decomposer's single-limb digit lift).  Input may sit on either side of
    +-q/2 (the pair representation near the boundary is ambiguous); the
    output is the unique reference representative.  Requires |value| < q +
    q/2 and normalized lo (balanced 25-bit).

    ``t`` must be SINGLE-LIMB tables; ``lo``/``hi`` carry NO limb axis
    (shape [..., N]) — the constants enter as scalars so no axis is
    injected."""
    assert len(t.moduli) == 1, "center_lift takes single-limb tables"
    q = int(t.moduli[0])
    # all constants in pure host ints (jnp round-trips would stage under jit)
    q_lo_i = ((q + _B25) & 0x1FFFFFF) - _B25
    q_hi_i = (q - q_lo_i) >> 25
    q_lo = jnp.int32(q_lo_i)
    q_hi = jnp.int32(q_hi_i)
    neg = (hi < 0) | ((hi == 0) & (lo < 0))
    clo = lo + jnp.where(neg, q_lo, 0)
    chi = hi + jnp.where(neg, q_hi, 0)
    lo_b = ((clo + jnp.int32(_B25)) & 0x1FFFFFF) - jnp.int32(_B25)
    chi = chi + ((clo - lo_b) >> 25)
    clo = lo_b
    # h = (q-1) >> 1 as a normalized pair
    h = (q - 1) >> 1
    h_lo_i = ((h + _B25) & 0x1FFFFFF) - _B25
    h_lo = jnp.int32(h_lo_i)
    h_hi = jnp.int32((h - h_lo_i) >> 25)
    ge = (chi > h_hi) | ((chi == h_hi) & (clo >= h_lo))
    lo2 = clo - jnp.where(ge, q_lo, 0)
    hi2 = chi - jnp.where(ge, q_hi, 0)
    lo_b = ((lo2 + jnp.int32(_B25)) & 0x1FFFFFF) - jnp.int32(_B25)
    hi2 = hi2 + ((lo2 - lo_b) >> 25)
    return lo_b, hi2


def canon(t: WideTables, a: jnp.ndarray) -> jnp.ndarray:
    """Bounded pair -> canonical centered pair, exact: |x| <= 0.5q with the
    sign convention of rounding (ties keep the f32-rint choice; use
    ``unpack_pair`` for the [0, q) canonical form)."""
    lo, hi = _split(a)
    lo, hi = _cond_sub(lo, hi, t)
    lo, hi = _cond_sub(lo, hi, t)
    return _join(lo, hi)
