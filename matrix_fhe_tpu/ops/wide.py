"""Wide-modulus (41-61-bit) residue arithmetic on 32-bit integer lanes.

The reference's production parameter sets use 45/55-bit primes
(schemes/ckks/example_parameters.go:22-30) and its bootstrapping-grade sets
add 56/60/61-bit primes (circuits/ckks/bootstrapping/default_parameters.go:
25-40, ring/modular_reduction.go:78-197 64-bit Montgomery).  TPUs have no
64-bit (nor widening 32x32) multiplier, so this module implements exact
mod-q arithmetic for 2^41 <= q < 2^61 out of int32 lanes only, in two
modes selected per parameter set:

* **pair25 mode** (q < 1.5 * 2^55): a residue is a *centered pair*
  ``(lo, hi)`` of int32 with ``x = lo + 2^25 * hi``, ``lo`` balanced 25-bit
  (|lo| <= 2^24) and ``|hi| < 2^31`` — capacity |x| < 2^56.  Compute uses
  **5** balanced base-2^12 digit planes.

* **pair31 mode** (up to q < 2^61): ``x = lo + 2^31 * hi`` with ``lo``
  balanced 31-bit (lo in [-2^30, 2^30)) — capacity |x| < 2^62, enough for
  the ~1.2q intermediates of 61-bit moduli.  Compute uses **6** digit
  planes (a 36-multiply schoolbook product instead of 25), so a parameter
  set pays for 61-bit support only if it contains a prime >= 1.5 * 2^55.

Either way a residue is 8 bytes/coefficient, the same HBM footprint as the
u64 path.  Array layout: ``int32 [..., 2, L, N]`` with the pair axis in
front of the (limb, coeff) plane so limb-sliced level views stay
contiguous.  The mode is carried by :class:`WideTables` (``nplanes``/
``shift`` meta fields) and must be uniform across every ring of one
parameter context (q and p limbs share gadget/basis-extension plumbing).

Compute model (both modes): every multiply is (<=2^12) x (<=2^12) -> <=
2^24 so all products and their few-dozen-term accumulations stay far
inside int32; wide weights (2^{12s}, s >= nplanes) are folded down with
per-modulus tables of the digits of ``2^{12s} mod q``, and
nearest-multiple subtractions use f32 ``rint`` quotient estimates whose
*error tolerance* (not exactness) is all that correctness needs — the
arithmetic itself is exact integer math throughout, so results are exact
mod q.  Inline comments carry the overflow proofs; the worst cases are
q = 2^41 (largest quotients) and q just below the mode capacity (largest
words).

All ops are elementwise over arrays shaped [..., 2, L, N] (pairs),
vectorized over (limb, coeff) exactly like ops/modmath.py; bit-exactness
vs the u64 path is pinned in tests/test_wide.py.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

MIN_WIDE_MODULUS = 1 << 41
PAIR25_MAX_MODULUS = 3 << 54        # 1.5 * 2^55: pair25/5-plane mode limit
# pair31/6-plane mode limit: "61-bit" NTT-friendly primes alternate around
# 2^61 (spacing 2N), so admit a 2^55 margin above; the pair capacity of
# 2^62 then still holds ~1.9q lazy representatives (1.9 * (2^61 + 2^55) <
# 2^62) and 1.03q add intermediates.
MAX_WIDE_MODULUS = (1 << 61) + (1 << 55)

_B12 = 1 << 11                      # balanced base-2^12 bias
_NFOLD = 9                          # fold table spans s = 5..13


def use_pair31(moduli) -> bool:
    """The mode rule: pair31/6-plane iff any modulus exceeds pair25
    capacity.  Context builders apply this over ALL moduli (q and p) of a
    parameter set so every ring of the context shares one mode."""
    return any(int(q) >= PAIR25_MAX_MODULUS for q in moduli)


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

def _digits12(x: int, ndig: int = 5) -> list[int]:
    """Balanced base-2^12 digits (``ndig``) of a centered integer
    |x| < 2^{12 ndig - 2}."""
    out = []
    for _ in range(ndig):
        d = ((x + (1 << 11)) & 0xFFF) - (1 << 11)
        out.append(d)
        x = (x - d) >> 12
    assert x == 0, "value too wide for the digit count"
    return out


def _center(x: int, q: int) -> int:
    x %= q
    return x - q if x > q // 2 else x


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["q_dig", "fold", "q_lo", "q_hi", "qinv_f"],
    meta_fields=["moduli", "nplanes", "shift"],
)
@dataclasses.dataclass(frozen=True)
class WideTables:
    """Per-limb constants for pair/plane arithmetic over moduli Q.

    ``nplanes``/``shift`` carry the mode: (5, 25) pair25 or (6, 31)
    pair31.  ``fold[:, i]`` holds the digits of centered(2^{12(i+5)} mod
    q) for i = 0..8 (s = 5..13, enough for the 8-digit-plane NTT's weight
    diagonals)."""
    moduli: tuple[int, ...]
    nplanes: int          # 5 (pair25) or 6 (pair31)
    shift: int            # 25 (pair25) or 31 (pair31)
    q_dig: jnp.ndarray    # int32 [L, nplanes]         balanced digits of q
    fold: jnp.ndarray     # int32 [L, 9, nplanes]      digits of 2^{12s} mod q
    q_lo: jnp.ndarray     # int32 [L] balanced low word of q (base 2^shift)
    q_hi: jnp.ndarray     # int32 [L] (q - q_lo) >> shift
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
        return dataclasses.replace(
            self, moduli=self.moduli[:k], q_dig=self.q_dig[:k],
            fold=self.fold[:k], q_lo=self.q_lo[:k], q_hi=self.q_hi[:k],
            qinv_f=self.qinv_f[:k])

    def limb_slice(self, s: slice) -> "WideTables":
        return dataclasses.replace(
            self, moduli=self.moduli[s], q_dig=self.q_dig[s],
            fold=self.fold[s], q_lo=self.q_lo[s], q_hi=self.q_hi[s],
            qinv_f=self.qinv_f[s])


def mac_period(t: WideTables) -> int:
    """How many lazy ``mac_planes`` accumulations fit before a
    ``fold_excess`` renormalization: per-MAC plane terms stay <= ~2^27.6
    (pair25, 25-product schoolbook) / ~2^28.6 (pair31, 36 products), so 8
    resp. 4 MACs keep the int32 accumulators below 2^31."""
    return 8 if t.nplanes == 5 else 4


def build_wide_tables(moduli, pair31: bool | None = None) -> WideTables:
    moduli = tuple(int(q) for q in moduli)
    if pair31 is None:
        pair31 = use_pair31(moduli)
    nplanes, shift = (6, 31) if pair31 else (5, 25)
    bias = 1 << (shift - 1)
    mask = (1 << shift) - 1
    q_dig, fold, q_lo, q_hi = [], [], [], []
    limit = MAX_WIDE_MODULUS if pair31 else PAIR25_MAX_MODULUS
    for q in moduli:
        if not MIN_WIDE_MODULUS <= q < limit:
            raise ValueError(f"modulus {q} outside the wide path range "
                             f"[2^41, {limit}) for mode pair{shift}")
        q_dig.append(_digits12(q, nplanes))
        fold.append([_digits12(_center(1 << (12 * s), q), nplanes)
                     for s in range(5, 5 + _NFOLD)])
        lo = ((q + bias) & mask) - bias
        q_lo.append(lo)
        q_hi.append((q - lo) >> shift)
    return WideTables(
        moduli=moduli, nplanes=nplanes, shift=shift,
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

def pack_pair(x: np.ndarray, moduli, pair31: bool | None = None) -> np.ndarray:
    """uint64 [.., L, N] canonical [0, q) -> int32 [.., 2, L, N] centered
    pair.  ``pair31`` must match the tables of the consuming ring; None
    derives it from ``moduli`` via the context rule (correct only when the
    ring was built from the same modulus list)."""
    if pair31 is None:
        pair31 = use_pair31(moduli)
    shift = 31 if pair31 else 25
    bias, mask = 1 << (shift - 1), (1 << shift) - 1
    x = np.asarray(x, dtype=np.uint64).astype(np.int64)
    q = np.array([int(m) for m in moduli], dtype=np.int64).reshape(
        (1,) * (x.ndim - 2) + (-1, 1))
    c = np.where(x > q // 2, x - q, x)
    lo = ((c + bias) & mask) - bias
    hi = (c - lo) >> shift
    out = np.stack([lo, hi], axis=-3)
    assert np.all(np.abs(out) < (1 << 31))
    return out.astype(np.int32)


def unpack_pair(p: np.ndarray, moduli,
                pair31: bool | None = None) -> np.ndarray:
    """int32 [.., 2, L, N] pair (any bounded representative) -> uint64
    canonical [0, q)."""
    if pair31 is None:
        pair31 = use_pair31(moduli)
    shift = 31 if pair31 else 25
    p = np.asarray(p).astype(np.int64)
    lo, hi = p[..., 0, :, :], p[..., 1, :, :]
    q = np.array([int(m) for m in moduli], dtype=np.int64).reshape(
        (1,) * (lo.ndim - 2) + (-1, 1))
    return (((lo + (hi << shift)) % q) % q).astype(np.uint64)


# ---------------------------------------------------------------------------
# Pair normalization (device).
# ---------------------------------------------------------------------------

def _renorm(lo: jnp.ndarray, hi: jnp.ndarray, shift: int
            ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Rebalance a pair whose ``lo`` drifted outside the balanced window
    (carry into ``hi``), exact for any int32 ``lo``.

    shift=25: plain mask + arithmetic-shift carry (|carry| can exceed 1).
    shift=31: ``lo + bias`` and ``lo - lo_b`` may wrap int32, but the mask
    result is still the true value mod 2^31 (wraparound preserves mod-2^31
    classes); the carry is recovered from window comparisons, valid because
    |carry| <= 1 whenever lo fits int32."""
    bias = jnp.int32(1 << (shift - 1))
    mask = (1 << shift) - 1
    lo_b = ((lo + bias) & mask) - bias
    if shift == 25:
        return lo_b, hi + ((lo - lo_b) >> 25)
    c = (lo >= bias).astype(jnp.int32) - (lo < -bias).astype(jnp.int32)
    return lo_b, hi + c


# ---------------------------------------------------------------------------
# Planes: balanced base-2^12 digit extraction / recombination (device).
# ---------------------------------------------------------------------------

def pair_to_planes(lo: jnp.ndarray, hi: jnp.ndarray,
                   t: WideTables | None = None) -> list[jnp.ndarray]:
    """Pair -> ``nplanes`` balanced base-2^12 planes (exact, any pair
    within capacity).  |d_k| <= 2^11 for k < nplanes-1; the last plane
    absorbs the excess (<= |x|/2^{12(nplanes-1)} + 1).

    ``t`` selects the mode; None means pair25 (backward-compatible)."""
    if t is None or t.shift == 25:
        d0, r = _bal12(lo)
        d1, r = _bal12(r)                   # r in {-1, 0, 1}: lo is 25-bit
        h = r + hi * 2                      # weight 2^24: x = ... + 2^24 h
        d2, h = _bal12(h)
        d3, d4 = _bal12(h)
        return [d0, d1, d2, d3, d4]
    # pair31: x = lo + 2^31 hi = d0 + 2^12 d1 + 2^24 (r + 2^7 e0)
    #         + 2^36 (2^7 e1) + 2^48 (2^7 e2)   with hi = e0 + 2^12 e1 + 2^24 e2
    # (hi is NOT pre-shifted by 2^7: |hi| < 2^31 would overflow).
    d0, r = _bal12(lo)
    d1, r = _bal12(r)                       # |r| <= 2^7: lo is 31-bit
    e0, re = _bal12(hi)
    e1, e2 = _bal12(re)                     # |e2| <= 2^7: hi fits int32
    d2, c = _bal12(r + (e0 << 7))           # |.| <= 2^18 + 2^7
    d3, c = _bal12((e1 << 7) + c)
    d4, c = _bal12((e2 << 7) + c)           # |.| <= 2^14 + 2^7
    return [d0, d1, d2, d3, d4, c]


def carry_planes(p: list[jnp.ndarray]) -> list[jnp.ndarray]:
    """Normalize planes: all but the last balanced 12-bit exact, excess
    into the last."""
    out = []
    c = jnp.zeros((), dtype=jnp.int32)
    for k in range(len(p) - 1):
        d, c = _bal12(p[k] + c)
        out.append(d)
    out.append(p[-1] + c)
    return out


def fold_excess(p: list[jnp.ndarray], t: WideTables) -> list[jnp.ndarray]:
    """Fold the last plane's bits above weight 2^{12(P-1)+11} down via the
    2^{12s} mod q tables (two rounds), then carry-normalize.  Input
    |p_k| <= ~2^30; output p0..p_{P-2} balanced 12-bit and |p_{P-1}| small,
    so the plane value is < 2^{12P + 2}.

    Round 1: excess e = p_last >> 12 (|e| <= 2^18) splits into balanced-12
    pieces e_lo, e_hi multiplied into the digit tables of 2^{12P} /
    2^{12(P+1)} mod q (products <= 2^23).  Round 2: the remaining excess
    (<= 2^7) folds the same way."""
    P = t.nplanes
    p = carry_planes(p)
    fa = t.fold[:, P - 5, :]                # [L, P] digits of 2^{12P} mod q
    fb = t.fold[:, P - 4, :]
    for _ in range(2):
        dl, e = _bal12(p[P - 1])
        e_lo, e_hi = _bal12(e)
        out = [p[k] + e_lo * _col(fa[:, k]) + e_hi * _col(fb[:, k])
               for k in range(P - 1)]
        out.append(dl + e_lo * _col(fa[:, P - 1]) + e_hi * _col(fb[:, P - 1]))
        p = carry_planes(out)
    return p


def _sub_mq_planes(p: list[jnp.ndarray], m: jnp.ndarray,
                   t: WideTables) -> list[jnp.ndarray]:
    """planes -= m * q, exact, for |m| <= 2^22: m splits into balanced-12
    m_lo + 2^12 m_hi (|m_hi| <= 2^10); products with the q digits are
    <= 2^22, and m_hi * q_dig[P-1] (weight 2^{12P}, <= 2^21) folds down via
    the 2^{12P}/2^{12(P+1)} tables."""
    P = t.nplanes
    m_lo, m_hi = _bal12(m)
    out = [p[k] - m_lo * _col(t.q_dig[:, k]) for k in range(P)]
    for k in range(P - 1):
        out[k + 1] = out[k + 1] - m_hi * _col(t.q_dig[:, k])
    extra = m_hi * _col(t.q_dig[:, P - 1])  # weight 2^{12P}, |.| <= 2^21
    u, v = _bal12(extra)
    fa = t.fold[:, P - 5, :]
    fb = t.fold[:, P - 4, :]
    return [out[k] - u * _col(fa[:, k]) - v * _col(fb[:, k])
            for k in range(P)]


def _sub_mq_planes_big(p: list[jnp.ndarray], m: jnp.ndarray,
                       t: WideTables) -> list[jnp.ndarray]:
    """planes -= m * q for any int32 ``m`` (pair31 first-round quotients
    reach ~2^31): m splits into THREE balanced-12 digits; digit-digit
    products with the q digits are <= 2^23, and the two cross terms above
    plane P-1 fold via the 2^{12P}/2^{12(P+1)} tables."""
    P = t.nplanes
    m0, r = _bal12(m)
    m1, m2 = _bal12(r)
    out = list(p)
    for i, mi in enumerate((m0, m1, m2)):
        for k in range(P):
            s = i + k
            prod = mi * _col(t.q_dig[:, k])
            if s < P:
                out[s] = out[s] - prod
            else:
                u, v = _bal12(prod)         # v at weight 2^{12(s+1)}
                fa = t.fold[:, s - 5, :]
                fb = t.fold[:, s - 4, :]
                out = [out[j] - u * _col(fa[:, j]) - v * _col(fb[:, j])
                       for j in range(P)]
    return out


def _planes_f32(p: list[jnp.ndarray]) -> jnp.ndarray:
    """f32 Horner estimate of the plane value (relative error ~P * 2^-24)."""
    vf = p[-1].astype(jnp.float32)
    for k in range(len(p) - 2, -1, -1):
        vf = vf * 4096.0 + p[k].astype(jnp.float32)
    return vf


def planes_to_pair(p: list[jnp.ndarray], t: WideTables,
                   ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Normalized folded planes -> centered pair with |value| <= 0.51q.

    pair25 (|value| < 2^62 after fold_excess): m = rint(value/q) is
    estimated in f32 (|m| <= 2^21; relative f32 error ~P * 2^-24, so the
    residual after the exact plane-space subtraction is <=
    (0.5 + 2^40.6/q) q <= 1.2q) and one exact conditional centering step
    finishes.

    pair31 (|value| < ~2^72: fold_excess leaves a balanced-12 last plane
    at weight 2^60): the first quotient can reach 2^31, subtracted exactly
    via the 3-digit ``_sub_mq_planes_big`` (the f32 representation of m
    itself rounds at ~2^24, an error folded into the residual bound); a
    second round with the now-small value (residual <= ~2^10 q) leaves
    |value| <= 0.51q, so the final _cond_sub sees |m| <= 1 and its
    products stay inside int32 even at 61-bit q."""
    m = _rint_i32(_planes_f32(p) * _col(t.qinv_f))
    if t.shift == 25:
        w = carry_planes(_sub_mq_planes(p, m, t))
        # |value| <= 1.2q, |w4| <= 2^8
        lo = w[0] + (w[1] << 12)            # |lo| <= 2^23 + 2^11
        hi = (w[2] >> 1) + (w[3] << 11) + (w[4] << 23)  # weight 2^25 units
        # exact base change: value = lo + 2^24 (w2 + 2^12 w3 + 2^24 w4)
        #                          = lo + 2^24 (w2 & 1) + 2^25 hi
        lo = lo + ((w[2] & 1) << 24)
        lo, hi = _renorm(lo, hi, 25)
        return _cond_sub(lo, hi, t)
    w = carry_planes(_sub_mq_planes_big(p, m, t))
    # second round: |value| <= ~2^10 q (worst case q = 2^41: the f32
    # estimate of a 2^72-magnitude value is off by <= 2^50/q ~ 2^9, plus
    # the f32 rounding of m adds <= 2^7); m2 <= 2^11 fits _sub_mq_planes.
    m2 = _rint_i32(_planes_f32(w) * _col(t.qinv_f))
    w = carry_planes(_sub_mq_planes(w, m2, t))
    # |value| <= 0.51q < 2^60.1, |w5| <= 2
    a = ((w[2] + jnp.int32(64)) & 127) - jnp.int32(64)  # low 7 bits of w2
    b = (w[2] - a) >> 7                                 # |b| <= 2^4
    lo = w[0] + (w[1] << 12) + (a << 24)    # |lo| <= 2^30 + 2^23 + 2^11
    hi = b + (w[3] << 5) + (w[4] << 17) + (w[5] << 29)
    lo, hi = _renorm(lo, hi, 31)
    return _cond_sub(lo, hi, t)


def _cond_sub(lo, hi, t: WideTables):
    """One exact centering step: subtract m*q, m = rint(value/q).

    pair25: valid for |value| <= ~2.5q (m in {-2..2}; m * q_hi <=
    2 * 2^30.6 < 2^31 only when q is large enough that m <= 1 — for small
    q, q_hi <= 2^14 so m * q_hi is tiny; the product is always safe).
    pair31: callers guarantee |value| <= ~1.5q so m in {-1, 0, 1} and
    |m * q_lo| <= 2^30, |m * q_hi| <= 2^30 stay inside int32.  The f32
    estimate of the pair is accurate to ~2^-23 relative, far below the q/2
    threshold margin."""
    scale = float(1 << t.shift)
    vf = lo.astype(jnp.float32) + hi.astype(jnp.float32) * scale
    m = _rint_i32(vf * _col(t.qinv_f))
    lo2 = lo - m * _col(t.q_lo)
    hi2 = hi - m * _col(t.q_hi)
    return _renorm(lo2, hi2, t.shift)


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
    lo = alo + blo      # pair25: |.| <= 2^25; pair31: in [-2^31, 2^31 - 2]
    hi = ahi + bhi
    lo, hi = _renorm(lo, hi, t.shift)
    return _join(*_cond_sub(lo, hi, t))


def sub(t: WideTables, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return add(t, a, -b)


def neg(t: WideTables, a: jnp.ndarray) -> jnp.ndarray:
    return -a


def _mul_planes(pa: list[jnp.ndarray], pb: list[jnp.ndarray],
                t: WideTables) -> list[jnp.ndarray]:
    """Schoolbook product of two P-plane values, folded back to P planes.

    |pa_k|, |pb_k| <= 2^11 (the last plane may reach 2^12): weight sums
    |w_s| <= P * 2^24 < 2^27; each w_s (s >= P) splits into a balanced-12
    low piece and a high piece (<= 2^15) multiplied into the digit tables
    of 2^{12s} / 2^{12(s+1)} mod q (products <= 2^27)."""
    P = t.nplanes
    w = [None] * (2 * P - 1)
    for i in range(P):
        for j in range(P):
            s = i + j
            prod = pa[i] * pb[j]
            w[s] = prod if w[s] is None else w[s] + prod
    out = list(w[:P])
    for s in range(P, 2 * P - 1):
        u, v = _bal12(w[s])                 # v: weight 2^{12(s+1)}, <= 2^15
        fs = t.fold[:, s - 5, :]
        fs1 = t.fold[:, s - 4, :]
        out = [out[k] + u * _col(fs[:, k]) + v * _col(fs1[:, k])
               for k in range(P)]
    return out


def mulmod(t: WideTables, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Exact a*b mod q on pairs of mod-q magnitude (|x| <= ~2q)."""
    pa = pair_to_planes(*_split(a), t)
    pb = pair_to_planes(*_split(b), t)
    p = _mul_planes(pa, pb, t)
    p = fold_excess(p, t)
    return _join(*planes_to_pair(p, t))


def mulmod_planes(t: WideTables, a: jnp.ndarray,
                  c_planes: list[jnp.ndarray]) -> jnp.ndarray:
    """a * c mod q with c pre-extracted as P balanced planes (each
    broadcastable against [.., L, N])."""
    pa = pair_to_planes(*_split(a), t)
    p = _mul_planes(pa, c_planes, t)
    p = fold_excess(p, t)
    return _join(*planes_to_pair(p, t))


def const_planes(t: WideTables, values) -> list[jnp.ndarray]:
    """Host: per-limb scalar constants -> P planes of shape [L, 1]."""
    rows = np.array([_digits12(_center(int(v), q), t.nplanes)
                     for q, v in zip(t.moduli, values)], np.int32)
    tbl = jnp.asarray(rows)
    return [_col(tbl[:, k]) for k in range(t.nplanes)]


def mac_planes(acc: list[jnp.ndarray] | None, pa: list[jnp.ndarray],
               pb: list[jnp.ndarray], t: WideTables) -> list[jnp.ndarray]:
    """acc += a*b in folded-plane space WITHOUT the final pair conversion —
    the lazy-accumulation primitive for key-switch MACs
    (gadgetProductMultiplePLazy, evaluator_gadget_product.go:123-190).
    Each term adds <= ~2^28 per plane, so up to ``mac_period(t)`` MACs may
    accumulate before a ``fold_excess`` + ``planes_to_pair``
    renormalization."""
    p = _mul_planes(pa, pb, t)
    if acc is None:
        return p
    return [acc[k] + p[k] for k in range(t.nplanes)]


def center_lift(t: WideTables, lo: jnp.ndarray, hi: jnp.ndarray
                ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact reference-convention centered lift of a pair mod q (single-limb
    tables [1]-shaped or scalar per-limb broadcast): value -> canonical
    c in [0, q), then c - q iff c >= (q-1)/2 (the u64 path's
    ``coeff >= q >> 1`` rule, rlwe/evaluator.py mod_raise and the
    decomposer's single-limb digit lift).  Input may sit on either side of
    +-q/2 (the pair representation near the boundary is ambiguous); the
    output is the unique reference representative.  Requires |value| < q +
    q/2 and normalized lo.

    ``t`` must be SINGLE-LIMB tables; ``lo``/``hi`` carry NO limb axis
    (shape [..., N]) — the constants enter as scalars so no axis is
    injected."""
    assert len(t.moduli) == 1, "center_lift takes single-limb tables"
    q = int(t.moduli[0])
    shift = t.shift
    bias, mask = 1 << (shift - 1), (1 << shift) - 1
    # all constants in pure host ints (jnp round-trips would stage under jit)
    q_lo_i = ((q + bias) & mask) - bias
    q_hi_i = (q - q_lo_i) >> shift
    q_lo = jnp.int32(q_lo_i)
    q_hi = jnp.int32(q_hi_i)
    neg_ = (hi < 0) | ((hi == 0) & (lo < 0))
    clo = lo + jnp.where(neg_, q_lo, 0)
    chi = hi + jnp.where(neg_, q_hi, 0)
    clo, chi = _renorm(clo, chi, shift)
    # h = (q-1) >> 1 as a normalized pair
    h = (q - 1) >> 1
    h_lo_i = ((h + bias) & mask) - bias
    h_lo = jnp.int32(h_lo_i)
    h_hi = jnp.int32((h - h_lo_i) >> shift)
    ge = (chi > h_hi) | ((chi == h_hi) & (clo >= h_lo))
    lo2 = clo - jnp.where(ge, q_lo, 0)
    hi2 = chi - jnp.where(ge, q_hi, 0)
    return _renorm(lo2, hi2, shift)


def canon(t: WideTables, a: jnp.ndarray) -> jnp.ndarray:
    """Bounded pair -> canonical centered pair, exact: |x| <= 0.5q with the
    sign convention of rounding (ties keep the f32-rint choice; use
    ``unpack_pair`` for the [0, q) canonical form)."""
    if t.shift == 25:
        lo, hi = _split(a)
        lo, hi = _cond_sub(lo, hi, t)       # |m| <= 2 is safe in pair25
        lo, hi = _cond_sub(lo, hi, t)
        return _join(lo, hi)
    # pair31: an arbitrary in-capacity value can be ~4q at 60-bit q, where
    # _cond_sub's m would overflow its products — go through plane space.
    p = pair_to_planes(*_split(a), t)
    p = fold_excess(p, t)
    return _join(*planes_to_pair(p, t))
