"""Wide-modulus (41-55-bit) negacyclic NTT as int8-digit MXU matmuls.

Four-step decomposition with the same factor matrices, psi-power tables and
bit-reversed output ordering as ops/mxu_ntt.py / ops/pallas_ntt2.py (and
therefore bit-exact vs the u64 butterfly NTT of ops/rings.py, the
counterpart of /root/reference/ring/ntt.go:174-606) — but over the wide
pair representation of ops/wide.py:

* Inputs/outputs are centered int32 pairs ``[..., 2, L, N]`` (wide.py).
* Each matmul stage extracts **7 balanced base-256 int8 digit planes** from
  the pair (a 55-bit centered value spans 7 bytes) and contracts them
  against the 7-plane digit decomposition of the (transposed) factor matrix
  in ONE [7M, K] @ [K, 7K'] int8 matmul per limb: digit cross products
  land on 13 weight diagonals 2^{8s}, s = 0..12.
* Recombination maps the byte-weight diagonals onto balanced base-2^12
  planes (8s = 12t + r, r in {0, 4, 8}; every partial product <= 2^19) and
  reuses wide.py's fold tables for weights >= 2^60.
* The diagonal twiddle multiply is an elementwise 5x5-plane schoolbook
  (wide._mul_planes) against precomputed twiddle digit planes.

Every arithmetic step is exact integer math; f32 enters only through
quotient estimates with proven error tolerance (wide.py).  Bit-exactness vs
the u64 ring NTT is pinned in tests/test_wide_ntt.py.

Layouts: matmuls run with the limb axis leading ([7, L, lead.., M, K]);
elementwise plane math runs in wide.py's [lead.., L, X] convention (limb
axis at -2) so the [L, 1]-shaped per-limb tables broadcast.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from matrix_fhe_tpu.ops import wide
from matrix_fhe_tpu.ops.mxu_ntt import four_step_factors
from matrix_fhe_tpu.utils import primes as pr


def _digit_planes7(mat: np.ndarray, q: int, nd: int = 7) -> np.ndarray:
    """object/int [r, c] mod q -> int8 [nd, r, c] balanced base-256 digit
    planes of the centered representative (nd = 7 pair25 / 8 pair31)."""
    m = np.array(mat, dtype=object)
    c = np.where(m > q // 2, m - q, m)
    planes = []
    for _ in range(nd):
        d = ((c + 128) % 256) - 128
        planes.append(np.vectorize(int)(d).astype(np.int8))
        c = (c - d) >> 8
    assert np.all(np.vectorize(int)(c) == 0)
    return np.stack(planes)


def _tw_planes(mat: np.ndarray, q: int, nplanes: int = 5) -> np.ndarray:
    """[r, c] twiddles mod q -> int32 [nplanes, r*c] balanced base-2^12
    planes of the centered representatives (flattened for the elementwise
    layout)."""
    m = np.array(mat, dtype=object).reshape(-1)
    c = np.where(m > q // 2, m - q, m)
    planes = []
    for _ in range(nplanes):
        d = ((c + (1 << 11)) % (1 << 12)) - (1 << 11)
        planes.append(np.vectorize(int)(d).astype(np.int32))
        c = (c - d) >> 12
    assert np.all(np.vectorize(int)(c) == 0)
    return np.stack(planes)


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["a7", "b7", "tw", "a7i", "b7i", "twi", "wt"],
    meta_fields=["n", "rows", "cols"],
)
@dataclasses.dataclass(frozen=True)
class WideNTTTables:
    n: int
    rows: int
    cols: int
    a7: jnp.ndarray    # int8 [L, 7, R, R]   A^T digit planes (fwd stage 1)
    b7: jnp.ndarray    # int8 [L, 7, C, C]   B^T digit planes (fwd stage 2)
    tw: jnp.ndarray    # int32 [5, L, C*R]   fwd twiddles ([C, R] layout)
    a7i: jnp.ndarray   # int8 [L, 7, R, R]   Ainv^T digit planes (bwd stage 2)
    b7i: jnp.ndarray   # int8 [L, 7, C, C]   Binv^T digit planes (bwd stage 1)
    twi: jnp.ndarray   # int32 [5, L, R*C]   bwd twiddles ([R, C] layout)
    wt: wide.WideTables


def build_tables(n: int, moduli, pair31: bool | None = None) -> WideNTTTables:
    logn = n.bit_length() - 1
    a_bits = logn // 2
    R, C = 1 << a_bits, 1 << (logn - a_bits)

    wt = wide.build_wide_tables(moduli, pair31=pair31)
    nd = 7 if wt.shift == 25 else 8

    a7, b7, tw, a7i, b7i, twi = ([] for _ in range(6))
    for q in moduli:
        g, _ = pr.primitive_root(q)
        psi = pow(g, (q - 1) // (2 * n), q)
        A, T, B, Ainv, Binv, Tinv = four_step_factors(n, q, psi)
        a7.append(_digit_planes7(np.array(A, dtype=object).T, q, nd))
        b7.append(_digit_planes7(np.array(B, dtype=object).T, q, nd))
        a7i.append(_digit_planes7(np.array(Ainv, dtype=object).T, q, nd))
        b7i.append(_digit_planes7(np.array(Binv, dtype=object).T, q, nd))
        P = wt.nplanes
        tw.append(_tw_planes(np.array(T, dtype=object).T, q, P))   # [P, C*R]
        twi.append(_tw_planes(np.array(Tinv, dtype=object), q, P))  # [P, R*C]

    return WideNTTTables(
        n=n, rows=R, cols=C,
        a7=jnp.asarray(np.stack(a7)), b7=jnp.asarray(np.stack(b7)),
        tw=jnp.asarray(np.stack(tw, axis=1)),     # [P, L, C*R]
        a7i=jnp.asarray(np.stack(a7i)), b7i=jnp.asarray(np.stack(b7i)),
        twi=jnp.asarray(np.stack(twi, axis=1)),   # [P, L, R*C]
        wt=wt)


# ---------------------------------------------------------------------------
# Device-side helpers.
# ---------------------------------------------------------------------------

def _pair_digits7(lo: jnp.ndarray, hi: jnp.ndarray,
                  shift: int = 25) -> jnp.ndarray:
    """Centered pair -> int8 [7 or 8, ...] balanced base-256 digits, exact.

    pair25: |lo| <= 2^24 gives digits d0..d2 plus a {-1,0,1} carry; the
    carry joins ``2*hi`` at weight 2^24 for digits d3..d6 (|hi| < 2^30 for
    mod-q values, so d6 fits int8).

    pair31: lo (31-bit) gives d0..d3 exactly; hi cannot be pre-shifted by
    2^7 (|hi| < 2^31 would overflow), so its own byte digits e_k enter the
    chain as ``e_k << 7`` at byte positions 3+k with a running byte carry
    (|e_k << 7| <= 2^15, far inside int32; the tail digit d7 <= 2^6 for
    mod-q magnitudes)."""
    def b8(v):
        d = ((v + jnp.int32(128)) & 255) - jnp.int32(128)
        return d, (v - d) >> 8

    if shift == 25:
        d0, r = b8(lo)
        d1, r = b8(r)
        d2, r = b8(r)                # r in {-1, 0, 1}
        h = r + hi * 2               # weight 2^24
        d3, h = b8(h)
        d4, h = b8(h)
        d5, d6 = b8(h)
        return jnp.stack([d0, d1, d2, d3, d4, d5, d6]).astype(jnp.int8)
    d0, r = b8(lo)
    d1, r = b8(r)
    d2, r = b8(r)
    d3 = r                           # |d3| <= 2^6: lo is 31-bit
    e0, re = b8(hi)
    e1, re = b8(re)
    e2, e3 = b8(re)                  # |e3| <= 2^7: hi fits int32
    d3, c = b8(d3 + (e0 << 7))       # x = lo + 2^31 hi: e_k lands at byte
    d4, c = b8((e1 << 7) + c)        # position 3+k with a 2^7 scale
    d5, c = b8((e2 << 7) + c)
    d6, d7 = b8((e3 << 7) + c)
    return jnp.stack([d0, d1, d2, d3, d4, d5, d6, d7]).astype(jnp.int8)


def _matmul7(x_dig: jnp.ndarray, w_dig: jnp.ndarray) -> list[jnp.ndarray]:
    """Digit contraction: x_dig [D, L, lead.., M, K] @ w_dig [L, D, K, K']
    -> 2D-1 weight diagonals, int32, in the ELEMENTWISE layout
    [lead.., L, M*K'] (matrix dims merged so [L, 1] tables broadcast).
    D = 7 (pair25) or 8 (pair31) digit planes.

    One flat [D*lead*M, K] @ [K, DK'] int8 matmul per limb (the batched
    small-matmul form is ~100x slower on the MXU, see ops/mxu_ntt.py)."""
    D = x_dig.shape[0]
    L = x_dig.shape[1]
    lead = x_dig.shape[2:-2]
    M, K = x_dig.shape[-2], x_dig.shape[-1]
    Kp = w_dig.shape[-1]
    per_limb = []
    for l in range(L):
        lhs = x_dig[:, l].reshape(-1, K)
        rhs = jnp.swapaxes(w_dig[l], 0, 1).reshape(K, D * Kp)
        p = jax.lax.dot_general(
            lhs, rhs, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        per_limb.append(p.reshape((D,) + lead + (M, D, Kp)))
    # limb axis to -4 (just before M, digit j, K'): [D, lead.., L, M, D, K']
    prod = jnp.stack(per_limb, axis=len(lead) + 1)
    diags: list = [None] * (2 * D - 1)
    for i in range(D):
        for j in range(D):
            s = i + j
            d = prod[i, ..., j, :]              # [lead.., L, M, K']
            d = d.reshape(d.shape[:-2] + (M * Kp,))
            diags[s] = d if diags[s] is None else diags[s] + d
    return diags


def _diags_to_planes(diags: list[jnp.ndarray],
                     t: wide.WideTables) -> list[jnp.ndarray]:
    """2D-1 byte-weight diagonals (|d_s| <= 2^27, layout [lead.., L, X])
    -> P normalized balanced base-2^12 planes (P = t.nplanes).

    Each diagonal splits into 3 balanced-12 pieces (u0, u1, u2 with
    |u2| <= 2^4); 8s = 12t + r maps piece u_i to bucket t+i with an exact
    2^r scale (r in {0, 4, 8}: |u_i * 2^r| <= 2^19).  Buckets reach index
    (8(2D-2))//12 + 2 <= 11 and stay < (2D-1) * 3 * 2^19 < 2^25; buckets
    >= P fold down via the 2^{12s} mod q digit tables (s <= 11 needs fold
    entries up to s+1 = 12, within the 9-entry s=5..13 table)."""
    nb = (8 * (len(diags) - 1)) // 12 + 3
    w: list = [None] * nb
    for s, d in enumerate(diags):
        u0, rest = wide._bal12(d)
        u1, u2 = wide._bal12(rest)
        t12, r = divmod(8 * s, 12)
        for i, u in enumerate((u0, u1, u2)):
            v = u << r
            b = t12 + i
            w[b] = v if w[b] is None else w[b] + v
    zero = jnp.zeros((), jnp.int32)
    w = [zero if v is None else v for v in w]
    P = t.nplanes
    out = list(w[:P])
    for s in range(P, nb):
        u, v = wide._bal12(w[s])
        fs = t.fold[:, s - 5, :]
        fs1 = t.fold[:, s - 4, :]
        out = [out[k] + u * wide._col(fs[:, k]) + v * wide._col(fs1[:, k])
               for k in range(P)]
    # full fold_excess (not just carry): callers feed these planes into
    # _mul_planes / planes_to_pair, whose bounds need a small last plane
    return wide.fold_excess(out, t)


def _transform(x: jnp.ndarray, tabs: WideNTTTables, fwd: bool) -> jnp.ndarray:
    """x: int32 [..., 2, L, N] centered pairs -> same, transformed."""
    x = jnp.asarray(x, dtype=jnp.int32)  # numpy inputs misbehave under
    *lead, two, L, N = x.shape           # mixed numpy/jnp scalar promotion
    R, C = tabs.rows, tabs.cols
    t = tabs.wt
    nl = len(lead)

    def to_matrix(lo_hi, M, K):
        """[lead.., L, M*K] pair halves -> digits [D, L, lead.., M, K]."""
        lo, hi = lo_hi
        d = _pair_digits7(lo.reshape(lo.shape[:-1] + (M, K)),
                          hi.reshape(hi.shape[:-1] + (M, K)), t.shift)
        return jnp.moveaxis(d, nl + 1, 1)    # [D, L, lead.., M, K]

    def swap_mk(lo_hi, M, K):
        """[lead.., L, M*K] -> [lead.., L, K*M] (per-element transpose)."""
        return tuple(
            jnp.swapaxes(v.reshape(v.shape[:-1] + (M, K)), -1, -2)
            .reshape(v.shape) for v in lo_hi)

    # entry: [..., 2, L, N] -> pair halves in elementwise layout [lead.., L, N]
    lo, hi = x[..., 0, :, :], x[..., 1, :, :]

    if fwd:
        # stage 1: Xt [C, R] contract R against A^T
        xt = swap_mk((lo, hi), R, C)                         # [.., L, C*R]
        dig = to_matrix(xt, C, R)
        p = _diags_to_planes(_matmul7(dig, tabs.a7), t)
        p = wide.fold_excess(
            wide._mul_planes(p, [tabs.tw[k] for k in range(t.nplanes)], t), t)
        w = wide.planes_to_pair(p, t)                        # [.., L, C*R']
        w2 = swap_mk(w, C, R)                                # [.., L, R'*C]
        dig2 = to_matrix(w2, R, C)
        p2 = _diags_to_planes(_matmul7(dig2, tabs.b7), t)
        out_lo, out_hi = wide.planes_to_pair(p2, t)          # [.., L, R'*C']
    else:
        dig = to_matrix((lo, hi), R, C)                      # contract C
        p = _diags_to_planes(_matmul7(dig, tabs.b7i), t)
        p = wide.fold_excess(
            wide._mul_planes(p, [tabs.twi[k] for k in range(t.nplanes)], t), t)
        u = wide.planes_to_pair(p, t)                        # [.., L, R*C']
        ut = swap_mk(u, R, C)                                # [.., L, C'*R]
        dig2 = to_matrix(ut, C, R)
        p2 = _diags_to_planes(_matmul7(dig2, tabs.a7i), t)
        v = wide.planes_to_pair(p2, t)                       # [.., L, C'*R']
        out_lo, out_hi = swap_mk(v, C, R)                    # [.., L, R'*C']

    return jnp.stack([out_lo, out_hi], axis=-3).astype(jnp.int32)


def ntt_fwd(x: jnp.ndarray, tabs: WideNTTTables) -> jnp.ndarray:
    return _transform(x, tabs, fwd=True)


def ntt_bwd(x: jnp.ndarray, tabs: WideNTTTables) -> jnp.ndarray:
    return _transform(x, tabs, fwd=False)
