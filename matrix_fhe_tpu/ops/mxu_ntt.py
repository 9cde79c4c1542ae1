"""MXU-form NTT: the negacyclic NTT as two matrix multiplications.

This is the TPU-native fast path for the power-of-two NTT (the headline
kernel, BASELINE.json).  It replaces the reference's scalar butterfly loops
(ring/ntt.go:223-606) with a four-step factorization that puts all FLOPs on
the systolic array:

    X = reshape(x, [R, C])                      (N = R*C, R = 2^a, C = 2^b)
    OUT[ihi, ilo] = sum_{j0} B[ilo, j0] * T[ihi, j0] * (A @ X)[ihi, j0]
    i.e.  out = (T .* (A @ X)) @ B^T

with (psi the 2N-th root used by the reference's tables):
    A[ihi, j1] = psi^(C * (2 brv_a(ihi) + 1) * j1)      (R x R)
    T[ihi, j0] = psi^((2 brv_a(ihi) + 1) * j0)          (R x C)
    B[ilo, j0] = psi^(2R * brv_b(ilo) * j0)             (C x C)

This reproduces the reference NTT's exact output ordering (bit-reversed CT
order, out[i] = poly(psi^{2 brv(i)+1})), so fully-reduced outputs are
bit-identical to ring/ntt.go for the same prime and primitive root.

Integer-exact execution on the MXU/VPU:
  * moduli are kept < 2^22 ("w22" fast-path primes; the ct-mult noise budget
    is built from more, smaller limbs);
  * operands are centered and split into 3 balanced signed 8-bit digits; the
    two matmuls run as 9 int8 x int8 -> int32 contractions (exact);
  * digit-diagonal recombination and the twiddle product run in float32 with
    Dekker two-products (exact: every intermediate is an integer < 2^24 or an
    exact Sterbenz difference) — no 64-bit arithmetic anywhere.

The same machinery powers the INTT with A^{-1}, B^{-T}, T^{-1} (the N^{-1}
scaling folded into A^{-1}).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from matrix_fhe_tpu.ops.rings import bit_reverse
from matrix_fhe_tpu.utils import primes as pr

MAX_W22_MODULUS = 1 << 22
# The digit/Dekker machinery is exact for any q < 2^23 (centered values
# < 2^22 keep all three balanced digits in int8 and every f32 product below
# 2^46); find_w22_primes stays conservative, but build_tables accepts the
# full range so the fast path (fast/fring.py) can share one prime pool with
# the fused Pallas kernel (ops/pallas_ntt2.py, same 2^23 bound).
MAX_NTT_MODULUS = 1 << 23


def find_w22_primes(n: int, count: int) -> list[int]:
    """NTT-friendly primes < 2^22 for ring degree n (largest first), pooled
    across bit sizes 22 (downstream only) then 21, 20, ... (alternating)."""
    out: list[int] = []
    for bits in (22, 21, 20, 19, 18):
        g = pr.NTTFriendlyPrimesGenerator(bits, 2 * n)
        try:
            while len(out) < count:
                p = (g.next_downstream_prime() if bits == 22
                     else g.next_alternating_prime())
                if p < MAX_W22_MODULUS and p not in out:
                    out.append(p)
        except ValueError:
            continue
        if len(out) >= count:
            return out
    raise ValueError(f"could not find {count} w22 primes for n={n}")


# ---------------------------------------------------------------------------
# Host-side table generation (exact Python ints).
# ---------------------------------------------------------------------------

def _digits3_centered(v: int, q: int) -> tuple[int, int, int]:
    """Balanced base-256 digits of the centered representative of v mod q."""
    c = v if v <= q // 2 else v - q
    d0 = ((c + 128) & 255) - 128
    c = (c - d0) >> 8
    d1 = ((c + 128) & 255) - 128
    c = (c - d1) >> 8
    assert -128 <= c <= 127, "modulus too large for 3 balanced digits"
    return d0, d1, c


def _digit_planes(mat, q: int) -> np.ndarray:
    """[r, c] int matrix (list-of-lists or ndarray) mod q -> [3, r, c] int8
    balanced digit planes (vectorized in numpy int64)."""
    m = np.asarray(mat, dtype=np.int64)
    c = np.where(m > q // 2, m - q, m)
    d0 = ((c + 128) & 255) - 128
    c = (c - d0) >> 8
    d1 = ((c + 128) & 255) - 128
    d2 = (c - d1) >> 8
    assert np.all((d2 >= -128) & (d2 <= 127)), "modulus too large for 3 digits"
    return np.stack([d0, d1, d2]).astype(np.int8)


def four_step_factors(n: int, q: int, psi: int):
    """Closed-form four-step NTT factors for modulus q and 2N-th root psi.

    Returns (A, T, B, Ainv, Binv, Tinv) as int64 numpy arrays with the exact
    layouts documented in the module docstring.  The inverses are analytic
    (negacyclic/cyclic DFT inversion formulas) — A⁻¹[j₁,i] = R⁻¹·ψ^(−C·e_i·j₁)
    and B⁻¹[j₀,i] = C⁻¹·ψ^(−2R·brv(i)·j₀) — so no Gaussian elimination is
    needed; N⁻¹ = R⁻¹·C⁻¹ is split across the two inverse factors.  All
    matrices are gathers from one ψ-power table (2N Python-int mults total).
    """
    logn = n.bit_length() - 1
    a_bits = logn // 2
    b_bits = logn - a_bits
    R, C = 1 << a_bits, 1 << b_bits
    two_n = 2 * n

    pows = np.empty(two_n, dtype=np.int64)
    v = 1
    for k in range(two_n):
        pows[k] = v
        v = v * psi % q

    e_hi = np.array([2 * bit_reverse(i, a_bits) + 1 for i in range(R)],
                    dtype=np.int64)
    brv_c = np.array([bit_reverse(i, b_bits) for i in range(C)],
                     dtype=np.int64)
    j1 = np.arange(R, dtype=np.int64)
    j0 = np.arange(C, dtype=np.int64)
    rinv = pow(R, q - 2, q)
    cinv = pow(C, q - 2, q)

    A = pows[(C * e_hi[:, None] * j1[None]) % two_n]
    T = pows[(e_hi[:, None] * j0[None]) % two_n]
    B = pows[(2 * R * brv_c[:, None] * j0[None]) % two_n]
    # N^{-1} folding must run in object space: psi-power * rinv overflows
    # int64 for wide (>32-bit) moduli
    Ainv = (pows[(-C * j1[:, None] * e_hi[None]) % two_n].astype(object)
            * rinv % q).astype(np.int64)
    Binv = (pows[(-2 * R * j0[:, None] * brv_c[None]) % two_n].astype(object)
            * cinv % q).astype(np.int64)
    Tinv = pows[(-e_hi[:, None] * j0[None]) % two_n]
    return A, T, B, Ainv, Binv, Tinv


def _inv_mat(m: list[list[int]], q: int) -> list[list[int]]:
    n = len(m)
    A = [row[:] + [1 if i == j else 0 for j in range(n)] for i, row in enumerate(m)]
    for col in range(n):
        piv = next(r for r in range(col, n) if A[r][col] % q)
        A[col], A[piv] = A[piv], A[col]
        inv = pow(A[col][col], q - 2, q)
        A[col] = [v * inv % q for v in A[col]]
        for r in range(n):
            if r != col and A[r][col] % q:
                f = A[r][col]
                A[r] = [(x - f * y) % q for x, y in zip(A[r], A[col])]
    return [row[n:] for row in A]


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["a_dig", "bt_dig", "tw", "ai_dig", "bti_dig", "twi",
                 "moduli_f", "qinv_f", "ck_f"],
    meta_fields=["n", "rows", "cols"],
)
@dataclasses.dataclass(frozen=True)
class MxuNTTTables:
    """Per-RNS-limb four-step tables (stacked over the limb axis L)."""
    n: int
    rows: int
    cols: int
    a_dig: jnp.ndarray    # int8 [L, 3, R, R]   A digit planes
    bt_dig: jnp.ndarray   # int8 [L, 3, C, C]   B^T digit planes
    tw: jnp.ndarray       # f32  [L, R, C]      forward twiddles (plain)
    ai_dig: jnp.ndarray   # int8 [L, 3, R, R]   A^{-1} (with N^{-1} folded)
    bti_dig: jnp.ndarray  # int8 [L, 3, C, C]   B^{-T}
    twi: jnp.ndarray      # f32  [L, R, C]      inverse twiddles
    moduli_f: jnp.ndarray  # f32 [L]
    qinv_f: jnp.ndarray    # f32 [L]  1/q
    ck_f: jnp.ndarray      # f32 [L, 5]  centered 2^{8k} mod q


def build_tables(n: int, moduli: list[int]) -> MxuNTTTables:
    logn = n.bit_length() - 1
    a_bits = logn // 2
    b_bits = logn - a_bits
    R, C = 1 << a_bits, 1 << b_bits

    a_dig, bt_dig, tw = [], [], []
    ai_dig, bti_dig, twi = [], [], []
    cks = []
    for q in moduli:
        if q >= MAX_NTT_MODULUS:
            raise ValueError(f"modulus {q} too large for the MXU digit path")
        g, _ = pr.primitive_root(q)
        psi = pow(g, (q - 1) // (2 * n), q)
        A, T, B, Ainv, Binv, Tinv = four_step_factors(n, q, psi)

        # Layouts chosen so every contraction is (input last axis) x (matrix
        # first axis) with the limb axis as the dot_general batch dim:
        #   fwd step 1: Xt[.., C, R] @ A^T[R, R']      -> Yt[.., C, R']
        #   fwd step 2: W[.., C, R] -> (contract C) via W^T path, see _transform
        a_dig.append(_digit_planes(np.array(A, dtype=object).T, q))    # A^T [j1, ihi]
        bt_dig.append(_digit_planes(np.array(B, dtype=object).T, q))   # B^T [j0, ilo]
        ai_dig.append(_digit_planes(np.array(Ainv, dtype=object).T, q))   # Ainv^T [ihi, j1]
        bti_dig.append(_digit_planes(np.array(Binv, dtype=object).T, q))  # Binv^T [ilo, j0]

        def center(v):
            return v - q if v > q // 2 else v

        # forward twiddle applied on the [C, R] (transposed) layout
        tw.append(np.array([[center(t) for t in row] for row in T],
                           dtype=np.float32).T.copy())
        # inverse twiddle applied on the [R, C] layout
        twi.append(np.array([[center(t) for t in row] for row in Tinv],
                            dtype=np.float32))
        cks.append([center(pow(256, k, q)) for k in range(5)])

    return MxuNTTTables(
        n=n, rows=R, cols=C,
        a_dig=jnp.asarray(np.stack(a_dig)),
        bt_dig=jnp.asarray(np.stack(bt_dig)),
        tw=jnp.asarray(np.stack(tw)),
        ai_dig=jnp.asarray(np.stack(ai_dig)),
        bti_dig=jnp.asarray(np.stack(bti_dig)),
        twi=jnp.asarray(np.stack(twi)),
        moduli_f=jnp.asarray(np.array(moduli, dtype=np.float32)),
        qinv_f=jnp.asarray(1.0 / np.array(moduli, dtype=np.float32)),
        ck_f=jnp.asarray(np.array(cks, dtype=np.float32)),
    )


# ---------------------------------------------------------------------------
# Exact float32 helpers (Dekker arithmetic; every result is an exact integer).
# ---------------------------------------------------------------------------

_SPLIT = jnp.float32(4097.0)  # 2^12 + 1 (Veltkamp split for f32)


def _two_prod(a: jnp.ndarray, b: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(hi, lo) with hi + lo == a*b exactly (|a*b| < 2^48, f32)."""
    p = a * b
    ah = a * _SPLIT
    ah = ah - (ah - a)
    al = a - ah
    bh = b * _SPLIT
    bh = bh - (bh - b)
    bl = b - bh
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def _reduce_exact(p: jnp.ndarray, e: jnp.ndarray, q: jnp.ndarray,
                  qinv: jnp.ndarray) -> jnp.ndarray:
    """Exact (p + e) mod-q representative in (-q, q), where p + e is an exact
    integer with |p+e| < 2^46 and |e| <= ulp(p)."""
    m = jnp.rint(p * qinv)
    mh, ml = _two_prod(m, q)
    r = ((p - mh) + e) - ml  # exact: Sterbenz + integers < 2^24
    # second pass: |r| can still be a few q
    m2 = jnp.rint(r * qinv)
    return r - m2 * q  # m2 small => product exact


def _mulmod_f32(a: jnp.ndarray, b: jnp.ndarray, q: jnp.ndarray,
                qinv: jnp.ndarray) -> jnp.ndarray:
    """Exact a*b mod q in (-q, q) for |a|, |b| <= 2^23-ish."""
    p, e = _two_prod(a, b)
    return _reduce_exact(p, e, q, qinv)


def _to_digits(v: jnp.ndarray) -> jnp.ndarray:
    """Centered value |v| < 2^22 -> [3, ...] int8 balanced base-256 digits."""
    inv256 = jnp.float32(1.0 / 256.0)
    t0 = jnp.floor(v * inv256 + 0.5)
    d0 = v - t0 * 256.0
    t1 = jnp.floor(t0 * inv256 + 0.5)
    d1 = t0 - t1 * 256.0
    return jnp.stack([d0, d1, t1]).astype(jnp.int8)


def _recombine(diags: list[jnp.ndarray], ck: jnp.ndarray, q: jnp.ndarray,
               qinv: jnp.ndarray) -> jnp.ndarray:
    """sum_k D_k * ck[:, k] mod q, exact, D_k |.| < 2^24 (exact f32);
    ck: [L, 5, 1, ...] broadcastable against the diagonals."""
    rs = []
    for k, d in enumerate(diags):
        p, e = _two_prod(d, ck[:, k])
        rs.append(_reduce_exact(p, e, q, qinv))
    # |r_k| < q <= 2^22: fold in pairs with intermediate exact reductions
    s = rs[0] + rs[1] + rs[2]          # |s| < 3q < 2^24: exact
    m = jnp.rint(s * qinv)
    s = s - m * q                       # m small: exact
    s = s + rs[3] + rs[4]
    m = jnp.rint(s * qinv)
    return s - m * q


def _matmul_digits(x_dig: jnp.ndarray, w_dig: jnp.ndarray) -> list[jnp.ndarray]:
    """Digit-pair contractions -> 5 digit-diagonal sums as exact f32.

    x_dig: [3, L, ..., M, K] (limb axis second); w_dig: [L, 3, K, K'].

    All 9 digit pairs are evaluated with ONE large int8 matmul per limb —
    data digits folded into rows, matrix digit planes side-by-side in columns
    ([3*M', K] @ [K, 3*K']) — which keeps the MXU at high utilization (a
    batched per-limb dot_general with small per-batch shapes runs ~100x
    slower).  Python-level loop over the (static, small) limb count.
    """
    three, L = x_dig.shape[0], x_dig.shape[1]
    lead = x_dig.shape[2:-2]
    M, K = x_dig.shape[-2], x_dig.shape[-1]
    Kp = w_dig.shape[-1]
    # [3, L, lead.., M, K] -> per-limb lhs [(3 * prod(lead) * M), K]
    per_limb = []
    for l in range(L):
        lhs = x_dig[:, l].reshape(-1, K)
        rhs = jnp.swapaxes(w_dig[l], 0, 1).reshape(K, 3 * Kp)  # [K, 3K']
        p = jax.lax.dot_general(
            lhs, rhs, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        per_limb.append(p.reshape((3,) + lead + (M, 3, Kp)))
    # stack limbs back: [3, L, lead.., M, 3, K']
    prod = jnp.stack(per_limb, axis=1)
    diags: list = [None] * 5
    for i in range(3):
        for j in range(3):
            k = i + j
            d = prod[i, ..., j, :]
            diags[k] = d if diags[k] is None else diags[k] + d
    return [d.astype(jnp.float32) for d in diags]


def ntt_fwd(x: jnp.ndarray, tabs: MxuNTTTables) -> jnp.ndarray:
    """Forward NTT, bit-exact to the reference ordering.

    x: int32/uint32 [..., L, N] with values in [0, q); returns same.
    """
    return _transform(x, tabs, fwd=True)


def ntt_bwd(x: jnp.ndarray, tabs: MxuNTTTables) -> jnp.ndarray:
    return _transform(x, tabs, fwd=False)


def _transform(x: jnp.ndarray, tabs: MxuNTTTables, fwd: bool) -> jnp.ndarray:
    *lead, L, N = x.shape
    R, C = tabs.rows, tabs.cols
    nlead = len(lead)
    # internal layout: limb axis first -> [L, lead..., R, C]
    xm = jnp.moveaxis(x.reshape(*lead, L, R, C), nlead, 0)

    def bc(v):  # broadcast [L] or [L, k] constants over [L, lead..., a, b]
        return v.reshape(v.shape[:1] + (1,) * (nlead + 2) + v.shape[1:])

    q = bc(tabs.moduli_f)
    qinv = bc(tabs.qinv_f)
    ck = jnp.moveaxis(bc(tabs.ck_f), -1, 1)  # [L, 5, 1...]

    def recombine(diags):
        return _recombine(diags, ck, q, qinv)

    xf = xm.astype(jnp.float32)
    xc = jnp.where(xf > q * 0.5, xf - q, xf)  # center

    if fwd:
        # Yt[.., C, R'] = Xt[.., C, R] @ A^T ; W = tw .* Yt ;
        # OUT[.., R', C'] = (W viewed [.., R, C] after swap) @ B^T
        xt = jnp.swapaxes(xc, -1, -2)                       # [L, .., C, R]
        d = _to_digits(xt)
        y = recombine(_matmul_digits(d, tabs.a_dig))        # [L, .., C, R']
        y = _mulmod_f32(y, bc2(tabs.tw, nlead), q, qinv)    # twiddle (C, R) layout
        w = jnp.swapaxes(y, -1, -2)                         # [L, .., R', C]
        d = _to_digits(w)
        out = recombine(_matmul_digits(d, tabs.bt_dig))     # [L, .., R', C']
    else:
        # V[.., R, C'] = OUT[.., R, C] @ Binv^T ; W = twi .* V ;
        # X[.., C', R'] = (W^T) @ Ainv^T, then swap back to [R', C']
        d = _to_digits(xc)
        v = recombine(_matmul_digits(d, tabs.bti_dig))      # [L, .., R, C']
        v = _mulmod_f32(v, bc2(tabs.twi, nlead), q, qinv)
        vt = jnp.swapaxes(v, -1, -2)                        # [L, .., C', R]
        d = _to_digits(vt)
        out = recombine(_matmul_digits(d, tabs.ai_dig))     # [L, .., C', R']
        out = jnp.swapaxes(out, -1, -2)                     # [L, .., R', C']

    out = jnp.where(out < 0, out + q, out)
    out = jnp.moveaxis(out, 0, nlead).reshape(*lead, L, N)
    return out.astype(x.dtype)


def bc2(t: jnp.ndarray, nlead: int) -> jnp.ndarray:
    """Broadcast a [L, a, b] table over [L, lead..., a, b]."""
    return t.reshape(t.shape[:1] + (1,) * nlead + t.shape[1:])
