"""Factorized 3N-ring NTT: O(N^1.5) four-step MXU form for Z[X]/(X^N - X^{N/2} + 1).

The fork's Matrix ring (ring/ntt_3n.go, N = 2^a 3^b) evaluates a degree-N
polynomial at the N primitive 3N-th roots of unity (the totatives E of 3N,
sorted ascending — ring/ntt_3n.go:234-243).  The dense evaluation-matrix
form (ops/rings.py:_gen_3n_matrices) is O(N^2) per transform and O(N^3)
host-side setup, capping the ring at N <= 384; this module derives the
transform instead of tabulating it:

1. **Cyclotomic split.**  X^N - X^{N/2} + 1 = (X^M - z)(X^M - z^5) mod q
   with M = N/2 and z = omega^M a primitive 6th root of unity (omega the
   primitive 3N-th root).  Folding x into the two branches costs one
   scalar multiply + add per coefficient.

2. **Twist.**  The branch-1 roots are omega * omega_M^m (omega^M = z), the
   branch-2 roots omega^{-1} * omega_M^m (omega_M = omega^6, order M), so
   multiplying branch coefficients by omega^{+-i} turns each branch into a
   plain size-M cyclic DFT.

3. **Four-step DFT_M.**  M = R * C (R, C ~ sqrt(M), both 2^i 3^j):
   reshape [R(j1), C(j0)], DFT_R as an [R, R] Montgomery mod-matmul,
   twiddle omega_M^{k1 j0}, DFT_C as a [C, C] mod-matmul, transpose —
   every heavy step is an MXU matmul (u64-emulated Montgomery like
   ops/rings.py's dense path, exact).

4. **Order.**  The k-th reference point omega^{E_k} lands in branch
   E_k mod 6 (1 -> branch 1, 5 -> branch 2) at slot m = (E_k -+ 1)/6 —
   closed form, no discrete logs; a host-precomputed permutation restores
   the reference's E-sorted output order, so the factorized transform is
   bit-identical to the dense matrix form (tests/test_ntt3n_fact.py).

The inverse runs the exact inverse of each step (IDFT via inverse
matrices with 1/M folded in, untwist, 2x2 CRT solve with
(z - z^5)^{-1}).  Setup is O(N) host big-int work plus two ~sqrt(M)-sized
matrix tabulations, so degrees 1536/3072/6144 are practical.
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from matrix_fhe_tpu.ops import modmath as mm


def split_rc(m: int) -> tuple[int, int]:
    """M = R * C with R <= C both of the form 2^i 3^j, R maximal <= sqrt."""
    best = (1, m)
    r = 1
    while r * r <= m:
        if m % r == 0:
            best = (r, m // r)
        # next 3-smooth candidate
        r += 1
        while r * r <= m and m % r:
            r += 1
    return best


def _mont(v: int, q: int) -> int:
    return (v << 64) % q


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["z_pow", "tw1", "tw2", "wr", "wc", "twid", "wri", "wci",
                 "twidi", "untw1", "untw2", "inv_diff", "perm", "iperm"],
    meta_fields=["n", "rows", "cols"],
)
@dataclasses.dataclass(frozen=True)
class NTT3NTables:
    """Per-limb factorized-transform constants (all Montgomery form)."""
    n: int
    rows: int           # R
    cols: int           # C (R * C = N/2)
    z_pow: jnp.ndarray  # u64 [L, 2]   MForm(z), MForm(z^5)
    tw1: jnp.ndarray    # u64 [L, M]   MForm(omega^i)
    tw2: jnp.ndarray    # u64 [L, M]   MForm(omega^-i)
    wr: jnp.ndarray     # u64 [L, R, R]  DFT_R matrix (omega_M^C powers)
    wc: jnp.ndarray     # u64 [L, C, C]  DFT_C matrix (omega_M^R powers)
    twid: jnp.ndarray   # u64 [L, R, C]  omega_M^{k1 j0}
    wri: jnp.ndarray    # u64 [L, R, R]  inverse DFT_R (1/M folded in)
    wci: jnp.ndarray    # u64 [L, C, C]  inverse DFT_C
    twidi: jnp.ndarray  # u64 [L, R, C]  omega_M^{-k1 j0}
    untw1: jnp.ndarray  # u64 [L, M]   MForm(omega^-i)
    untw2: jnp.ndarray  # u64 [L, M]   MForm(omega^i)
    inv_diff: jnp.ndarray  # u64 [L]   MForm((z - z^5)^-1)
    perm: jnp.ndarray   # int32 [N]    (branch, slot) -> E-sorted position
    iperm: jnp.ndarray  # int32 [N]    E-sorted -> (branch, slot)


def build_tables(n: int, moduli, omegas) -> NTT3NTables:
    """``omegas[l]`` is the primitive 3N-th root used by the dense path for
    modulus ``moduli[l]`` (rings._gen_subring_tables)."""
    three_n = 3 * n
    m = n // 2
    R, C = split_rc(m)
    if R < 2:
        raise ValueError(f"N={n}: M={m} has no nontrivial R*C split")

    E = [e for e in range(1, three_n) if math.gcd(e, three_n) == 1]
    assert len(E) == n
    # output position of (branch b, slot mm): branch points are
    # omega^{1 + 6 mm} (b=0) / omega^{-1 + 6 mm} (b=1); E is sorted so the
    # position is the index of that exponent in E.
    pos = {e: k for k, e in enumerate(E)}
    perm = np.zeros(n, dtype=np.int32)
    iperm = np.zeros(n, dtype=np.int32)
    for mm_ in range(m):
        e1 = (1 + 6 * mm_) % three_n
        e2 = (-1 + 6 * mm_) % three_n
        perm[mm_] = pos[e1]
        perm[m + mm_] = pos[e2]
    iperm[perm] = np.arange(n, dtype=np.int32)

    z_pow, tw1, tw2, wr, wc, twid = [], [], [], [], [], []
    wri, wci, twidi, untw1, untw2, inv_diff = [], [], [], [], [], []
    for q, omega in zip(moduli, omegas):
        q = int(q)
        omega = int(omega)
        assert pow(omega, three_n, q) == 1 and pow(omega, three_n // 2, q) != 1
        z = pow(omega, m, q)                 # primitive 6th root
        w_m = pow(omega, 6, q)               # order M
        w_r = pow(w_m, C, q)                 # order R
        w_c = pow(w_m, R, q)                 # order C
        oinv = pow(omega, q - 2, q)
        minv = pow(m, q - 2, q)

        z_pow.append([_mont(z, q), _mont(pow(z, 5, q), q)])
        tw1.append([_mont(pow(omega, i, q), q) for i in range(m)])
        tw2.append([_mont(pow(oinv, i, q), q) for i in range(m)])
        untw1.append([_mont(pow(oinv, i, q), q) for i in range(m)])
        untw2.append([_mont(pow(omega, i, q), q) for i in range(m)])
        wr.append([[_mont(pow(w_r, (k * j) % R, q), q) for j in range(R)]
                   for k in range(R)])
        wc.append([[_mont(pow(w_c, (k * j) % C, q), q) for j in range(C)]
                   for k in range(C)])
        twid.append([[_mont(pow(w_m, k * j, q), q)
                      for j in range(C)] for k in range(R)])
        w_ri = pow(w_r, q - 2, q)
        w_ci = pow(w_c, q - 2, q)
        w_mi = pow(w_m, q - 2, q)
        # 1/M folded into the R-side inverse matrix
        wri.append([[_mont(minv * pow(w_ri, (k * j) % R, q) % q, q)
                     for j in range(R)] for k in range(R)])
        wci.append([[_mont(pow(w_ci, (k * j) % C, q), q) for j in range(C)]
                    for k in range(C)])
        twidi.append([[_mont(pow(w_mi, k * j, q), q)
                       for j in range(C)] for k in range(R)])
        d = (z - pow(z, 5, q)) % q
        inv_diff.append(_mont(pow(d, q - 2, q), q))

    u64 = lambda a: jnp.asarray(np.array(a, dtype=np.uint64))
    return NTT3NTables(
        n=n, rows=R, cols=C,
        z_pow=u64(z_pow), tw1=u64(tw1), tw2=u64(tw2),
        wr=u64(wr), wc=u64(wc), twid=u64(twid),
        wri=u64(wri), wci=u64(wci), twidi=u64(twidi),
        untw1=u64(untw1), untw2=u64(untw2), inv_diff=u64(inv_diff),
        perm=jnp.asarray(perm), iperm=jnp.asarray(iperm))


# ---------------------------------------------------------------------------
# Device-side stages (u64 Montgomery, exact; layouts [.., L, X]).
# ---------------------------------------------------------------------------

def _matmul_mod(x, w, q, qinv, bhi):
    """x [.., L, A, B] contracted against w [L, K, A] -> [.., L, K, B]:
    out[k, b] = sum_a w[k, a] * x[a, b], exact Montgomery mod-matmul."""
    prod = mm.mred(x[..., None, :, :], w[..., :, :, None],
                   q[:, None, None, None], qinv[:, None, None, None])
    return mm.modsum(prod, q[:, None, None], bhi[:, None, None], axis=-2)


def _contract_last(a, w, q, qinv, bhi):
    """out[.., i, o] = sum_j w[o, j] * a[.., i, j] (w [L, O, J])."""
    prod = mm.mred(a[..., :, None, :], w[..., None, :, :],
                   q[:, None, None, None], qinv[:, None, None, None])
    return mm.modsum(prod, q[:, None, None], bhi[:, None, None], axis=-1)


def _dft_m(y, t: NTT3NTables, q, qinv, bhi):
    """Size-M cyclic DFT of y [.., L, M] (four-step), output order
    k = k1 + R k2: X[k] = sum_j y[j] omega_M^{kj} with j = j1 C + j0."""
    R, C = t.rows, t.cols
    y = y.reshape(y.shape[:-1] + (R, C))          # [.., L, j1, j0]
    a = _matmul_mod(y, t.wr, q, qinv, bhi)        # [.., L, k1, j0]
    a = mm.mred(a, t.twid, q[:, None, None], qinv[:, None, None])
    z = _contract_last(a, t.wc, q, qinv, bhi)     # [.., L, k1, k2]
    # k = k1 + R k2 -> flatten as [k2, k1]
    z = jnp.swapaxes(z, -1, -2)
    return z.reshape(z.shape[:-2] + (R * C,))


def _idft_m(y, t: NTT3NTables, q, qinv, bhi):
    """Exact inverse of _dft_m (consumes the k1 + R k2 order, emits
    j = j1 C + j0): x[j1, j0] = (1/M) sum_{k1} omega_R^{-k1 j1}
    omega_M^{-k1 j0} sum_{k2} X[k1, k2] omega_C^{-k2 j0}."""
    R, C = t.rows, t.cols
    y = y.reshape(y.shape[:-1] + (C, R))          # [.., L, k2, k1]
    y = jnp.swapaxes(y, -1, -2)                   # [.., L, k1, k2]
    a = _contract_last(y, t.wci, q, qinv, bhi)    # [.., L, k1, j0]
    a = mm.mred(a, t.twidi, q[:, None, None], qinv[:, None, None])
    z = _matmul_mod(a, t.wri, q, qinv, bhi)       # [.., L, j1, j0] (has 1/M)
    return z.reshape(z.shape[:-2] + (R * C,))


def ntt_fwd(x, t: NTT3NTables, q, qinv, bhi):
    """x [.., L, N] coefficients -> evaluations at the E-sorted primitive
    3N-th roots (bit-identical to the dense matrix path)."""
    n = t.n
    half = n // 2
    lo, hi = x[..., :half], x[..., half:]
    qq = q[:, None]
    qi = qinv[:, None]
    # fold: u = lo + z hi ; w = lo + z^5 hi
    u = mm.cred(lo + mm.mred(hi, t.z_pow[:, 0:1], qq, qi), qq)
    w = mm.cred(lo + mm.mred(hi, t.z_pow[:, 1:2], qq, qi), qq)
    # twist to cyclic
    u = mm.mred(u, t.tw1, qq, qi)
    w = mm.mred(w, t.tw2, qq, qi)
    fu = _dft_m(u, t, q, qinv, bhi)
    fw = _dft_m(w, t, q, qinv, bhi)
    both = jnp.concatenate([fu, fw], axis=-1)     # [(branch, slot)]
    out = jnp.zeros_like(both)
    return out.at[..., t.perm].set(both)


def ntt_bwd(x, t: NTT3NTables, q, qinv, bhi):
    """Exact inverse of ntt_fwd."""
    n = t.n
    half = n // 2
    qq = q[:, None]
    qi = qinv[:, None]
    both = x[..., t.perm]
    fu, fw = both[..., :half], both[..., half:]
    u = mm.mred(_idft_m(fu, t, q, qinv, bhi), t.untw1, qq, qi)
    w = mm.mred(_idft_m(fw, t, q, qinv, bhi), t.untw2, qq, qi)
    # CRT solve: hi = (u - w) / (z - z^5); lo = u - z hi
    hi = mm.mred(mm.cred(u + qq - w, qq), t.inv_diff[:, None], qq, qi)
    lo = mm.cred(u + qq - mm.mred(hi, t.z_pow[:, 0:1], qq, qi), qq)
    return jnp.concatenate([lo, hi], axis=-1)
