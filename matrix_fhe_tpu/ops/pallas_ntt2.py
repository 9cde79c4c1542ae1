"""Pallas NTT v2: bitcast digit planes + int32 Shoup reductions.

Second-generation fused four-step MXU NTT (same math and output ordering as
``ops/pallas_ntt.py`` / the reference's ring/ntt.go tables, bit-exact), with
three structural changes that roughly double throughput:

1. **Digit extraction by bitcast** — instead of a float floor-chain, the
   int32 coefficients are biased (+0x808080) and XORed (^0x808080) so the raw
   little-endian bytes, read as signed int8, ARE the balanced base-256 digits
   (``signed(byte ^ 0x80) = byte_value - 128`` exactly).  ``pltpu.bitcast``
   exposes them plane-blocked along lanes: int32 [M, K] -> int8 [M, 4K] with
   column block b holding digit plane b.  Two integer ops per coefficient.

2. **Digit weights folded into the matmul tables** — the rhs rows are indexed
   by (digit plane b, column j) and hold the int8 digit planes of
   ``2^{8b} * M[j, :] mod q``.  One [M, 3K] @ [3K, 3K'] int8 matmul computes
   all digit cross-products; the output has only THREE column blocks
   (weights 1, 2^8, 2^16) instead of five digit-pair diagonals.

3. **Int32 single-rint reductions (no Dekker)** — recombination is a 3-term
   Horner ``t = reduce(t*256 + mm_p)`` where ``reduce(v) = v - rint(f32(v) *
   (1/q)) * q`` with the multiply-subtract in *wrapping* int32 (exact mod
   2^32; the true remainder is < 1.5q so the wrapped value is the true
   value).  The twiddle multiply is a Shoup-style
   ``w = y*T - rint(f32(y) * T/q) * q`` in wrapping int32: 7 ops.

Bounds (all proven in comments inline) require **q < 2^23**; use
``find_v2_primes``.  Values between ops are kept in (-0.51q, 0.51q) by cheap
"tighten" reductions (inputs < 2^24 are f32-exact, so a second single-rint
reduce is a true nearest-multiple subtraction); outputs are canonicalized to
[0, q).  Requires R, C >= 128 (log N >= 14); smaller rings use the v1 path.

Reference parity: replaces the scalar butterfly NTT of
/root/reference/ring/ntt.go:174-606 (same psi-power tables as
ring/subring.go:198-211, same bit-reversed output ordering).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from matrix_fhe_tpu.ops.mxu_ntt import four_step_factors
from matrix_fhe_tpu.ops.rings import bit_reverse  # noqa: F401 (re-export)
from matrix_fhe_tpu.utils import primes as pr

MAX_V2_MODULUS = 1 << 23

_BIAS = 0x808080  # 128 * (1 + 256 + 65536): center-to-biased offset
_MAGIC = np.float32(1.5 * 2 ** 23)  # round-to-even magic constant


def find_v2_primes(n: int, count: int) -> list[int]:
    """NTT-friendly primes < 2^23 for ring degree n (largest first)."""
    out: list[int] = []
    for bits in (23, 22, 21, 20, 19):
        g = pr.NTTFriendlyPrimesGenerator(bits, 2 * n)
        try:
            while len(out) < count:
                p = (g.next_downstream_prime() if bits == 23
                     else g.next_alternating_prime())
                if p < MAX_V2_MODULUS and p not in out:
                    out.append(p)
        except ValueError:
            continue
        if len(out) >= count:
            return out
    raise ValueError(f"could not find {count} v2 primes for n={n}")


# ---------------------------------------------------------------------------
# Host-side tables.
# ---------------------------------------------------------------------------

def _digit_planes_cols(mat: np.ndarray, q: int) -> np.ndarray:
    """int64 [r, c] mod q -> int8 [r, 3c]: balanced digit planes of the
    centered representative, stacked along columns."""
    m = np.asarray(mat, dtype=np.int64)
    c = np.where(m > q // 2, m - q, m)
    d0 = ((c + 128) & 255) - 128
    c = (c - d0) >> 8
    d1 = ((c + 128) & 255) - 128
    d2 = (c - d1) >> 8
    assert np.all((d2 >= -128) & (d2 <= 127))
    return np.concatenate([d0, d1, d2], axis=1).astype(np.int8)


def _weighted_rhs(mat_t: np.ndarray, q: int) -> np.ndarray:
    """Build the [3K, 3K'] rhs for ``digits(x) @ rhs``:
    row block b (b = 0..2) holds the digit planes of 2^{8b} * mat_t mod q.

    ``mat_t`` is the [K, K'] matrix whose rows are indexed by the
    contraction (lane) dimension of the data.
    """
    blocks = []
    m = np.asarray(mat_t, dtype=object)
    for b in range(3):
        mb = (m * pow(256, b, q)) % q
        blocks.append(_digit_planes_cols(mb.astype(np.int64), q))
    return np.concatenate(blocks, axis=0)  # [3K, 3K']


def _center_i32(mat, q: int) -> np.ndarray:
    m = np.asarray(mat, dtype=np.int64)
    return np.where(m > q // 2, m - q, m).astype(np.int32)


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["a2", "b2", "tw_i", "tw_f", "a2i", "b2i", "twi_i", "twi_f",
                 "scal"],
    meta_fields=["n", "rows", "cols"],
)
@dataclasses.dataclass(frozen=True)
class NTT2Tables:
    n: int
    rows: int
    cols: int
    a2: jnp.ndarray     # int8 [L, 3R, 3R]   fwd stage-1 rhs (A^T weighted)
    b2: jnp.ndarray     # int8 [L, 3C, 3C]   fwd stage-2 rhs (B^T weighted)
    tw_i: jnp.ndarray   # int32 [L, C, R]    fwd twiddle, centered, [C,R] layout
    tw_f: jnp.ndarray   # f32  [L, C, R]     fwd twiddle / q (Shoup)
    a2i: jnp.ndarray    # int8 [L, 3R, 3R]   inv stage-2 rhs (Ainv^T weighted)
    b2i: jnp.ndarray    # int8 [L, 3C, 3C]   inv stage-1 rhs (Binv^T weighted)
    twi_i: jnp.ndarray  # int32 [L, R, C]    inv twiddle, [R,C] layout
    twi_f: jnp.ndarray  # f32  [L, R, C]
    scal: jnp.ndarray   # f32 [L, 2]: q, 1/q


def build_tables(n: int, moduli: list[int]) -> NTT2Tables:
    logn = n.bit_length() - 1
    a_bits = logn // 2
    b_bits = logn - a_bits
    R, C = 1 << a_bits, 1 << b_bits

    a2, b2, tw_i, tw_f, a2i, b2i, twi_i, twi_f, scal = ([] for _ in range(9))
    for q in moduli:
        if q >= MAX_V2_MODULUS:
            raise ValueError(f"modulus {q} too large for the v2 path")
        g, _ = pr.primitive_root(q)
        psi = pow(g, (q - 1) // (2 * n), q)
        # closed-form factors incl. analytic inverses (N^{-1} split across
        # Ainv and Binv) — no Gaussian elimination
        A, T, B, Ainv, Binv, Tinv = four_step_factors(n, q, psi)

        # forward: Y^T = X^T @ A^T  (lhs rows = j0-ish, contraction j1)
        a2.append(_weighted_rhs(A.T, q))          # rows j1, cols i'
        # forward stage 2: OUT = W @ B^T (contraction j0)
        b2.append(_weighted_rhs(B.T, q))          # rows j0, cols ilo
        # forward twiddle on the transposed [C, R'] intermediate
        tc = _center_i32(T.astype(np.int64), q).T.copy()  # [C, R]
        tw_i.append(tc)
        tw_f.append((tc.astype(np.float64) / q).astype(np.float32))
        # inverse stage 1: V = OUT @ Binv^T (contraction j0' = C lanes)
        b2i.append(_weighted_rhs(Binv.T, q))
        # inverse twiddle on the natural [R, C'] intermediate
        tci = _center_i32(Tinv.astype(np.int64), q)       # [R, C]
        twi_i.append(tci)
        twi_f.append((tci.astype(np.float64) / q).astype(np.float32))
        # inverse stage 2: X^T = W^T @ Ainv^T (contraction j1' = R lanes)
        a2i.append(_weighted_rhs(Ainv.T, q))
        scal.append([float(q), 1.0 / q])

    return NTT2Tables(
        n=n, rows=R, cols=C,
        a2=jnp.asarray(np.stack(a2)), b2=jnp.asarray(np.stack(b2)),
        tw_i=jnp.asarray(np.stack(tw_i)), tw_f=jnp.asarray(np.stack(tw_f)),
        a2i=jnp.asarray(np.stack(a2i)), b2i=jnp.asarray(np.stack(b2i)),
        twi_i=jnp.asarray(np.stack(twi_i)), twi_f=jnp.asarray(np.stack(twi_f)),
        scal=jnp.asarray(np.array(scal, dtype=np.float32)))


# ---------------------------------------------------------------------------
# Kernel helpers (traced inside the Pallas kernel).
# ---------------------------------------------------------------------------

def _rint_i32(a: jnp.ndarray) -> jnp.ndarray:
    """Round-to-nearest-even of f32 |a| < 2^22, returned as int32."""
    m = (a + _MAGIC) - _MAGIC
    return m.astype(jnp.int32)


def _reduce(v: jnp.ndarray, qinv: jnp.ndarray, qi: jnp.ndarray) -> jnp.ndarray:
    """v - round(v/q)*q for int32 |v| < 2^30.7: result in (-1.6q, 1.6q).

    f32(v) rounds (err <= 64), m = rint(f32(v)*qinv) is within 1 of
    round(v/q); m*q - v fits int32 so the wrapping mul/sub is exact."""
    m = _rint_i32(v.astype(jnp.float32) * qinv)
    return v - m * qi


def _tighten(v: jnp.ndarray, qinv: jnp.ndarray, qi: jnp.ndarray) -> jnp.ndarray:
    """(-1.6q, 1.6q) -> (-0.51q, 0.51q): |v| < 2^24 so f32(v) is exact and
    m = rint(v/q) is the true nearest integer (|m| <= 2, m*q exact)."""
    m = _rint_i32(v.astype(jnp.float32) * qinv)
    return v - m * qi


def _digits3(v: jnp.ndarray, K: int) -> jnp.ndarray:
    """Centered int32 [M, K] (|v| < 2^23 - 2^7) -> int8 [M, 3K] balanced
    base-256 digit planes, plane-blocked along lanes (bias + xor + bitcast)."""
    u = (v + jnp.int32(_BIAS)) ^ jnp.int32(_BIAS)
    d = pltpu.bitcast(u, jnp.int8).reshape(v.shape[0], 4 * K)
    return d[:, :3 * K]


def _mm_reduce(dig: jnp.ndarray, rhs: jnp.ndarray, qinv, qi) -> jnp.ndarray:
    """digits [M, 3K] @ rhs [3K, 3K'] -> int32 [M, K'] mod q in
    (-0.51q, 0.51q).

    mm column block p carries weight 2^{8p}; |mm| <= 3K*128^2 < 2^23 for
    K <= 170.  Horner: t = tighten(reduce(t*256 + mm_p)); the tighten keeps
    |t*256| < 2^30.1 for q < 2^23.

    When the contraction is short enough that |mm2 << 8| + |mm1| <
    2^30.7 — 3K * 2^14 * 257 < 2^31, i.e. 3K <= 507, which covers the
    square four-step split up to R = C = 128 (logN <= 14) — the first
    round runs directly on the raw matmul block, skipping one tighten
    (the Horner recombination is ~50% of kernel time; this removes one
    of its five rint rounds)."""
    K3 = rhs.shape[0]
    Kp = rhs.shape[1] // 3
    mm = jax.lax.dot_general(
        dig, rhs, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)  # [M, 3K']
    if K3 * 257 < (1 << 31) >> 14:
        # |mm2 << 8 + mm1| <= 3K * 2^14 * 257 < 2^30.7: _reduce's exact domain
        t = _reduce((mm[:, 2 * Kp:] << 8) + mm[:, Kp:2 * Kp], qinv, qi)
    else:
        t = _tighten(mm[:, 2 * Kp:], qinv, qi)           # exact f32: +-0.51q
        t = _reduce((t << 8) + mm[:, Kp:2 * Kp], qinv, qi)
    t = _tighten(t, qinv, qi)
    t = _reduce((t << 8) + mm[:, :Kp], qinv, qi)
    return _tighten(t, qinv, qi)


def _shoup_mul(y: jnp.ndarray, t_i: jnp.ndarray, t_f: jnp.ndarray,
               qinv: jnp.ndarray, qi: jnp.ndarray, ptile: int) -> jnp.ndarray:
    """y * T mod q in (-0.51q, 0.51q) for |y| <= 0.51q, |T| <= q/2: wrapping
    int32 y*T - rint(f32(y) * (T/q)) * q (the true remainder fits int32;
    |y*(T/q)| <= 0.26q < 2^21.6 keeps the magic-rint in range).

    y: [ptile*a, b]; t_i/t_f: [a, b] broadcast over the poly tile."""
    a, b = t_i.shape
    y3 = y.reshape(ptile, a, b)
    m = _rint_i32(y3.astype(jnp.float32) * t_f[None])
    w = (y3 * t_i[None] - m * qi).reshape(ptile * a, b)
    return _tighten(w, qinv, qi)


def _canon(v: jnp.ndarray, qi: jnp.ndarray) -> jnp.ndarray:
    """(-0.51q, 0.51q) int32 -> [0, q)."""
    v = jnp.where(v < 0, v + qi, v)
    return jnp.where(v >= qi, v - qi, v)


def _transpose_tiles(x: jnp.ndarray, ptile: int, a: int, b: int) -> jnp.ndarray:
    """[ptile * a, b] -> [ptile * b, a] (per-poly transpose)."""
    return jnp.swapaxes(x.reshape(ptile, a, b), 1, 2).reshape(ptile * b, a)


def _make_kernel(R: int, C: int, ptile: int, fwd: bool):
    def kernel(scal_ref, x_ref, a2_ref, b2_ref, twi_ref, twf_ref, out_ref):
        l = pl.program_id(1)
        qf = scal_ref[l, 0]
        qinv = scal_ref[l, 1]
        qi = qf.astype(jnp.int32)
        a2 = a2_ref[0]
        b2 = b2_ref[0]
        t_i = twi_ref[0]
        t_f = twf_ref[0]

        x = x_ref[:]  # int32 [ptile, N]
        v = jnp.where(x > qi >> 1, x - qi, x)  # centered (-q/2, q/2]

        if fwd:
            # Y^T = X^T @ A^T ; W = T^T .* Y^T ; OUT = W^T-transposed @ B^T
            xt = _transpose_tiles(v.reshape(ptile * R, C), ptile, R, C)
            y = _mm_reduce(_digits3(xt, R), a2, qinv, qi)      # [pt*C, R']
            w = _shoup_mul(y, t_i, t_f, qinv, qi, ptile)
            w2 = _transpose_tiles(w, ptile, C, R)              # [pt*R', C]
            out = _mm_reduce(_digits3(w2, C), b2, qinv, qi)
            out_ref[:] = _canon(out, qi).reshape(ptile, R * C)
        else:
            # V = OUT @ Binv^T ; W = Tinv .* V ; X^T = W^T @ Ainv^T
            x2 = v.reshape(ptile * R, C)
            u = _mm_reduce(_digits3(x2, C), b2, qinv, qi)      # [pt*R, C']
            w = _shoup_mul(u, t_i, t_f, qinv, qi, ptile)
            wt = _transpose_tiles(w, ptile, R, C)              # [pt*C', R]
            out = _mm_reduce(_digits3(wt, R), a2, qinv, qi)    # [pt*C', R']
            o3 = _canon(out, qi).reshape(ptile, C, R)
            out_ref[:] = jnp.swapaxes(o3, 1, 2).reshape(ptile, R * C)
    return kernel


@functools.partial(jax.jit, static_argnames=("fwd", "ptile", "interpret"))
def _transform(x: jnp.ndarray, tabs: NTT2Tables, fwd: bool,
               ptile: int = 8, interpret: bool = False) -> jnp.ndarray:
    """x: int32 [B, L, N] in [0, q) -> transformed, same shape/dtype."""
    B, L, N = x.shape
    R, C = tabs.rows, tabs.cols
    if B % ptile:
        raise ValueError(f"batch {B} must be a multiple of ptile={ptile}")

    if fwd:
        a2, b2, t_i, t_f = tabs.a2, tabs.b2, tabs.tw_i, tabs.tw_f
    else:
        a2, b2, t_i, t_f = tabs.a2i, tabs.b2i, tabs.twi_i, tabs.twi_f

    kernel = _make_kernel(R, C, ptile, fwd)
    grid = (B // ptile, L)
    xf = x.astype(jnp.int32).reshape(B, L * N)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            grid=grid,
            interpret=interpret,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),   # [L, 2] scalars
                pl.BlockSpec((ptile, N), lambda b, l: (b, l),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1,) + a2.shape[1:], lambda b, l: (l, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1,) + b2.shape[1:], lambda b, l: (l, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1,) + t_i.shape[1:], lambda b, l: (l, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1,) + t_f.shape[1:], lambda b, l: (l, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((ptile, N), lambda b, l: (b, l),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, L * N), jnp.int32),
            cost_estimate=pl.CostEstimate(
                flops=2 * 2 * ptile * N * 3 * 3 * max(R, C),
                bytes_accessed=2 * ptile * N * 4,
                transcendentals=0),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024),
        )(tabs.scal, xf, a2, b2, t_i, t_f)
    return out.reshape(B, L, N).astype(x.dtype)


def ntt_fwd(x: jnp.ndarray, tabs: NTT2Tables, ptile: int = 8,
            interpret: bool = False) -> jnp.ndarray:
    return _transform(x, tabs, fwd=True, ptile=ptile, interpret=interpret)


def ntt_bwd(x: jnp.ndarray, tabs: NTT2Tables, ptile: int = 8,
            interpret: bool = False) -> jnp.ndarray:
    return _transform(x, tabs, fwd=False, ptile=ptile, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("k", "fwd", "interpret"))
def ntt_chain(x: jnp.ndarray, tabs: NTT2Tables, k: int, fwd: bool = True,
              interpret: bool = False) -> jnp.ndarray:
    """Apply the transform ``k`` times inside ONE kernel launch.

    The whole [B, L, N] batch lives in a persistent VMEM scratch across the
    k grid steps: step 0 reads HBM, the last step writes back, every step
    transforms the scratch in place.  This is the sustained fused-pipeline
    form (FHE composites chain NTT stages on VMEM-resident data, e.g. the
    INTT->digit-lift->NTT inside a gadget product) and it sidesteps the
    per-launch runtime overhead that dominates short launches.  Bit-exact
    to ``k`` sequential ``ntt_fwd``/``ntt_bwd`` calls (tests/test_pallas_ntt2).

    VMEM holds in + out + scratch = 3*B*L*N*4 bytes plus tables, so keep
    B*L*N*4 under ~25 MB (e.g. B=24, L=10, N=2^14).
    """
    B, L, N = x.shape
    R, C = tabs.rows, tabs.cols
    ptile = B

    if fwd:
        a2, b2, t_i, t_f = tabs.a2, tabs.b2, tabs.tw_i, tabs.tw_f
    else:
        a2, b2, t_i, t_f = tabs.a2i, tabs.b2i, tabs.twi_i, tabs.twi_f

    def kernel(scal_ref, x_ref, a2_ref, b2_ref, twi_ref, twf_ref, out_ref,
               scratch):
        step = pl.program_id(0)

        def transform(src_fn):
            for l in range(L):
                qf = scal_ref[l, 0]
                qinv = scal_ref[l, 1]
                qi = qf.astype(jnp.int32)
                x2 = src_fn(l)
                v = jnp.where(x2 > qi >> 1, x2 - qi, x2)
                if fwd:
                    xt = _transpose_tiles(v.reshape(ptile * R, C), ptile, R, C)
                    y = _mm_reduce(_digits3(xt, R), a2_ref[l], qinv, qi)
                    w = _shoup_mul(y, twi_ref[l], twf_ref[l], qinv, qi, ptile)
                    w2 = _transpose_tiles(w, ptile, C, R)
                    out = _mm_reduce(_digits3(w2, C), b2_ref[l], qinv, qi)
                    scratch[:, l, :] = _canon(out, qi).reshape(ptile, N)
                else:
                    x2r = v.reshape(ptile * R, C)
                    u = _mm_reduce(_digits3(x2r, C), b2_ref[l], qinv, qi)
                    w = _shoup_mul(u, twi_ref[l], twf_ref[l], qinv, qi, ptile)
                    wt = _transpose_tiles(w, ptile, R, C)
                    out = _mm_reduce(_digits3(wt, R), a2_ref[l], qinv, qi)
                    o3 = _canon(out, qi).reshape(ptile, C, R)
                    scratch[:, l, :] = jnp.swapaxes(o3, 1, 2).reshape(ptile, N)

        @pl.when(step == 0)
        def _():
            transform(lambda l: x_ref[:, l, :])

        @pl.when(step > 0)
        def _():
            transform(lambda l: scratch[:, l, :])

        @pl.when(step == k - 1)
        def _():
            out_ref[:] = scratch[:]

    spec = pl.BlockSpec((B, L, N), lambda s: (0, 0, 0),
                        memory_space=pltpu.VMEM)
    full = lambda t: pl.BlockSpec(t.shape, lambda s: (0,) * t.ndim,
                                  memory_space=pltpu.VMEM)
    with jax.enable_x64(False):
        return pl.pallas_call(
            kernel, grid=(k,),
            interpret=interpret,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                spec, full(a2), full(b2), full(t_i), full(t_f),
            ],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((B, L, N), jnp.int32),
            scratch_shapes=[pltpu.VMEM((B, L, N), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=120 * 1024 * 1024),
        )(tabs.scal, x.astype(jnp.int32), a2, b2, t_i, t_f).astype(x.dtype)
