"""Fused Pallas NTT: the four-step MXU NTT as a single VMEM-resident kernel.

This is the speed-of-light path for the headline benchmark (BASELINE.json:
RNS-NTTs/s/chip at N=2^14).  Same math as ops/mxu_ntt.py (four-step
factorization, 3x int8 balanced digits, exact f32 Dekker recombination,
bit-exact output vs ring/ntt.go for w22 primes), restructured so that

  * each grid program transforms one (poly, limb) residue entirely in VMEM:
    the 9 digit-pair products live in registers/VMEM and never touch HBM
    (the jnp path materializes them: a 9x data expansion that made it
    HBM-bound at ~100k NTT/s);
  * the 9 digit-pair products of each stage are ONE int8 [3R, K] @ [K, 3C]
    MXU matmul (digit planes stacked: rows = lhs planes, cols = rhs planes;
    diagonal blocks i+j=k recombined with 2^{8k} weights);
  * HBM traffic is exactly read-poly + write-poly (8 bytes/coefficient).

Layout: A (R x R) applied from the LEFT of X = reshape(x, [R, C]); twiddles
T on the [R, C] layout; B^T (C x C) from the right:

    OUT = (T .* (A @ X)) @ B^T        INV: X = Ainv @ (Tinv .* (OUT @ Binv^T))
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from matrix_fhe_tpu.ops.mxu_ntt import (
    MAX_W22_MODULUS, _digit_planes, find_w22_primes, four_step_factors)
from matrix_fhe_tpu.ops.rings import bit_reverse
from matrix_fhe_tpu.utils import primes as pr


# ---------------------------------------------------------------------------
# Host-side tables (stacked-plane layouts).
# ---------------------------------------------------------------------------

@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["a_fwd", "bt_fwd", "tw_fwd", "a_inv", "bt_inv", "tw_inv",
                 "scal"],
    meta_fields=["n", "rows", "cols"],
)
@dataclasses.dataclass(frozen=True)
class PallasNTTTables:
    n: int
    rows: int
    cols: int
    a_fwd: jnp.ndarray   # int8 [L, 3R, R]   A digit planes stacked in rows
    bt_fwd: jnp.ndarray  # int8 [L, C, 3C]   B^T digit planes stacked in cols
    tw_fwd: jnp.ndarray  # f32  [L, R, C]
    a_inv: jnp.ndarray   # int8 [L, 3R, R]   Ainv (with N^-1 folded)
    bt_inv: jnp.ndarray  # int8 [L, C, 3C]   Binv^T
    tw_inv: jnp.ndarray  # f32  [L, R, C]
    scal: jnp.ndarray    # f32  [L, 8]: q, 1/q, ck0..ck4, 0


def build_tables(n: int, moduli: list[int]) -> PallasNTTTables:
    logn = n.bit_length() - 1
    a_bits = logn // 2
    b_bits = logn - a_bits
    R, C = 1 << a_bits, 1 << b_bits

    a_f, bt_f, tw_f, a_i, bt_i, tw_i, scal = [], [], [], [], [], [], []
    for q in moduli:
        if q >= MAX_W22_MODULUS:
            raise ValueError(f"modulus {q} too large for the w22 MXU path")
        g, _ = pr.primitive_root(q)
        psi = pow(g, (q - 1) // (2 * n), q)
        # closed-form factors incl. analytic inverses (N^{-1} split across
        # Ainv and Binv)
        A, T, B, Ainv, Binv, Tinv = four_step_factors(n, q, psi)

        def stack_rows(mat):
            """[3, r, c] planes -> [3r, c]."""
            d = _digit_planes(mat, q)
            return d.reshape(-1, d.shape[-1])

        def stack_cols(mat):
            """[3, r, c] planes -> [r, 3c]."""
            d = _digit_planes(mat, q)
            return np.concatenate([d[0], d[1], d[2]], axis=1)

        def center_f32(mat):
            m = np.asarray(mat, dtype=np.int64)
            return np.where(m > q // 2, m - q, m).astype(np.float32)

        a_f.append(stack_rows(A))
        bt_f.append(stack_cols(np.asarray(B, dtype=np.int64).T))  # B^T [C, C']
        tw_f.append(center_f32(T))
        a_i.append(stack_rows(Ainv))
        bt_i.append(stack_cols(np.asarray(Binv, dtype=np.int64).T))  # Binv^T
        tw_i.append(center_f32(Tinv))

        def center(v):
            return v - q if v > q // 2 else v
        scal.append([float(q), 1.0 / q] + [float(center(pow(256, k, q)))
                                           for k in range(5)] + [0.0])

    return PallasNTTTables(
        n=n, rows=R, cols=C,
        a_fwd=jnp.asarray(np.stack(a_f)), bt_fwd=jnp.asarray(np.stack(bt_f)),
        tw_fwd=jnp.asarray(np.stack(tw_f)),
        a_inv=jnp.asarray(np.stack(a_i)), bt_inv=jnp.asarray(np.stack(bt_i)),
        tw_inv=jnp.asarray(np.stack(tw_i)),
        scal=jnp.asarray(np.array(scal, dtype=np.float32)))


# ---------------------------------------------------------------------------
# Kernel body (shared by fwd/bwd: the factor order differs only via tables).
# ---------------------------------------------------------------------------

def _two_prod(a, b):
    p = a * b
    ah = a * 4097.0  # Veltkamp split constant for f32 (2^12 + 1)
    ah = ah - (ah - a)
    al = a - ah
    bh = b * 4097.0
    bh = bh - (bh - b)
    bl = b - bh
    return p, ((ah * bh - p) + ah * bl + al * bh) + al * bl


def _reduce_exact(p, e, q, qinv):
    m = jnp.rint(p * qinv)
    mh, ml = _two_prod(m, q)
    r = ((p - mh) + e) - ml
    m2 = jnp.rint(r * qinv)
    return r - m2 * q


def _mulmod(a, b, q, qinv):
    p, e = _two_prod(a, b)
    return _reduce_exact(p, e, q, qinv)


def _digits(v):
    """Centered f32 |v| < 2^22 -> [3r, c] int8 stacked planes."""
    inv256 = jnp.float32(1.0 / 256.0)
    t0 = jnp.floor(v * inv256 + 0.5)
    d0 = v - t0 * 256.0
    t1 = jnp.floor(t0 * inv256 + 0.5)
    d1 = t0 - t1 * 256.0
    return jnp.concatenate([d0, d1, t1], axis=0).astype(jnp.int8)


def _recombine(mm, R, Cb, ck, q, qinv):
    """mm: int32 [3R, 3Cb] stacked digit-pair products -> f32 [R, Cb] mod q.

    Block (i, j) is lhs plane i x rhs plane j; weight 2^{8(i+j)} mod q."""
    diags = [None] * 5
    for i in range(3):
        for j in range(3):
            k = i + j
            blk = mm[i * R:(i + 1) * R, j * Cb:(j + 1) * Cb]
            diags[k] = blk if diags[k] is None else diags[k] + blk
    rs = []
    for k in range(5):
        p, e = _two_prod(diags[k].astype(jnp.float32), ck[k])
        rs.append(_reduce_exact(p, e, q, qinv))
    s = rs[0] + rs[1] + rs[2]
    s = s - jnp.rint(s * qinv) * q
    s = s + rs[3] + rs[4]
    return s - jnp.rint(s * qinv) * q


def _digits_cols(v, r):
    """Centered f32 [r, c] -> int8 [r, 3c] planes stacked in columns."""
    d = _digits(v)  # [3r, c]
    return jnp.concatenate([d[0:r], d[r:2 * r], d[2 * r:3 * r]], axis=1)


def _left_mul(a_pl, xc, R, C, ck, q, qinv):
    """A @ X: lhs planes [3R, R] x rhs planes-in-cols [R, 3C] -> [R, C]."""
    rhs = _digits_cols(xc, R)
    mm = jax.lax.dot_general(
        a_pl, rhs, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)  # [3R, 3C]
    return _recombine(mm, R, C, ck, q, qinv)


def _right_mul(xc, bt_pl, R, C, ck, q, qinv):
    """X @ B^T: lhs planes-in-rows [3R, C] x rhs planes-in-cols [C, 3C]."""
    lhs = _digits(xc)  # [3R, C]
    mm = jax.lax.dot_general(
        lhs, bt_pl, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)  # [3R, 3C]
    return _recombine(mm, R, C, ck, q, qinv)


def _make_kernel(R: int, C: int, ptile: int, fwd: bool):
    """All ``ptile`` polynomials of the block are stacked into ONE pair of
    wide MXU matmuls per transform (left factor: polys side-by-side in the
    columns, [R, ptile*C]; right factor: polys stacked in the rows,
    [ptile*R, C]) so the MXU sees [3R, R] @ [R, 3*ptile*C]-sized work and the
    VPU recombination runs on ptile-times-wider arrays instead of a serial
    per-poly loop of tiny [128, 128] ops."""

    def kernel(scal_ref, x_ref, a_ref, bt_ref, tw_ref, out_ref):
        l = pl.program_id(1)
        q = scal_ref[l, 0]
        qinv = scal_ref[l, 1]
        ck = [scal_ref[l, 2 + k] for k in range(5)]
        a_pl = a_ref[0]     # [3R, R]
        bt_pl = bt_ref[0]   # [C, 3C]
        tw = tw_ref[0]      # [R, C]
        tw_wide = jnp.concatenate([tw] * ptile, axis=1)  # [R, ptile*C]

        x = x_ref[0].astype(jnp.float32)          # [ptile, N]
        xc = jnp.where(x > q * 0.5, x - q, x)

        if fwd:
            # OUT = (T .* (A @ X)) @ B^T
            xt = xc.reshape(ptile, R, C).swapaxes(0, 1).reshape(R, ptile * C)
            y = _left_mul(a_pl, xt, R, ptile * C, ck, q, qinv)
            w = _mulmod(y, tw_wide, q, qinv)       # [R, ptile*C]
            w2 = w.reshape(R, ptile, C).swapaxes(0, 1).reshape(ptile * R, C)
            out = _right_mul(w2, bt_pl, ptile * R, C, ck, q, qinv)
            out = jnp.where(out < 0, out + q, out)
            out_ref[0] = out.reshape(ptile, R * C).astype(jnp.int32)
        else:
            # X = Ainv @ (Tinv .* (OUT @ Binv^T))
            x2 = xc.reshape(ptile * R, C)
            v = _right_mul(x2, bt_pl, ptile * R, C, ck, q, qinv)
            vt = v.reshape(ptile, R, C).swapaxes(0, 1).reshape(R, ptile * C)
            w = _mulmod(vt, tw_wide, q, qinv)
            out = _left_mul(a_pl, w, R, ptile * C, ck, q, qinv)
            out = jnp.where(out < 0, out + q, out)
            out3 = out.reshape(R, ptile, C).swapaxes(0, 1)
            out_ref[0] = out3.reshape(ptile, R * C).astype(jnp.int32)

    return kernel


@functools.partial(jax.jit, static_argnames=("fwd", "ptile", "interpret"))
def _transform(x: jnp.ndarray, tabs: PallasNTTTables, fwd: bool,
               ptile: int = 8, interpret: bool = False) -> jnp.ndarray:
    """x: int32 [B, L, N] in [0, q) -> transformed, same shape/dtype."""
    B, L, N = x.shape
    R, C = tabs.rows, tabs.cols
    if B % ptile:
        raise ValueError(f"batch {B} must be a multiple of ptile={ptile}")

    a = tabs.a_fwd if fwd else tabs.a_inv
    bt = tabs.bt_fwd if fwd else tabs.bt_inv
    tw = tabs.tw_fwd if fwd else tabs.tw_inv

    kernel = _make_kernel(R, C, ptile, fwd)
    grid = (B // ptile, L)
    # limb-major internal layout: blocks are [1, ptile, N] (sublane = ptile)
    xt = jnp.swapaxes(x.astype(jnp.int32), 0, 1)  # [L, B, N]
    # the package enables x64 globally (u64 ring arithmetic); Mosaic requires
    # 32-bit index types, so trace the kernel with x64 off
    with jax.enable_x64(False):
        out = _call(kernel, grid, tabs, xt, a, bt, tw, R, C, ptile, B, L, N,
                    interpret)
    return jnp.swapaxes(out, 0, 1).astype(x.dtype)


def _call(kernel, grid, tabs, xt, a, bt, tw, R, C, ptile, B, L, N,
          interpret=False):
    return pl.pallas_call(
        kernel,
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # full [L, 8] scalars
            pl.BlockSpec((1, ptile, N), lambda b, l: (l, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * R, R), lambda b, l: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, 3 * C), lambda b, l: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, C), lambda b, l: (l, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ptile, N), lambda b, l: (l, b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, B, N), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * (3 * R) * (3 * C) * max(R, C) * ptile * 1,
            bytes_accessed=2 * ptile * N * 4,
            transcendentals=0),
    )(tabs.scal, xt, a, bt, tw)


def ntt_fwd(x: jnp.ndarray, tabs: PallasNTTTables, ptile: int = 8,
            interpret: bool = False) -> jnp.ndarray:
    return _transform(x, tabs, fwd=True, ptile=ptile, interpret=interpret)


def ntt_bwd(x: jnp.ndarray, tabs: PallasNTTTables, ptile: int = 8,
            interpret: bool = False) -> jnp.ndarray:
    return _transform(x, tabs, fwd=False, ptile=ptile, interpret=interpret)
