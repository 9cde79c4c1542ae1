"""Coefficient-axis-sharded NTT: the multi-chip pod-scale transform.

BASELINE.json: "butterfly stages exchanged all-to-all across a multi-host TPU
pod slice (coefficients/RNS limbs partitioned over the mesh)".  In four-step
form (OUT = (T .* (A @ X)) @ B^T with X = reshape(x, [R, C])) the column
axis C is the natural shard axis:

  * step 1 (A @ X) contracts over R -> every shard computes its own column
    block locally, zero communication;
  * the twiddle product is elementwise -> local;
  * step 2 (W @ B^T) contracts over the SHARDED axis C -> each shard forms
    partial products against its row block of B^T and the result is combined
    with a single reduce-scatter (jax.lax.psum_scatter) that also leaves the
    output column-sharded.

One collective for the whole transform (vs log N/k butterfly exchanges in
stage-by-stage sharding).  Exact u64 modular arithmetic throughout; output is
bit-identical to the unsharded reference NTT (natural [R, C] four-step
ordering; see tests for the cross-check).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from matrix_fhe_tpu.ops import modmath as mm
from matrix_fhe_tpu.ops.rings import bit_reverse
from matrix_fhe_tpu.utils import primes as pr


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["a_mat", "bt_mat", "tw", "moduli", "qinv", "bhi"],
    meta_fields=["n", "rows", "cols"],
)
@dataclasses.dataclass(frozen=True)
class ShardedNTTTables:
    """Four-step tables in Montgomery form, u64 (any modulus size)."""
    n: int
    rows: int
    cols: int
    a_mat: jnp.ndarray   # u64 [L, R, R]  MForm(A)
    bt_mat: jnp.ndarray  # u64 [L, C, C]  MForm(B^T)
    tw: jnp.ndarray      # u64 [L, R, C]  MForm(T)
    moduli: jnp.ndarray  # u64 [L]
    qinv: jnp.ndarray    # u64 [L]
    bhi: jnp.ndarray     # u64 [L]


def build_tables(n: int, moduli: list[int]) -> ShardedNTTTables:
    logn = n.bit_length() - 1
    a_bits = logn // 2
    b_bits = logn - a_bits
    R, C = 1 << a_bits, 1 << b_bits

    a_l, bt_l, tw_l, qinv_l, bhi_l = [], [], [], [], []
    for q in moduli:
        g, _ = pr.primitive_root(q)
        psi = pow(g, (q - 1) // (2 * n), q)

        def mf(v):
            return (v << 64) % q

        e_hi = [2 * bit_reverse(i, a_bits) + 1 for i in range(R)]
        A = np.array([[mf(pow(psi, C * e_hi[i] * j1 % (2 * n), q))
                       for j1 in range(R)] for i in range(R)], dtype=np.uint64)
        T = np.array([[mf(pow(psi, e_hi[i] * j0 % (2 * n), q))
                       for j0 in range(C)] for i in range(R)], dtype=np.uint64)
        BT = np.array([[mf(pow(psi, 2 * R * bit_reverse(ilo, b_bits) * j0 % (2 * n), q))
                        for ilo in range(C)] for j0 in range(C)], dtype=np.uint64)
        a_l.append(A)
        bt_l.append(BT)
        tw_l.append(T)
        qinv_l.append(mm.gen_mred_constant(q))
        bhi_l.append(mm.gen_bred_constant(q)[0])

    return ShardedNTTTables(
        n=n, rows=R, cols=C,
        a_mat=jnp.asarray(np.stack(a_l)), bt_mat=jnp.asarray(np.stack(bt_l)),
        tw=jnp.asarray(np.stack(tw_l)),
        moduli=jnp.asarray(np.array(moduli, dtype=np.uint64)),
        qinv=jnp.asarray(np.array(qinv_l, dtype=np.uint64)),
        bhi=jnp.asarray(np.array(bhi_l, dtype=np.uint64)))


def _mod_matmul_left(mat, x, q, qinv, bhi):
    """out[.., L, R', c] = sum_r MForm(mat)[L, R', r] * x[.., L, r, c] mod q."""
    prod = mm.mred(mat[:, :, :, None], x[..., :, None, :, :],
                   q[:, None, None, None], qinv[:, None, None, None])
    return mm.modsum(jnp.moveaxis(prod, -2, -1), q[:, None, None],
                     bhi[:, None, None], axis=-1)


def _partial_matmul_right(x, mat_rows, q, qinv, bhi):
    """Partial of OUT = X @ B^T over the local column block:
    x [.., L, R, c_blk], mat_rows [L, c_blk, C'] -> [.., L, R, C'] (reduced)."""
    prod = mm.mred(x[..., :, :, None], mat_rows[:, None, :, :],
                   q[:, None, None, None], qinv[:, None, None, None])
    return mm.modsum(jnp.moveaxis(prod, -2, -1), q[:, None, None],
                     bhi[:, None, None], axis=-1)


def ntt_sharded(x: jnp.ndarray, tabs: ShardedNTTTables, mesh: Mesh,
                axis: str = "seq") -> jnp.ndarray:
    """Forward NTT of x [.., L, N] with the coefficient axis sharded over
    ``axis``; output identically sharded.  Exactly one collective
    (psum_scatter) per call."""
    *lead, L, N = x.shape
    R, C = tabs.rows, tabs.cols
    k = mesh.shape[axis]
    if C % k:
        raise ValueError(f"C={C} must divide over {k} shards")

    nlead = len(lead)
    # shard the COLUMN axis of the [R, C] view (the contraction axis of
    # step 2, so the single collective is the step-2 reduce-scatter)
    xb = x.reshape(*lead, L, R, C)
    in_spec = P(*([None] * (nlead + 2)), axis)
    out_spec = in_spec

    def local(xs, a_mat, bt_mat, tw, q, qinv, bhi):
        # xs: [.., L, R, C/k]
        y = _mod_matmul_left(a_mat, xs, q, qinv, bhi)      # local columns
        idx = jax.lax.axis_index(axis)
        tw_blk = jax.lax.dynamic_slice_in_dim(tw, idx * (C // k), C // k, 2)
        w = mm.mred(y, tw_blk, q[:, None, None], qinv[:, None, None])
        bt_rows = jax.lax.dynamic_slice_in_dim(bt_mat, idx * (C // k), C // k, 1)
        partial = _partial_matmul_right(w, bt_rows, q, qinv, bhi)  # [.., R, C']
        # sum over shards; scatter the C' axis back over the mesh axis
        total = jax.lax.psum_scatter(partial, axis,
                                     scatter_dimension=partial.ndim - 1,
                                     tiled=True)
        return mm.bred_add(total, q[:, None, None], bhi[:, None, None])

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(in_spec, P(None), P(None), P(None), P(None), P(None), P(None)),
        out_specs=out_spec)
    out = fn(xb, tabs.a_mat, tabs.bt_mat, tabs.tw, tabs.moduli, tabs.qinv,
             tabs.bhi)
    return out.reshape(*lead, L, N)


def ntt_reference(x: jnp.ndarray, tabs: ShardedNTTTables) -> jnp.ndarray:
    """Unsharded four-step NTT with the same tables/ordering (for tests)."""
    *lead, L, N = x.shape
    R, C = tabs.rows, tabs.cols
    q, qinv, bhi = tabs.moduli, tabs.qinv, tabs.bhi
    xb = x.reshape(*lead, L, R, C)
    y = _mod_matmul_left(tabs.a_mat, xb, q, qinv, bhi)
    w = mm.mred(y, tabs.tw, q[:, None, None], qinv[:, None, None])
    out = _partial_matmul_right(w, tabs.bt_mat, q, qinv, bhi)
    return out.reshape(*lead, L, N)
