"""Limb-sharded ct-mult+relin+rescale with EXPLICIT collectives (shard_map).

The int32 fast-path flagship step (fast/fckks.mul_relin_rescale) partitioned
over the RNS limb axis of a ``jax.sharding.Mesh`` — the FHE tensor-parallel
direction (SURVEY.md §2.8) — written with ``shard_map`` so every cross-limb
exchange is an explicit, countable collective instead of whatever XLA
auto-spmd infers (VERDICT r3 weak #5: auto-spmd can silently insert
all-gathers that sink scaling efficiency; here the collective schedule is
pinned by construction and asserted in tests).

Exactly THREE kinds of cross-limb communication exist in the whole step,
matching the structure of the math (everything else is limb-local):

1. **Hybrid-KS decomposition** (one ``all_gather``): every digit's source
   band must reach every limb shard — the gather of the INTT'd degree-2
   limb rows is the fundamental communication of key-switching.
2. **ModDown**: none — the P basis is tiny (this module fixes |P| = 1) and
   its lift is recomputed replicated on every shard.
3. **Rescale** (one masked ``psum`` per dropped limb): the dropped limb's
   centered value is broadcast from its owner shard.

So the step costs 1 all-gather + ``rescale_limbs`` psums, total; the test
(tests/test_fast_sharded_smap.py) asserts both the collective count in the
compiled HLO and bit-identical outputs vs the unsharded step on the 8-device
CPU mesh.

Restrictions (demo scope): num_p == 1 (single-P hybrid KS, alpha=1 digits),
L divisible by the mesh axis, batchless [L, N] operands.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from matrix_fhe_tpu.fast import fckks, fring, frns


def _leaf_spec(leaf, L: int, axis: str):
    if isinstance(leaf, jnp.ndarray) and leaf.ndim >= 1 and leaf.shape[0] == L:
        return P(axis, *([None] * (leaf.ndim - 1)))
    return P()


def _shard_pytree_specs(tree, L: int, axis: str):
    return jax.tree.map(lambda v: _leaf_spec(v, L, axis), tree)


def build_sharded_step(ctx: fckks.FastCKKSContext, mesh: Mesh,
                       axis: str = "limb"):
    """Compile the limb-sharded flagship step over ``mesh``.

    Returns ``(fn, in_sharding)``: ``fn(c0, c1, d0, d1) -> (o0, o1)`` jitted
    with shard_map inside; outputs keep the full [L, N] shape with the
    dropped limbs zeroed (static shapes; slice [:L-rescale_limbs] for the
    live rows).
    """
    if len(ctx.ring_p.moduli_tuple) != 1:
        raise ValueError("sharded step requires num_p == 1 (alpha=1 digits)")
    k = mesh.shape[axis]
    rq, rp = ctx.ring_q, ctx.ring_p
    L = rq.num_limbs
    if L % k:
        raise ValueError(f"L={L} not divisible by mesh axis {k}")
    lloc = L // k
    D = ctx.dec.num_digits
    assert D == L, (D, L)
    nb = ctx.rescale_limbs
    n = rq.n
    qp = int(rp.moduli_tuple[0])

    # host-side constants ----------------------------------------------------
    qs_full = np.array(rq.moduli_tuple, dtype=np.int64)
    # per dropped limb l = L-1-kk: qlinv[kk, i] = q_l^{-1} mod q_i (i < l)
    qlinv = np.zeros((nb, L), dtype=np.int32)
    half = np.zeros(nb, dtype=np.int32)
    for kk in range(nb):
        ql = int(qs_full[L - 1 - kk])
        half[kk] = (ql - 1) >> 1
        for i in range(L - 1 - kk):
            qlinv[kk, i] = pow(ql, -1, int(qs_full[i]))
    hmod = np.zeros((nb, L), dtype=np.int32)
    for kk in range(nb):
        for i in range(L):
            hmod[kk, i] = int(half[kk]) % int(qs_full[i])

    # P-basis replicated ring / constants
    mdc = ctx.mdc

    def local_step(ring_l, rlk_q_l, mdc_l, qlinv_l, hmod_l, moduli_full,
                   c0, c1, d0, d1):
        """Per-shard body.  ring_l: FastRing pytree with LOCAL tables;
        rlk_q_l [D, 2, lloc, n]; mdc_l: ModDown constants with local Q rows;
        qlinv_l/hmod_l [nb, lloc]; moduli_full [L] replicated."""
        idx = jax.lax.axis_index(axis)
        gidx = idx * lloc + jnp.arange(lloc)          # global limb ids
        q_l = ring_l.moduli[:, None]
        qinv_l = ring_l.qinv_f[:, None]

        # tensor (limb-local)
        t0, t1, t2 = fckks.tensor(
            _ctx_local(ring_l), c0, c1, d0, d1)

        # -- decompose: INTT local, ONE all_gather, per-digit lifts local --
        x_inv_loc = ring_l.intt(t2)                   # [lloc, n]
        x_inv = jax.lax.all_gather(x_inv_loc, axis, axis=0, tiled=True)

        qsrc = moduli_full[:, None]                   # [L, 1] int32
        neg = x_inv >= (qsrc >> 1)                    # [L(digit), n]
        mag = jnp.where(neg, qsrc - x_inv, x_inv)
        # spread each digit's magnitude to the local limbs / the P limb
        tq = fring.canon(fring.reduce_once(
            mag[:, None, :], q_l[None], qinv_l[None]), q_l[None])
        yq = jnp.where(neg[:, None, :] & (tq != 0), q_l[None] - tq, tq)
        pq = jnp.int32(qp)
        pinv = jnp.float32(1.0 / qp)
        tp = fring.canon(fring.reduce_once(mag[:, None, :], pq, pinv), pq)
        yp = jnp.where(neg[:, None, :] & (tp != 0), pq - tp, tp)

        yq = ring_l.ntt(yq)                           # [D, lloc, n]
        yp = _ntt_p(yp)                               # [D, 1, n]
        in_band = (gidx[None, :] == jnp.arange(L)[:, None])[..., None]
        yq = jnp.where(in_band, t2[None], yq)

        # -- MACs (local) --
        d_q = jnp.sum(fring.mulmod_lazy_centered(
            rlk_q_l, yq[:, None], q_l, qinv_l), axis=0, dtype=jnp.int32)
        d_q = fring.canon(fring.reduce_once(d_q, q_l, qinv_l), q_l)
        d_p = jnp.sum(fring.mulmod_lazy_centered(
            rlk_p_g, yp[:, None], pq, pinv), axis=0, dtype=jnp.int32)
        d_p = fring.canon(fring.reduce_once(d_p, pq, pinv), pq)

        # -- ModDown (P lift replicated; Q rows local) --
        r0 = _mod_down_local(ring_l, mdc_l, d_q[0], d_p[0])
        r1 = _mod_down_local(ring_l, mdc_l, d_q[1], d_p[1])

        o0 = ring_l.add(t0, r0)
        o1 = ring_l.add(t1, r1)

        # -- rescale: INTT local, one masked psum per dropped limb --
        # stack the two polys so each dropped limb costs ONE psum
        x = jnp.stack([ring_l.intt(o0), ring_l.intt(o1)])  # [2, lloc, n]
        live = jnp.ones((lloc, 1), dtype=jnp.int32)
        for kk in range(nb):
            l_drop = L - 1 - kk
            ql = moduli_full[l_drop]
            own = (gidx == l_drop)[None, :, None]     # [1, lloc, 1]
            t = x + jnp.int32(int(half[kk]))
            t = jnp.where(t >= ql, t - ql, t)         # (x_l + h) mod q_l
            tl = jnp.where(own, t, 0)
            t_b = jax.lax.psum(
                jnp.sum(tl, axis=1, dtype=jnp.int32), axis)  # [2, n]
            t_red = fring.canon(fring.reduce_once(
                t_b[:, None, :], q_l, qinv_l), q_l)
            acc = x + hmod_l[kk][:, None] + (2 * q_l - t_red)
            acc = fring.canon(fring.reduce_once(acc, q_l, qinv_l), q_l)
            out = fring.mulmod(acc, qlinv_l[kk][:, None], q_l, qinv_l)
            x = jnp.where(gidx[None, :, None] < l_drop, out, 0)
            live = live * (gidx[:, None] < l_drop)
        o0 = ring_l.ntt(x[0]) * live
        o1 = ring_l.ntt(x[1]) * live
        return o0, o1

    # -- helpers bound over replicated constants ----------------------------
    rlk_p_g = ctx.rlk_p                                # [D, 2, 1, n] replicated
    rp_ring = rp

    def _ntt_p(x):
        return rp_ring.ntt(x)

    def _ctx_local(ring_l):
        import dataclasses
        return dataclasses.replace(ctx, ring_q=ring_l)

    def _mod_down_local(ring_l, mdc_l, xq, xp):
        xp_c = rp_ring.intt(xp)
        lift = frns.mod_up(xp_c, mdc_l.modup_p_to_q, rp_ring, ring_l,
                           centered=True)
        lift = ring_l.ntt(lift)
        diff = ring_l.sub(xq, lift)
        return fring.mulmod(diff, mdc_l.pinv_mod_q[:, None],
                            ring_l.moduli[:, None], ring_l.qinv_f[:, None])

    # -- specs ---------------------------------------------------------------
    ring_specs = _shard_pytree_specs(rq, L, axis)
    mdc_specs = _shard_pytree_specs(mdc, L, axis)
    data_spec = P(axis, None)
    rlk_spec = P(None, None, axis, None)

    smapped = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(ring_specs, rlk_spec, mdc_specs, P(None, axis),
                  P(None, axis), P(), data_spec, data_spec, data_spec,
                  data_spec),
        out_specs=(data_spec, data_spec))

    qlinv_j = jnp.asarray(qlinv)
    hmod_j = jnp.asarray(hmod)
    moduli_j = jnp.asarray(qs_full.astype(np.int32))

    @jax.jit
    def fn(c0, c1, d0, d1):
        return smapped(rq, ctx.rlk_q, mdc, qlinv_j, hmod_j, moduli_j,
                       c0, c1, d0, d1)

    in_sharding = NamedSharding(mesh, data_spec)
    return fn, in_sharding
