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
   limb rows is the fundamental communication of key-switching.  With
   alpha = num_p > 1 (real hybrid digits, ring/basis_extension.go:381-502)
   the schedule DOES NOT change: the gathered rows feed each shard's local
   per-digit approximate ModUp (``frns.mod_up`` with destination-row
   constants sharded over the mesh), so the alpha-limb digit lift costs no
   extra collective.
2. **ModDown**: none — the P basis is replicated (LP limbs on every shard)
   and its lift is recomputed redundantly; the destination-row constants
   are sharded.
3. **Rescale** (one masked ``psum`` per dropped limb): the dropped limb's
   centered value is broadcast from its owner shard.

So the step costs 1 all-gather + ``rescale_limbs`` psums, total, for ANY
num_p; the test (tests/test_fast_sharded_smap.py) asserts both the
collective count in the compiled HLO and bit-identical outputs vs the
unsharded step on the 8-device CPU mesh at num_p in {1, 2, 3}.

Remaining restrictions: L divisible by the mesh axis; operands [L, N] or
batched [B, L, N] (vmapped over the leading axis).
"""

from __future__ import annotations

import dataclasses
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
    with shard_map inside; operands are [L, N] or [B, L, N] (the batch axis
    is vmapped).  Outputs keep the full [.., L, N] shape with the dropped
    limbs zeroed (static shapes; slice [:L-rescale_limbs] for the live
    rows).
    """
    k = mesh.shape[axis]
    rq, rp = ctx.ring_q, ctx.ring_p
    L = rq.num_limbs
    LP = rp.num_limbs
    if L % k:
        raise ValueError(f"L={L} not divisible by mesh axis {k}")
    lloc = L // k
    dec = ctx.dec
    alpha = dec.alpha
    D = dec.num_digits
    nb = ctx.rescale_limbs
    n = rq.n

    # host-side constants ----------------------------------------------------
    qs_full = np.array(rq.moduli_tuple, dtype=np.int64)
    ps_full = np.array(rp.moduli_tuple, dtype=np.int64)
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

    # per-digit ModUp constants for alpha > 1 bands, stacked [D, ...] with
    # the DESTINATION Q rows shardable along the limb axis.  Width-1 bands
    # (alpha == 1, or the uneven tail) use the exact centered spread and
    # leave zero rows here.
    widths = [min((d + 1) * alpha, L) - d * alpha for d in range(D)]
    inv_sd = np.zeros((D, alpha), dtype=np.int32)
    srcq_f64 = np.ones((D, alpha), dtype=np.float64)
    qh_src = np.zeros((D, alpha), dtype=np.int32)
    cij_q = np.zeros((D, L, alpha), dtype=np.int32)    # dst q rows (shard)
    cij_p = np.zeros((D, LP, alpha), dtype=np.int32)   # dst p rows (repl)
    negq_q = np.zeros((D, L), dtype=np.int32)
    negq_p = np.zeros((D, LP), dtype=np.int32)
    qh_dst_q = np.zeros((D, L), dtype=np.int32)
    qh_dst_p = np.zeros((D, LP), dtype=np.int32)
    for d in range(D):
        w = widths[d]
        if w == 1:
            continue
        band = [int(q) for q in qs_full[d * alpha: d * alpha + w]]
        muc = frns.gen_fast_modup_constants(
            band, [int(q) for q in qs_full] + [int(p) for p in ps_full])
        inv_sd[d, :w] = np.asarray(muc.qoverqi_inv_qi)
        srcq_f64[d, :w] = np.asarray(muc.src_q_f64)
        qh_src[d, :w] = np.asarray(muc.qhalf_mod_qi)
        mod_dst = np.asarray(muc.qoverqi_mod_p)        # [L+LP, w]
        cij_q[d, :, :w] = mod_dst[:L]
        cij_p[d, :, :w] = mod_dst[L:]
        negq_q[d] = np.asarray(muc.negq_mod_p)[:L]
        negq_p[d] = np.asarray(muc.negq_mod_p)[L:]
        qh_dst_q[d] = np.asarray(muc.qhalf_mod_p)[:L]
        qh_dst_p[d] = np.asarray(muc.qhalf_mod_p)[L:]

    mdc = ctx.mdc

    def local_step(ring_l, rlk_q_l, mdc_l, qlinv_l, hmod_l, moduli_full,
                   qinv_full, cij_q_l, negq_q_l, qh_dst_q_l,
                   c0, c1, d0, d1):
        """Per-shard body.  ring_l: FastRing pytree with LOCAL tables;
        rlk_q_l [D, 2, lloc, n]; mdc_l: ModDown constants with local Q rows;
        qlinv_l/hmod_l [nb, lloc]; moduli_full/qinv_full [L] replicated;
        cij_q_l [D, lloc, alpha] / negq_q_l, qh_dst_q_l [D, lloc] the
        digit-ModUp destination rows owned by this shard."""
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

        # the concatenated (local q rows, P rows) destination ring view
        dst_cat = dataclasses.replace(
            ring_l,
            moduli_tuple=None, v2_tabs=None,
            moduli=jnp.concatenate([ring_l.moduli, p_moduli_g]),
            qinv_f=jnp.concatenate([ring_l.qinv_f, p_qinv_g]))

        yq_rows, yp_rows = [], []
        for d in range(D):
            s, w = d * alpha, widths[d]
            if w == 1:
                c = x_inv[s:s + 1, :]
                q_src = moduli_full[s]
                neg = c >= (q_src >> 1)
                mag = jnp.where(neg, q_src - c, c)
                tq = fring.canon(fring.reduce_once(mag, q_l, qinv_l), q_l)
                yq_d = jnp.where(neg & (tq != 0), q_l - tq, tq)
                tp = fring.canon(fring.reduce_once(
                    mag, p_moduli_g[:, None], p_qinv_g[:, None]),
                    p_moduli_g[:, None])
                yp_d = jnp.where(neg & (tp != 0), p_moduli_g[:, None] - tp,
                                 tp)
            else:
                src_ring = dataclasses.replace(
                    ring_l, moduli_tuple=None, v2_tabs=None,
                    moduli=moduli_full[s:s + w], qinv_f=qinv_full[s:s + w])
                muc_l = frns.FastModUpConstants(
                    qoverqi_inv_qi=inv_g[d, :w],
                    qoverqi_mod_p=jnp.concatenate(
                        [cij_q_l[d], cij_p_g[d]])[:, :w],
                    negq_mod_p=jnp.concatenate([negq_q_l[d], negq_p_g[d]]),
                    qhalf_mod_qi=qh_src_g[d, :w],
                    qhalf_mod_p=jnp.concatenate(
                        [qh_dst_q_l[d], qh_dst_p_g[d]]),
                    src_q_f64=srcq_g[d, :w])
                both = frns.mod_up(x_inv[s:s + w, :], muc_l, src_ring,
                                   dst_cat, centered=True)
                yq_d, yp_d = both[:lloc, :], both[lloc:, :]
            yq_rows.append(yq_d)
            yp_rows.append(yp_d)
        yq = jnp.stack(yq_rows)                       # [D, lloc, n]
        yp = jnp.stack(yp_rows)                       # [D, LP, n]

        yq = ring_l.ntt(yq)
        yp = _ntt_p(yp)
        dig = jnp.arange(D)[:, None]
        in_band = ((gidx[None, :] >= dig * alpha)
                   & (gidx[None, :] < dig * alpha
                      + jnp.asarray(widths)[:, None]))[..., None]
        yq = jnp.where(in_band, t2[None], yq)

        # -- MACs (local) --
        pq = p_moduli_g[:, None]
        pinv = p_qinv_g[:, None]
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
    rlk_p_g = ctx.rlk_p                                # [D, 2, LP, n] repl
    rp_ring = rp
    p_moduli_g = rp.moduli
    p_qinv_g = rp.qinv_f
    inv_g = jnp.asarray(inv_sd)
    srcq_g = jnp.asarray(srcq_f64)
    qh_src_g = jnp.asarray(qh_src)
    cij_p_g = jnp.asarray(cij_p)
    negq_p_g = jnp.asarray(negq_p)
    qh_dst_p_g = jnp.asarray(qh_dst_p)

    def _ntt_p(x):
        return rp_ring.ntt(x)

    def _ctx_local(ring_l):
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
    dig_q_spec = P(None, axis, None)                  # [D, L, alpha]
    dig_row_spec = P(None, axis)                      # [D, L]

    smapped = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(ring_specs, rlk_spec, mdc_specs, P(None, axis),
                  P(None, axis), P(), P(), dig_q_spec, dig_row_spec,
                  dig_row_spec, data_spec, data_spec, data_spec, data_spec),
        out_specs=(data_spec, data_spec))

    qlinv_j = jnp.asarray(qlinv)
    hmod_j = jnp.asarray(hmod)
    moduli_j = jnp.asarray(qs_full.astype(np.int32))
    qinv_full_j = rq.qinv_f
    cij_q_j = jnp.asarray(cij_q)
    negq_q_j = jnp.asarray(negq_q)
    qh_dst_q_j = jnp.asarray(qh_dst_q)

    def run(c0, c1, d0, d1):
        return smapped(rq, ctx.rlk_q, mdc, qlinv_j, hmod_j, moduli_j,
                       qinv_full_j, cij_q_j, negq_q_j, qh_dst_q_j,
                       c0, c1, d0, d1)

    @jax.jit
    def fn(c0, c1, d0, d1):
        if c0.ndim == 3:                              # [B, L, N] batched
            return jax.vmap(run)(c0, c1, d0, d1)
        return run(c0, c1, d0, d1)

    in_sharding = NamedSharding(mesh, data_spec)
    return fn, in_sharding
