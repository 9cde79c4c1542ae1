"""Multiparty share aggregation over a device mesh (party-axis psum).

The reference's multiparty protocols aggregate shares pairwise on a host
(``AggregateShares``, multiparty/keygen_cpk.go:86) with the transport left
to the caller.  When the parties are co-scheduled on a TPU mesh — the
SURVEY §3.5/§5.8 TPU-native mapping — the aggregation IS one ``psum`` over
a ``party`` mesh axis: each device generates its party's share locally
(shares are associative ring adds, so the collective reduce is exact) and
the protocol's network round disappears into an ICI collective.

This module demonstrates that mapping for the collective public-key
protocol: ``collective_pk_over_mesh`` runs gen_share per party under
``shard_map`` and aggregates with a single masked-reduction ``psum``.
Exactness: share limbs are canonical in [0, q); the psum accumulates
integer sums < n_parties * q (< 2^52 for fast sub-52-bit chains, exact in
u64), and one Barrett reduction restores [0, q) — bit-identical to the
host-sequential aggregation (tests/test_multiparty_mesh.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from matrix_fhe_tpu.ops import modmath as mm
from matrix_fhe_tpu.rlwe import keys as K
from matrix_fhe_tpu.rlwe.params import Parameters
from matrix_fhe_tpu.multiparty.protocols import PublicKeyGen, sample_crp_qp


def _psum_mod(x: jnp.ndarray, q: jnp.ndarray, bhi: jnp.ndarray,
              axis: str) -> jnp.ndarray:
    """Exact modular psum: integer all-reduce then one Barrett reduction.
    Requires n_parties * max(q) < 2^52 (the Barrett bound)."""
    total = jax.lax.psum(x, axis)
    return mm.bred_add(total, q, bhi)


def collective_pk_over_mesh(params: Parameters, mesh: Mesh,
                            party_keys: jax.Array, crs: jax.Array,
                            axis: str = "party") -> tuple[K.PublicKey, list[K.SecretKey]]:
    """Collective public-key generation with the parties laid out over a
    mesh axis: per-party sk + share generation run device-local, and the
    share aggregation is ONE psum pair (Q and P limb planes).

    ``party_keys``: [n_parties] PRNG keys (one per party).  Returns the
    collective pk and the per-party secret keys (for tests)."""
    n_parties = mesh.shape[axis]
    crp = sample_crp_qp(crs, params)
    rq, rp = params.ring_q, params.ring_p
    q_bq = rq.moduli[:, None]
    q_bp = rp.moduli[:, None]
    bhi_q = rq.bhi[:, None]
    bhi_p = rp.bhi[:, None]

    if float(n_parties) * max(list(params.q) + list(params.p or ())) >= 2 ** 52:
        raise ValueError("psum aggregation bound: n_parties * q < 2^52")

    # per-party secrets generated host-side (each party owns its sk; the
    # mesh demo shards their DATA over the party axis)
    sks = [K.gen_secret_key(k, params) for k in party_keys]
    sk_q = jnp.stack([s.value.q for s in sks])      # [N, LQ, n]
    sk_p = jnp.stack([s.value.p for s in sks])      # [N, LP, n]
    noise_keys = jnp.stack([jax.random.fold_in(k, 1) for k in party_keys])

    def local(nk, skq, skp):
        sk = K.SecretKey(value=K.QPPoly(q=skq[0], p=skp[0]))
        share = PublicKeyGen.gen_share(nk[0], params, sk, crp)
        agg_q = _psum_mod(share.q, q_bq, bhi_q, axis)
        agg_p = _psum_mod(share.p, q_bp, bhi_p, axis)
        return agg_q, agg_p

    smapped = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(axis, None, None), P(axis, None, None)),
        out_specs=(P(), P()))
    agg_q, agg_p = jax.jit(smapped)(noise_keys, sk_q, sk_p)
    agg = K.QPPoly(q=agg_q, p=agg_p)
    return PublicKeyGen.finalize(params, agg, crp), sks
