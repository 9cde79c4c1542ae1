"""Wide-path CKKS: ct-mult + relinearize + rescale over 45/55-bit moduli.

Pair/plane mirror of fast/fckks.py for the reference's production parameter
shapes (PN14QP438: 55+45x6-bit Q, 55x2-bit P —
schemes/ckks/example_parameters.go:11): tensor product, hybrid gadget
product (evaluator_gadget_product.go:123-190), hoisted rotations and the
flagship mul+relin+rescale step (SURVEY.md §3.3), all on the wide int32
kernels (ops/wide.py, ops/wide_ntt.py).

Key-switch MACs run lazily in plane space: each digit contributes one
PxP-plane schoolbook product; the per-digit partial sums renormalize every
``wide.mac_period`` digits and convert to pairs once per output poly.
Bootstrapping-grade sets with 56/60/61-bit primes run in the pair31 mode
(6 planes, default_parameters.go:25-40 shapes); the mode is uniform across
the context's rings (wide.use_pair31 over q and p together).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from matrix_fhe_tpu.ops import wide
from matrix_fhe_tpu.fast import wring, wrns
from matrix_fhe_tpu.fast.wring import WideRing


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["ring_q", "ring_p", "dec", "mdc", "rlk_q", "rlk_p",
                 "gk_q", "gk_p"],
    meta_fields=["rescale_limbs", "gal_els"],
)
@dataclasses.dataclass(frozen=True)
class WideCKKSContext:
    ring_q: WideRing
    ring_p: WideRing
    dec: wrns.WideDecomposer
    mdc: wrns.WideModDownConstants
    rlk_q: jnp.ndarray               # int32 [digits, 2, 2, LQ, N] pairs
    rlk_p: jnp.ndarray               # int32 [digits, 2, 2, LP, N]
    gk_q: jnp.ndarray | None = None  # int32 [G, digits, 2, 2, LQ, N]
    gk_p: jnp.ndarray | None = None
    rescale_limbs: int = 1
    gal_els: tuple[int, ...] = ()

    def galois_key(self, gal_el: int):
        if gal_el not in self.gal_els:
            raise KeyError(f"no wide galois key for element {gal_el}")
        g = self.gal_els.index(gal_el)
        return self.gk_q[g], self.gk_p[g]

    @property
    def level(self) -> int:
        return self.ring_q.level

    def at_level(self, level: int) -> "WideCKKSContext":
        if level == self.level:
            return self
        if level > self.level:
            raise ValueError(
                f"at_level({level}) above the built level {self.level}")
        Q = list(self.ring_q.moduli_tuple[: level + 1])
        P = list(self.ring_p.moduli_tuple)
        nplanes = self.ring_q.tabs.nplanes
        dec = wrns.gen_wide_decomposer(Q, P, nplanes)
        D = dec.num_digits
        return dataclasses.replace(
            self,
            ring_q=self.ring_q.at_level(level),
            dec=dec,
            mdc=wrns.gen_wide_moddown_constants(Q, P, nplanes),
            rlk_q=self.rlk_q[:D, :, :, : level + 1, :],
            rlk_p=self.rlk_p[:D],
            gk_q=None if self.gk_q is None
            else self.gk_q[:, :D, :, :, : level + 1, :],
            gk_p=None if self.gk_p is None else self.gk_p[:, :D],
        )


def _convert_gadget(params, gadget) -> tuple[np.ndarray, np.ndarray]:
    """u64 gadget ciphertext (Montgomery/NTT) -> plain-domain wide pairs."""
    uq = params.ring_q
    up = params.ring_p
    gq = np.asarray(uq.imform(gadget.q))
    gp = np.asarray(up.imform(gadget.p))
    pair31 = wide.use_pair31(list(params.q) + list(params.p))
    return (wide.pack_pair(gq, params.q, pair31),
            wide.pack_pair(gp, params.p, pair31))


def make_context(params, rlk, gks=None, rescale_limbs: int = 1
                 ) -> WideCKKSContext:
    """Build the wide context from u64-path parameters + relinearization key
    and optional galois keys {gal_el: GaloisKey} (keys converted
    Montgomery->plain, packed as pairs)."""
    Q, P = list(params.q), list(params.p)
    pair31 = wide.use_pair31(Q + P)
    nplanes = 6 if pair31 else 5
    ring_q = wring.new_wide_ring(params.n, Q, pair31)
    ring_p = wring.new_wide_ring(params.n, P, pair31)

    rlk_q, rlk_p = _convert_gadget(params, rlk.gadget)
    gal_els: tuple[int, ...] = ()
    gk_q = gk_p = None
    if gks:
        gal_els = tuple(sorted(gks))
        conv = [_convert_gadget(params, gks[g].gadget) for g in gal_els]
        gk_q = jnp.asarray(np.stack([c[0] for c in conv]))
        gk_p = jnp.asarray(np.stack([c[1] for c in conv]))
    return WideCKKSContext(
        ring_q=ring_q, ring_p=ring_p,
        dec=wrns.gen_wide_decomposer(Q, P, nplanes),
        mdc=wrns.gen_wide_moddown_constants(Q, P, nplanes),
        rlk_q=jnp.asarray(rlk_q), rlk_p=jnp.asarray(rlk_p),
        gk_q=gk_q, gk_p=gk_p,
        rescale_limbs=rescale_limbs, gal_els=gal_els,
    )


PN14QP438_Q = (0x80000000080001, 0x2000000A0001, 0x2000000E0001,
               0x2000001D0001, 0x1FFFFFCF0001, 0x1FFFFFC20001,
               0x200000440001)
PN14QP438_P = (0x80000000130001, 0x7FFFFFFFE90001)


def make_synthetic_context(logn: int, num_q: int, num_p: int,
                           q_bits=(55,) + (45,) * 32, p_bits=55,
                           rescale_limbs: int = 1, seed: int = 0,
                           num_rot: int = 0, moduli=None):
    """Wide context + uniform-random operands for throughput benchmarking
    (PN14QP438-shaped by default; pass ``moduli=(Q, P)`` — e.g.
    (PN14QP438_Q, PN14QP438_P) — for an exact reference ladder).  Timing is
    data-independent; correctness is pinned separately (tests/test_wring.py,
    on the exact PN14QP438 primes) bit-exact vs the u64 path."""
    from matrix_fhe_tpu.utils import primes as pr

    n = 1 << logn
    pools: dict[int, list[int]] = {}

    def take(bits):
        if bits not in pools:
            pools[bits] = []
        if not pools[bits]:
            g = pr.NTTFriendlyPrimesGenerator(bits, 2 * n)
            got = []
            seen = set(sum(pools.values(), []))
            while len(got) < 40:
                try:
                    p = g.next_alternating_prime()
                except ValueError:
                    break
                if p not in seen:
                    got.append(p)
            pools[bits] = got
        return pools[bits].pop(0)

    used: set[int] = set()

    def next_prime(bits):
        while True:
            p = take(bits)
            if p not in used:
                used.add(p)
                return p

    if moduli is not None:
        Q, P = [int(q) for q in moduli[0]], [int(p) for p in moduli[1]]
        num_q, num_p = len(Q), len(P)
    else:
        Q = [next_prime(q_bits[i]) for i in range(num_q)]
        P = [next_prime(p_bits if isinstance(p_bits, int) else p_bits[i])
             for i in range(num_p)]
    pair31 = wide.use_pair31(Q + P)
    nplanes = 6 if pair31 else 5
    ring_q = wring.new_wide_ring(n, Q, pair31)
    ring_p = wring.new_wide_ring(n, P, pair31)
    dec = wrns.gen_wide_decomposer(Q, P, nplanes)

    rng = np.random.default_rng(seed)

    def unif(shape, mods):
        x = np.stack([rng.integers(0, q, shape[:-2] + (shape[-1],),
                                   dtype=np.uint64) for q in mods], axis=-2)
        return jnp.asarray(wide.pack_pair(x, mods, pair31))

    gal_els: tuple[int, ...] = ()
    gk_q = gk_p = None
    if num_rot:
        gal_els = tuple(pow(5, k + 1, 2 * n) for k in range(num_rot))
        gk_q = jnp.stack([unif((dec.num_digits, 2, num_q, n), Q)
                          for _ in range(num_rot)])
        gk_p = jnp.stack([unif((dec.num_digits, 2, num_p, n), P)
                          for _ in range(num_rot)])
    ctx = WideCKKSContext(
        ring_q=ring_q, ring_p=ring_p, dec=dec,
        mdc=wrns.gen_wide_moddown_constants(Q, P, nplanes),
        rlk_q=unif((dec.num_digits, 2, num_q, n), Q),
        rlk_p=unif((dec.num_digits, 2, num_p, n), P),
        gk_q=gk_q, gk_p=gk_p,
        rescale_limbs=rescale_limbs, gal_els=gal_els,
    )
    cts = tuple(unif((num_q, n), Q) for _ in range(4))
    return ctx, cts


def tensor(ctx: WideCKKSContext, c0, c1, d0, d1):
    """NTT-domain degree-2 tensor (evaluator.go:786-865)."""
    rq = ctx.ring_q
    t0 = rq.mul_coeffs_montgomery(c0, d0)
    t1 = rq.add(rq.mul_coeffs_montgomery(c0, d1),
                rq.mul_coeffs_montgomery(c1, d0))
    t2 = rq.mul_coeffs_montgomery(c1, d1)
    return t0, t1, t2


def decompose_ks(ctx: WideCKKSContext, x_ntt):
    """Hybrid-KS digit decomposition of an NTT-domain poly (DecomposeNTT,
    evaluator_gadget_product.go:431-455): digits lifted in the coefficient
    domain, ONE batched NTT per ring, NTT-domain source band spliced."""
    rq, rp = ctx.ring_q, ctx.ring_p
    x_inv = rq.intt(x_ntt)
    yq_c, yp_c = wrns.decompose_all_coeff(ctx.dec, x_inv, rq, rp)
    yq = rq.ntt(yq_c)                       # [D, 2, LQ, N]
    yp = rp.ntt(yp_c)                       # [D, 2, LP, N]
    D, lq = yq.shape[-4], yq.shape[-2]
    limb = jnp.arange(lq)[None, None, :, None]
    dig = jnp.arange(D)[:, None, None, None]
    in_band = (limb >= dig * ctx.dec.alpha) & (limb < (dig + 1) * ctx.dec.alpha)
    yq = jnp.where(in_band, x_ntt[..., None, :, :, :], yq)
    return yq, yp


def ks_mac(ctx: WideCKKSContext, key_q, key_p, yq, yp):
    """Lazy plane-space MAC of digit stacks against a gadget key
    (gadgetProductMultiplePLazy): -> (d_q [2, 2, LQ, N], d_p [2, 2, LP, N])
    pairs in the QP basis, canonical centered."""
    def run(key, y, ring):
        t = ring.tabs
        period = wide.mac_period(t)
        outs = []
        for row in range(2):
            acc = None
            for d in range(ctx.dec.num_digits):
                pa = wide.pair_to_planes(y[..., d, 0, :, :],
                                         y[..., d, 1, :, :], t)
                pb = wide.pair_to_planes(key[d, row, 0], key[d, row, 1], t)
                acc = wide.mac_planes(acc, pa, pb, t)
                if (d + 1) % period == 0 and d + 1 < ctx.dec.num_digits:
                    acc = wide.fold_excess(acc, t)
            acc = wide.fold_excess(acc, t)
            lo, hi = wide.planes_to_pair(acc, t)
            outs.append(jnp.stack([lo, hi], axis=-3))
        return jnp.stack(outs, axis=0)

    d_q = run(key_q, yq, ctx.ring_q)
    d_p = run(key_p, yp, ctx.ring_p)
    return d_q, d_p


def gadget_product_core(ctx: WideCKKSContext, key_q, key_p, x_ntt):
    """Full hybrid key-switch of an NTT-domain poly against a gadget key:
    decompose, MAC, ModDown (SURVEY §3.3 with any key)."""
    d_q, d_p = ks_mac(ctx, key_q, key_p, *decompose_ks(ctx, x_ntt))
    out = wrns.mod_down(d_q, d_p, ctx.mdc, ctx.ring_q, ctx.ring_p, ntt=True)
    return out[0], out[1]


def gadget_product(ctx: WideCKKSContext, t2):
    return gadget_product_core(ctx, ctx.rlk_q, ctx.rlk_p, t2)


def _auto_index(ctx: WideCKKSContext, gal_el: int) -> jnp.ndarray:
    from matrix_fhe_tpu.ops.automorphism import automorphism_ntt_index
    n = ctx.ring_q.n
    return jnp.asarray(automorphism_ntt_index(n, 2 * n, gal_el))


def automorphism(ctx: WideCKKSContext, c0, c1, gal_el: int):
    """NTT-domain automorphism (evaluator_automorphism.go:14-60)."""
    gk_q, gk_p = ctx.galois_key(gal_el)
    r0, r1 = gadget_product_core(ctx, gk_q, gk_p, c1)
    rq = ctx.ring_q
    d0 = rq.add(r0, c0)
    idx = _auto_index(ctx, gal_el)
    return d0[..., idx], r1[..., idx]


def rotations_hoisted(ctx: WideCKKSContext, c0, c1, gal_els):
    """Many rotations of one ciphertext: decompose ONCE, one MAC+ModDown+
    permute per element (RotateHoisted)."""
    yq, yp = decompose_ks(ctx, c1)
    rq = ctx.ring_q
    out = {}
    for g in gal_els:
        gk_q, gk_p = ctx.galois_key(g)
        d_q, d_p = ks_mac(ctx, gk_q, gk_p, yq, yp)
        r = wrns.mod_down(d_q, d_p, ctx.mdc, rq, ctx.ring_p, ntt=True)
        idx = _auto_index(ctx, g)
        out[g] = (rq.add(r[0], c0)[..., idx], r[1][..., idx])
    return out


def mul_relin_rescale(ctx: WideCKKSContext, c0, c1, d0, d1):
    """The flagship step (SURVEY.md §3.3) on wide pairs [2, LQ, N]."""
    t0, t1, t2 = tensor(ctx, c0, c1, d0, d1)
    r0, r1 = gadget_product(ctx, t2)
    rq = ctx.ring_q
    out0 = rq.add(t0, r0)
    out1 = rq.add(t1, r1)
    nb = ctx.rescale_limbs
    return (wrns.div_round_by_last_modulus_many_ntt(rq, out0, nb),
            wrns.div_round_by_last_modulus_many_ntt(rq, out1, nb))
