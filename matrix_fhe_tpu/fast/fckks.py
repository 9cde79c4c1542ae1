"""Fast-path CKKS: the flagship ct-mult + relinearize + rescale in int32.

Word-size-reduced CKKS (SURVEY.md §7.1): the modulus chain is many ~22-bit
NTT-friendly primes instead of few 45/55-bit ones, and rescaling drops
*pairs* of primes so the per-level scale budget (~2^45) matches the
reference's PN14QP438 parameter set (schemes/ckks/example_parameters.go:11).
Setup (parameter/key/ciphertext generation, encode/decode) rides the trusted
u64 parity path on the same moduli; only the hot homomorphic step runs in
the int32 fast domain (fast/fring.py, fast/frns.py), where:

  * the tensor product is a plain-domain f32-Shoup multiply
    (schemes/ckks/evaluator.go:786-918 without the Montgomery detour);
  * relinearization is the hybrid gadget product over digit = LP limbs
    (core/rlwe/evaluator_gadget_product.go:123-190) with lazy-centered MAC
    accumulation;
  * rescale is DivRoundByLastModulusManyNTT with nb=2 (ring/scaling.go:130).

Every step is bit-exact vs the u64 evaluator on the same moduli
(tests/test_fckks.py).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from matrix_fhe_tpu.fast import fring, frns
from matrix_fhe_tpu.fast.fring import FastRing


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["ring_q", "ring_p", "dec", "mdc", "rlk_q", "rlk_p",
                 "gk_q", "gk_p"],
    meta_fields=["rescale_limbs", "gal_els"],
)
@dataclasses.dataclass(frozen=True)
class FastCKKSContext:
    """Device-resident fast-path state for one parameter set at top level."""
    ring_q: FastRing                 # full Q chain
    ring_p: FastRing                 # P chain
    dec: frns.FastDecomposer
    mdc: frns.FastModDownConstants
    rlk_q: jnp.ndarray               # int32 [digits, 2, LQ, N] plain+NTT
    rlk_p: jnp.ndarray               # int32 [digits, 2, LP, N]
    gk_q: jnp.ndarray | None = None  # int32 [G, digits, 2, LQ, N]
    gk_p: jnp.ndarray | None = None  # int32 [G, digits, 2, LP, N]
    rescale_limbs: int = 2           # limbs dropped per rescale (pair = 2)
    gal_els: tuple[int, ...] = ()    # galois elements matching gk_q rows

    def galois_key(self, gal_el: int):
        if gal_el not in self.gal_els:
            raise KeyError(f"no fast galois key for element {gal_el}")
        g = self.gal_els.index(gal_el)
        return self.gk_q[g], self.gk_p[g]

    @property
    def level(self) -> int:
        return self.ring_q.level

    def at_level(self, level: int) -> "FastCKKSContext":
        """Level view: rings/decomposer/ModDown constants over Q[:level+1],
        keys sliced to the live digits and limbs (mirrors the u64 path's
        Ring.at_level + per-level decomposer, ring/ring.go:194)."""
        if level == self.level:
            return self
        if level > self.level:
            raise ValueError(
                f"at_level({level}) above the built level {self.level} "
                f"(slices would silently clamp — ADVICE r3)")
        Q = list(self.ring_q.moduli_tuple[: level + 1])
        P = list(self.ring_p.moduli_tuple)
        dec = frns.gen_fast_decomposer(Q, P)
        D = dec.num_digits
        return dataclasses.replace(
            self,
            ring_q=self.ring_q.at_level(level),
            dec=dec,
            mdc=frns.gen_fast_moddown_constants(Q, P),
            rlk_q=self.rlk_q[:D, :, : level + 1, :],
            rlk_p=self.rlk_p[:D],
            gk_q=None if self.gk_q is None
            else self.gk_q[:, :D, :, : level + 1, :],
            gk_p=None if self.gk_p is None else self.gk_p[:, :D],
        )


def _convert_gadget(params, gadget) -> tuple[np.ndarray, np.ndarray]:
    """u64 gadget ciphertext (Montgomery/NTT) -> plain-domain int32 stacks."""
    uq = params.ring_q
    up = params.ring_p
    gq = np.asarray(uq.imform(gadget.q)).astype(np.int64)
    gp = np.asarray(up.imform(gadget.p)).astype(np.int64)
    return gq.astype(np.int32), gp.astype(np.int32)


def make_context(params, rlk, gks=None, rescale_limbs: int = 2
                 ) -> FastCKKSContext:
    """Build the fast context from u64-path parameters + relinearization key
    and optional galois keys {gal_el: GaloisKey} (keys are converted
    Montgomery->plain; values < 2^23 cast to int32)."""
    Q, P = list(params.q), list(params.p)
    ring_q = fring.new_fast_ring(params.n, Q)
    ring_p = fring.new_fast_ring(params.n, P)

    rlk_q, rlk_p = _convert_gadget(params, rlk.gadget)
    gal_els: tuple[int, ...] = ()
    gk_q = gk_p = None
    if gks:
        gal_els = tuple(sorted(gks))
        conv = [_convert_gadget(params, gks[g].gadget) for g in gal_els]
        gk_q = jnp.asarray(np.stack([c[0] for c in conv]))
        gk_p = jnp.asarray(np.stack([c[1] for c in conv]))
    return FastCKKSContext(
        ring_q=ring_q, ring_p=ring_p,
        dec=frns.gen_fast_decomposer(Q, P),
        mdc=frns.gen_fast_moddown_constants(Q, P),
        rlk_q=jnp.asarray(rlk_q), rlk_p=jnp.asarray(rlk_p),
        gk_q=gk_q, gk_p=gk_p,
        rescale_limbs=rescale_limbs, gal_els=gal_els,
    )


def make_synthetic_context(logn: int, num_q: int, num_p: int,
                           rescale_limbs: int = 2, seed: int = 0,
                           num_rot: int = 0):
    """Fast context + uniform-random ciphertext operands for throughput
    benchmarking.  The homomorphic step's cost is data-independent; NTT-domain
    ciphertext limbs are uniform mod q, so random operands time identically to
    real ones (correctness is pinned separately, bit-exact vs the u64
    evaluator, in tests/test_fckks.py)."""
    n = 1 << logn
    moduli = fring.find_fast_primes(n, num_q + num_p)
    Q, P = moduli[:num_q], moduli[num_q:]
    ring_q = fring.new_fast_ring(n, Q)
    ring_p = fring.new_fast_ring(n, P)
    dec = frns.gen_fast_decomposer(Q, P)

    rng = np.random.default_rng(seed)

    def unif(shape, mods):
        hi = np.array(mods, dtype=np.int64).reshape(
            (1,) * (len(shape) - 2) + (len(mods), 1))
        return jnp.asarray(
            (rng.integers(0, 1 << 62, shape, dtype=np.int64) % hi)
            .astype(np.int32))

    gal_els: tuple[int, ...] = ()
    gk_q = gk_p = None
    if num_rot:
        # galois elements 5^k mod 2N (the CKKS rotation group)
        gal_els = tuple(pow(5, k + 1, 2 * n) for k in range(num_rot))
        gk_q = unif((num_rot, dec.num_digits, 2, num_q, n), Q)
        gk_p = unif((num_rot, dec.num_digits, 2, num_p, n), P)
    ctx = FastCKKSContext(
        ring_q=ring_q, ring_p=ring_p, dec=dec,
        mdc=frns.gen_fast_moddown_constants(Q, P),
        rlk_q=unif((dec.num_digits, 2, num_q, n), Q),
        rlk_p=unif((dec.num_digits, 2, num_p, n), P),
        gk_q=gk_q, gk_p=gk_p,
        rescale_limbs=rescale_limbs, gal_els=gal_els,
    )
    cts = tuple(unif((num_q, n), Q) for _ in range(4))
    return ctx, cts


def tensor(ctx: FastCKKSContext, c0, c1, d0, d1):
    """NTT-domain degree-2 tensor (evaluator.go:786-865): plain f32-Shoup
    multiplies, no Montgomery forms."""
    rq = ctx.ring_q
    t0 = rq.mul_coeffs_montgomery(c0, d0)
    t1 = rq.add(rq.mul_coeffs_montgomery(c0, d1),
                rq.mul_coeffs_montgomery(c1, d0))
    t2 = rq.mul_coeffs_montgomery(c1, d1)
    return t0, t1, t2


def decompose_ks(ctx: FastCKKSContext, x_ntt):
    """Hybrid-KS digit decomposition of an NTT-domain poly (DecomposeNTT,
    core/rlwe/evaluator_gadget_product.go:431-455): all digits lifted in the
    coefficient domain, then ONE batched NTT per ring (grid-parallel over
    digits x limbs) instead of D sequential calls.  Returns NTT-domain
    stacks (yq [D, LQ, N], yp [D, LP, N]) — the hoisting unit shared by
    every key-switch against the same poly."""
    rq, rp = ctx.ring_q, ctx.ring_p
    x_inv = rq.intt(x_ntt)
    yq_c, yp_c = frns.decompose_all_coeff(ctx.dec, x_inv, rq, rp)
    yq = rq.ntt(yq_c)                       # [D, LQ, N]
    yp = rp.ntt(yp_c)                       # [D, LP, N]
    # splice the NTT-domain source band of each digit (DecomposeSingleNTT
    # keeps limbs [i*alpha, (i+1)*alpha) from the original NTT input)
    D, lq = yq.shape[-3], yq.shape[-2]
    limb = jnp.arange(lq)[None, :, None]
    dig = jnp.arange(D)[:, None, None]
    in_band = (limb >= dig * ctx.dec.alpha) & (limb < (dig + 1) * ctx.dec.alpha)
    yq = jnp.where(in_band, x_ntt[..., None, :, :], yq)
    return yq, yp


def ks_mac(ctx: FastCKKSContext, key_q, key_p, yq, yp):
    """Lazy-centered MAC of digit stacks against a gadget key
    (gadgetProductMultiplePLazy, evaluator_gadget_product.go:123-190):
    returns canonical (d_q [2, LQ, N], d_p [2, LP, N]) in the QP basis."""
    rq, rp = ctx.ring_q, ctx.ring_p
    # Overflow proof: each lazy-centered product is in (-1.6q, 1.6q), so the
    # digit sum is bounded by 1.6*D*q; fring.reduce_once is exact only for
    # |v| < 2^30.  Enforce the bound instead of assuming "D <= 16" (ADVICE r2).
    D = ctx.dec.num_digits
    qmax = max(max(rq.moduli_tuple), max(rp.moduli_tuple))
    if int(1.6 * D * qmax) >= 1 << 30:
        raise ValueError(
            f"ks_mac digit sum overflows int32 reduce_once: "
            f"num_digits={D}, max modulus={qmax} "
            f"(need 1.6*D*q < 2^30)")
    qq, qf = rq.moduli[:, None], rq.qinv_f[:, None]
    pp, pf = rp.moduli[:, None], rp.qinv_f[:, None]
    # dtype=int32: with x64 enabled (CPU tests) jnp.sum would promote to
    # int64 and break the wrapping-int32 invariant of the downstream mulmods
    d_q = jnp.sum(fring.mulmod_lazy_centered(
        key_q, yq[..., :, None, :, :], qq, qf),
        axis=-4, dtype=jnp.int32)
    d_p = jnp.sum(fring.mulmod_lazy_centered(
        key_p, yp[..., :, None, :, :], pp, pf),
        axis=-4, dtype=jnp.int32)
    d_q = fring.canon(fring.reduce_once(d_q, qq, qf), qq)   # [2, LQ, N]
    d_p = fring.canon(fring.reduce_once(d_p, pp, pf), pp)   # [2, LP, N]
    return d_q, d_p


def gadget_product_core(ctx: FastCKKSContext, key_q, key_p, x_ntt):
    """Full hybrid key-switch of an NTT-domain poly against a gadget key:
    decompose, MAC, ModDown (the §3.3 chain with any key)."""
    d_q, d_p = ks_mac(ctx, key_q, key_p, *decompose_ks(ctx, x_ntt))
    return frns.mod_down(d_q, d_p, ctx.mdc, ctx.ring_q, ctx.ring_p, ntt=True)


def gadget_product(ctx: FastCKKSContext, t2):
    """Relinearization key-switch (gadgetProductMultiplePLazy + ModDown,
    core/rlwe/evaluator_gadget_product.go:16-190) on int32 digits."""
    return gadget_product_core(ctx, ctx.rlk_q, ctx.rlk_p, t2)


def _auto_index(ctx: FastCKKSContext, gal_el: int) -> jnp.ndarray:
    from matrix_fhe_tpu.ops.automorphism import automorphism_ntt_index
    n = ctx.ring_q.n
    return jnp.asarray(automorphism_ntt_index(n, 2 * n, gal_el))


def automorphism(ctx: FastCKKSContext, c0, c1, gal_el: int):
    """X^i -> X^{i*galEl} on an NTT-domain degree-1 ciphertext
    (core/rlwe/evaluator_automorphism.go:14-60): gadget product of c1 with
    the galois key, add c0, permute both limbs.  Bit-exact vs the u64
    evaluator.automorphism on the same keys (tests/test_fckks.py)."""
    gk_q, gk_p = ctx.galois_key(gal_el)
    r0, r1 = gadget_product_core(ctx, gk_q, gk_p, c1)
    rq = ctx.ring_q
    d0 = rq.add(r0, c0)
    idx = _auto_index(ctx, gal_el)
    return d0[..., idx], r1[..., idx]


def rotations_hoisted(ctx: FastCKKSContext, c0, c1, gal_els):
    """Many rotations of one ciphertext: decompose ONCE, one MAC+ModDown+
    permute per galois element (RotateHoisted,
    core/rlwe/evaluator_automorphism.go:62-107)."""
    yq, yp = decompose_ks(ctx, c1)
    rq = ctx.ring_q
    out = {}
    for g in gal_els:
        gk_q, gk_p = ctx.galois_key(g)
        d_q, d_p = ks_mac(ctx, gk_q, gk_p, yq, yp)
        r0, r1 = frns.mod_down(d_q, d_p, ctx.mdc, rq, ctx.ring_p, ntt=True)
        idx = _auto_index(ctx, g)
        out[g] = (rq.add(r0, c0)[..., idx], r1[..., idx])
    return out


def mul_relin_rescale(ctx: FastCKKSContext, c0, c1, d0, d1):
    """The flagship step (SURVEY.md §3.3): tensor, relinearize, rescale by
    ``rescale_limbs`` primes.  All arrays int32 [LQ, N], NTT domain."""
    t0, t1, t2 = tensor(ctx, c0, c1, d0, d1)
    r0, r1 = gadget_product(ctx, t2)
    rq = ctx.ring_q
    out0 = rq.add(t0, r0)
    out1 = rq.add(t1, r1)
    nb = ctx.rescale_limbs
    return (frns.div_round_by_last_modulus_many_ntt(rq, out0, nb),
            frns.div_round_by_last_modulus_many_ntt(rq, out1, nb))
