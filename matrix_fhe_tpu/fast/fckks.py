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
    data_fields=["ring_q", "ring_p", "dec", "mdc", "rlk_q", "rlk_p"],
    meta_fields=["rescale_limbs"],
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
    rescale_limbs: int               # limbs dropped per rescale (pair = 2)


def make_context(params, rlk, rescale_limbs: int = 2) -> FastCKKSContext:
    """Build the fast context from u64-path parameters + relinearization key
    (keys are converted Montgomery->plain; values < 2^23 cast to int32)."""
    Q, P = list(params.q), list(params.p)
    ring_q = fring.new_fast_ring(params.n, Q)
    ring_p = fring.new_fast_ring(params.n, P)

    uq = params.ring_q
    up = params.ring_p
    rlk_q = np.asarray(uq.imform(rlk.gadget.q)).astype(np.int64)
    rlk_p = np.asarray(up.imform(rlk.gadget.p)).astype(np.int64)
    return FastCKKSContext(
        ring_q=ring_q, ring_p=ring_p,
        dec=frns.gen_fast_decomposer(Q, P),
        mdc=frns.gen_fast_moddown_constants(Q, P),
        rlk_q=jnp.asarray(rlk_q.astype(np.int32)),
        rlk_p=jnp.asarray(rlk_p.astype(np.int32)),
        rescale_limbs=rescale_limbs,
    )


def tensor(ctx: FastCKKSContext, c0, c1, d0, d1):
    """NTT-domain degree-2 tensor (evaluator.go:786-865): plain f32-Shoup
    multiplies, no Montgomery forms."""
    rq = ctx.ring_q
    t0 = rq.mul_coeffs_montgomery(c0, d0)
    t1 = rq.add(rq.mul_coeffs_montgomery(c0, d1),
                rq.mul_coeffs_montgomery(c1, d0))
    t2 = rq.mul_coeffs_montgomery(c1, d1)
    return t0, t1, t2


def gadget_product(ctx: FastCKKSContext, t2):
    """Hybrid key-switch core (gadgetProductMultiplePLazy + ModDown,
    core/rlwe/evaluator_gadget_product.go:16-190) on int32 digits.

    MAC accumulation is lazy-centered: each digit product is in (-1.6q, 1.6q)
    so the sum over <= 16 digits stays < 2^28, one reduce_once + canon
    restores canonical form before ModDown."""
    rq, rp = ctx.ring_q, ctx.ring_p
    qq, qf = rq.moduli[:, None], rq.qinv_f[:, None]
    pp, pf = rp.moduli[:, None], rp.qinv_f[:, None]
    x_inv = rq.intt(t2)

    acc = [None] * 4  # d0q, d1q, d0p, d1p
    for i in range(ctx.dec.num_digits):
        yq, yp = frns.decompose_single_ntt(ctx.dec, i, t2, x_inv, rq, rp)
        prods = (
            fring.mulmod_lazy_centered(ctx.rlk_q[i, 0], yq, qq, qf),
            fring.mulmod_lazy_centered(ctx.rlk_q[i, 1], yq, qq, qf),
            fring.mulmod_lazy_centered(ctx.rlk_p[i, 0], yp, pp, pf),
            fring.mulmod_lazy_centered(ctx.rlk_p[i, 1], yp, pp, pf),
        )
        acc = [p if a is None else a + p for a, p in zip(acc, prods)]

    d0q = fring.canon(fring.reduce_once(acc[0], qq, qf), qq)
    d1q = fring.canon(fring.reduce_once(acc[1], qq, qf), qq)
    d0p = fring.canon(fring.reduce_once(acc[2], pp, pf), pp)
    d1p = fring.canon(fring.reduce_once(acc[3], pp, pf), pp)

    d0 = frns.mod_down(d0q, d0p, ctx.mdc, rq, rp, ntt=True)
    d1 = frns.mod_down(d1q, d1p, ctx.mdc, rq, rp, ntt=True)
    return d0, d1


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
