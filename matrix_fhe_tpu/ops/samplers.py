"""Polynomial samplers as pure functions of a JAX PRNG key.

Counterpart of /root/reference/ring/sampler*.go.  The reference draws from a
blake2b XOF (utils/sampling/prng.go:20); we use JAX's counter-based threefry
keys, which preserves the seeded-CRS semantics (same key => same polynomial on
every host, multiparty/crs.go:10) while being TPU-native.  Distributions match
the reference exactly; byte streams intentionally do not (randomness is not
part of the bit-exactness contract, SURVEY.md section 7.1).

Distributions (ring/sampler.go:102-139):
  * uniform: rejection sampling on masked 64-bit words (sampler_uniform.go:46).
  * discrete Gaussian (sigma, bound): round(|N(0, sigma^2)|) rejected at bound,
    with random sign (sampler_gaussian.go:159-175).
  * ternary with density: P(0) = 1-P, P(+-1) = P/2 each (sampler_ternary.go).
  * ternary with Hamming weight h: exactly h uniform +-1 entries.
"""

from __future__ import annotations

import dataclasses
from typing import Union

import jax
import jax.numpy as jnp

from matrix_fhe_tpu.ops import rings as rg


@dataclasses.dataclass(frozen=True)
class DiscreteGaussian:
    """ring/sampler.go:102: sigma = std-dev, bound = max abs coefficient."""
    sigma: float
    bound: float


@dataclasses.dataclass(frozen=True)
class Ternary:
    """ring/sampler.go:126: exactly one of (p, h) set; p = nonzero density,
    h = Hamming weight."""
    p: float | None = None
    h: int | None = None


Distribution = Union[DiscreteGaussian, Ternary, None]


def uniform_poly(key: jax.Array, ring: rg.Ring, batch: tuple[int, ...] = ()) -> jnp.ndarray:
    """Uniform in [0, q_i) per limb, exact (mask-and-reject)."""
    shape = batch + (ring.num_limbs, ring.n)
    q = ring.moduli[:, None]
    # mask = 2^ceil(log2 q) - 1, computed on host from static moduli.
    mask = jnp.array([(1 << int(m).bit_length()) - 1 for m in ring.moduli_tuple],
                     dtype=jnp.uint64)[:, None]

    def draw(k):
        return jax.random.bits(k, shape, dtype=jnp.uint64) & mask

    def cond(state):
        _, x = state
        return jnp.any(x >= q)

    def body(state):
        k, x = state
        k, sub = jax.random.split(k)
        fresh = draw(sub)
        return k, jnp.where(x >= q, fresh, x)

    key, sub = jax.random.split(key)
    _, out = jax.lax.while_loop(cond, body, (key, draw(sub)))
    return out


def gaussian_poly(key: jax.Array, ring: rg.Ring, xe: DiscreteGaussian,
                  batch: tuple[int, ...] = (), montgomery: bool = False) -> jnp.ndarray:
    """Truncated rounded Gaussian, replicated to every RNS limb
    (sampler_gaussian.go:159-175 semantics: |N(0,1)|*sigma rejected at bound,
    rounded, random sign; here reject=clamp-resample via while_loop)."""
    shape = batch + (ring.n,)

    def draw(k):
        k1, k2 = jax.random.split(k)
        mag = jnp.abs(jax.random.normal(k1, shape, dtype=jnp.float32)) * xe.sigma
        sign = jax.random.bits(k2, shape, dtype=jnp.uint32) & 1
        return mag, sign

    def cond(state):
        _, mag, _ = state
        return jnp.any(mag > xe.bound)

    def body(state):
        k, mag, sign = state
        k, sub = jax.random.split(k)
        m2, s2 = draw(sub)
        bad = mag > xe.bound
        return k, jnp.where(bad, m2, mag), jnp.where(bad, s2, sign)

    key, sub = jax.random.split(key)
    mag, sign = draw(sub)
    _, mag, sign = jax.lax.while_loop(cond, body, (key, mag, sign))

    v = (mag + 0.5).astype(jnp.uint64)[..., None, :]  # round
    sign = sign.astype(jnp.uint64)[..., None, :]
    q = ring.moduli[:, None]
    # value = v if sign else q - v (mod q; reference leaves q unreduced for
    # v = 0, we fully reduce — indistinguishable mod q).
    out = jnp.where(sign == 1, v, jnp.where(v == 0, jnp.uint64(0), q - v))
    if montgomery:
        out = ring.mform(out)
    return out


def ternary_poly(key: jax.Array, ring: rg.Ring, xs: Ternary,
                 batch: tuple[int, ...] = (), montgomery: bool = False) -> jnp.ndarray:
    """Ternary secret distribution; values in {-1, 0, 1} lifted to each limb."""
    shape = batch + (ring.n,)
    k1, k2 = jax.random.split(key)
    if xs.h is not None:
        base = jnp.broadcast_to(jnp.concatenate([
            jnp.ones(xs.h, dtype=jnp.int8),
            jnp.zeros(ring.n - xs.h, dtype=jnp.int8)]), shape)
        signs = 1 - 2 * (jax.random.bits(k1, shape, dtype=jnp.uint32)
                         & 1).astype(jnp.int8)
        # independent permutation per batch element (vmapped axis=-1 perm)
        vals = jax.random.permutation(k2, base * signs, axis=-1,
                                      independent=True)
    else:
        p = 2.0 / 3.0 if xs.p is None else xs.p
        u = jax.random.uniform(k1, shape, dtype=jnp.float32)
        nonzero = u < p
        signs = 1 - 2 * (jax.random.bits(k2, shape, dtype=jnp.uint32) & 1).astype(jnp.int8)
        vals = jnp.where(nonzero, signs, jnp.int8(0))
    q = ring.moduli[:, None]
    v = vals[..., None, :]
    out = jnp.where(v == 1, jnp.uint64(1), jnp.where(v == -1, q - 1, jnp.uint64(0)))
    if montgomery:
        out = ring.mform(out)
    return out


def sample(key: jax.Array, ring: rg.Ring, x: Distribution,
           montgomery: bool = False) -> jnp.ndarray:
    """Dispatch on distribution type (ring/sampler.go:64 NewSampler)."""
    if isinstance(x, DiscreteGaussian):
        return gaussian_poly(key, ring, x, montgomery=montgomery)
    if isinstance(x, Ternary):
        return ternary_poly(key, ring, x, montgomery=montgomery)
    raise TypeError(f"unsupported distribution {x!r}")
