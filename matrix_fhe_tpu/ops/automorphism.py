"""Galois automorphisms X^i -> X^{i*k} as precomputed device gathers.

Counterpart of /root/reference/ring/automorphism.go: the NTT-domain
automorphism is a pure permutation of slots (host-precomputed index,
AutomorphismNTTIndex :12-34); the coefficient-domain automorphism is a
permutation with sign flips (:111-176)."""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from matrix_fhe_tpu.ops import modmath as mm
from matrix_fhe_tpu.ops import rings as rg


def _bit_reverse_array(x: np.ndarray, nbits: int) -> np.ndarray:
    r = np.zeros_like(x)
    t = x.copy()
    for _ in range(nbits):
        r = (r << 1) | (t & 1)
        t >>= 1
    return r


@functools.lru_cache(maxsize=None)
def automorphism_ntt_index(n: int, nth_root: int, gal_el: int) -> np.ndarray:
    """Permutation index for the NTT-domain automorphism
    (ring/automorphism.go:12-34): out[i] = in[index[i]]."""
    if n & (n - 1) or nth_root & (nth_root - 1):
        raise ValueError("N and NthRoot must be powers of two")
    # bits.Len64(NthRoot-1) - 1 == log2(NthRoot) - 1 (ring/automorphism.go:23)
    log_nth = (nth_root - 1).bit_length() - 1
    mask = nth_root - 1
    i = np.arange(n, dtype=np.uint64)
    tmp1 = 2 * _bit_reverse_array(i, log_nth) + 1
    tmp2 = ((np.uint64(gal_el) * tmp1 & np.uint64(mask)) - 1) >> np.uint64(1)
    return _bit_reverse_array(tmp2, log_nth).astype(np.int32)


@functools.lru_cache(maxsize=None)
def automorphism_ntt_index_3n(n: int, nth_root: int, gal_el: int) -> np.ndarray:
    """NTT-domain automorphism on the 3N/Matrix ring: the transform
    evaluates at x_k = omega^{E[k]} (E = sorted totatives of 3N,
    ring/ntt_3n.go:234-243), and X -> X^g maps the evaluation at x to the
    evaluation at x^g, i.e. a permutation of the totative set."""
    import math
    if math.gcd(gal_el, nth_root) != 1:
        raise ValueError(f"galois element {gal_el} not coprime to {nth_root}")
    E = [e for e in range(1, nth_root) if math.gcd(e, nth_root) == 1]
    pos = {e: k for k, e in enumerate(E)}
    # out[i] = p(x_i^g) = eval of p at omega^{E[i]*g}
    return np.array([pos[(E[i] * gal_el) % nth_root] for i in range(n)],
                    dtype=np.int32)


def automorphism_ntt(ring: rg.Ring, p: jnp.ndarray, gal_el: int) -> jnp.ndarray:
    if ring.ring_type == rg.MATRIX:
        idx = jnp.asarray(automorphism_ntt_index_3n(ring.n, ring.nth_root, gal_el))
    else:
        idx = jnp.asarray(automorphism_ntt_index(ring.n, ring.nth_root, gal_el))
    return p[..., idx]


def automorphism_coeff(ring: rg.Ring, p: jnp.ndarray, gal_el: int) -> jnp.ndarray:
    """Coefficient-domain automorphism (ring/automorphism.go:111-176).

    For standard rings: out[(i*k) mod N] = (-1)^{floor(i*k/N)} in[i].
    (We output fully-reduced values; the reference may leave q for -0.)
    """
    n = ring.n
    if ring.ring_type == rg.STANDARD:
        i = np.arange(n, dtype=np.uint64)
        raw = i * np.uint64(gal_el)
        dst = (raw & np.uint64(n - 1)).astype(np.int64)
        sign = ((raw >> np.uint64(n.bit_length() - 1)) & 1).astype(np.int64)
        # inverse map: src[dst[i]] = i (gal_el odd => bijection)
        src = np.zeros(n, dtype=np.int64)
        src[dst] = np.arange(n)
        flip = np.zeros(n, dtype=np.int64)
        flip[dst] = sign
        g = p[..., jnp.asarray(src)]
        q = ring.moduli[:, None]
        neg = jnp.where(g == 0, jnp.uint64(0), q - g)
        return jnp.where(jnp.asarray(flip) == 1, neg, g)
    if ring.ring_type == rg.CONJUGATE_INVARIANT:
        # ring/automorphism.go:122-154: fold through the 2N-degree cover.
        two_n = 2 * n
        mask = two_n - 1
        logn = mask.bit_length()
        src = np.zeros(n, dtype=np.int64)
        flip = np.zeros(n, dtype=np.int64)
        for i in range(two_n):
            raw = i * gal_el
            index = raw & mask
            tmp = (raw >> logn) & 1
            if index < n:
                idx = i
                if idx >= n:
                    idx = two_n - idx
                    tmp ^= 1
                src[index] = idx
                flip[index] = tmp
        g = p[..., jnp.asarray(src)]
        q = ring.moduli[:, None]
        neg = jnp.where(g == 0, jnp.uint64(0), q - g)
        return jnp.where(jnp.asarray(flip) == 1, neg, g)
    raise NotImplementedError("automorphism on 3N rings is not defined by the reference")


def shift(p: jnp.ndarray, k: int) -> jnp.ndarray:
    """Cyclic coefficient shift (ring/operations.go:278)."""
    return jnp.roll(p, -k, axis=-1)


def mult_by_monomial(ring: rg.Ring, p: jnp.ndarray, k: int) -> jnp.ndarray:
    """p * X^k in Z_q[X]/(X^N+1) (ring/operations.go:306): negacyclic rotate.

    out[j] = (-1)^w p[i] with i = (j - k) mod N and w = floor((i + m)/N) & 1,
    m = k mod 2N.
    """
    n = ring.n
    m = k % (2 * n)
    j = np.arange(n, dtype=np.int64)
    src = (j - m) % n
    flip = ((src + m) // n) & 1
    g = p[..., jnp.asarray(src)]
    q = ring.moduli[:, None]
    neg = jnp.where(g == 0, jnp.uint64(0), q - g)
    return jnp.where(jnp.asarray(flip) == 1, neg, g)
