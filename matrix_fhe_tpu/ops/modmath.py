"""Vectorized 64-bit modular arithmetic on device (jnp.uint64).

Device-side counterparts of the reference's scalar reduction primitives
(/root/reference/ring/modular_reduction.go:9-205), vectorized over arbitrary
array shapes.  All semantics are identical at full reduction:

  * ``mred(x, y, q, qinv)``       = x*y*2^-64 mod q            (MRed, :78)
  * ``mred_lazy``                 = same, output in [0, 2q)     (MRedLazy, :90)
  * ``bred(x, y, q, bhi, blo)``   = x*y mod q                   (BRed, :127)
  * ``bred_add(a, q, bhi)``       = a mod q for a < 2^64        (BRedAdd, :110)
  * ``mform(a, q, bhi, blo)``     = a*2^64 mod q                (MForm, :11)
  * ``imform(a, q, qinv)``        = a*2^-64 mod q               (IMForm, :49)
  * ``cred(a, q)``                = a mod q for a in [0, 2q)    (CRed, :200)

Host-side constant generation (`gen_mred_constant`, `gen_bred_constant`)
mirrors GenMRedConstant (:68) / GenBRedConstant (:97) with Python big ints.

TPU note: uint64 is XLA-emulated on TPU (pairs of u32 ops); these functions are
the correctness/parity path.  The throughput path for <2^31 moduli lives in
``matrix_fhe_tpu.ops.pallas_u32``.
"""

from __future__ import annotations

import jax.numpy as jnp

MASK64 = (1 << 64) - 1
_M32 = jnp.uint64(0xFFFFFFFF)
_S32 = jnp.uint64(32)


def u64(x) -> jnp.ndarray:
    return jnp.asarray(x, dtype=jnp.uint64)


# ---------------------------------------------------------------------------
# Host-side constants (Python big ints, exact).
# ---------------------------------------------------------------------------

def gen_mred_constant(q: int) -> int:
    """(q^-1) mod 2^64 (Newton iteration, ring/modular_reduction.go:68-75)."""
    qinv = 1
    for _ in range(6):  # Newton: doubles correct bits; 6 iters > 64 bits
        qinv = (qinv * (2 - q * qinv)) & MASK64
    assert (q * qinv) & MASK64 == 1
    return qinv


def gen_bred_constant(q: int) -> tuple[int, int]:
    """(floor(2^128/q) >> 64, floor(2^128/q) mod 2^64)
    (ring/modular_reduction.go:97-107)."""
    big_r = (1 << 128) // q
    return (big_r >> 64) & MASK64, big_r & MASK64


# ---------------------------------------------------------------------------
# Device-side vectorized primitives.  All inputs broadcast (jnp.uint64).
# ---------------------------------------------------------------------------

def mul64_hi(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """High 64 bits of the 128-bit product a*b (bits.Mul64 high word)."""
    a0, a1 = a & _M32, a >> _S32
    b0, b1 = b & _M32, b >> _S32
    lo_lo = a0 * b0
    hi_lo = a1 * b0
    lo_hi = a0 * b1
    # cross < 2^64: (2^32-2) + (2^32-1) + (2^32-1)^2 < 2^64
    cross = (lo_lo >> _S32) + (hi_lo & _M32) + lo_hi
    return a1 * b1 + (hi_lo >> _S32) + (cross >> _S32)


def mul64_hi_lo(a: jnp.ndarray, b: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(high, low) 64-bit words of a*b (bits.Mul64)."""
    return mul64_hi(a, b), a * b  # wrapping u64 mul == low word


def add64_carry(a: jnp.ndarray, b: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(sum mod 2^64, carry) (bits.Add64)."""
    s = a + b
    return s, (s < a).astype(jnp.uint64)


def cred(a: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """a mod q for a in [0, 2q)."""
    return jnp.where(a >= q, a - q, a)


def mred_lazy(x, y, q, qinv):
    """x*y*2^-64 mod q, output in [0, 2q)."""
    mhi, mlo = mul64_hi_lo(x, y)
    hhi = mul64_hi(mlo * qinv, q)
    return mhi - hhi + q


def mred(x, y, q, qinv):
    """x*y*2^-64 mod q, fully reduced."""
    return cred(mred_lazy(x, y, q, qinv), q)


def imform(a, q, qinv):
    """a*2^-64 mod q (Montgomery -> standard domain)."""
    r = mul64_hi(a * qinv, q)
    r = q - r
    return cred(r, q)


def mform_lazy(a, q, bhi, blo):
    """a*2^64 mod q, output in [0, 2q) (ring/modular_reduction.go:40)."""
    mhi = mul64_hi(a, blo)
    return -((a * bhi + mhi) * q)


def mform(a, q, bhi, blo):
    """a*2^64 mod q (standard -> Montgomery domain)."""
    return cred(mform_lazy(a, q, bhi, blo), q)


def bred_add_lazy(x, q, bhi):
    """x mod q in [0, 2q) for any x < 2^64 (BRedAddLazy)."""
    s0 = mul64_hi(x, bhi)
    return x - s0 * q


def bred_add(a, q, bhi):
    """a mod q for any a < 2^64 (BRedAdd)."""
    return cred(bred_add_lazy(a, q, bhi), q)


def bred_lazy(x, y, q, bhi, blo):
    """x*y mod q in [0, 2q) (full 128-bit Barrett, BRedLazy :166-197)."""
    mhi, mlo = mul64_hi_lo(x, y)
    r = mhi * bhi
    hhi, hlo = mul64_hi_lo(mlo, bhi)
    r += hhi
    lhi = mul64_hi(mlo, blo)
    s0, carry = add64_carry(hlo, lhi)
    r += carry
    hhi2, hlo2 = mul64_hi_lo(mhi, blo)
    r += hhi2
    _, carry2 = add64_carry(hlo2, s0)
    r += carry2
    return mlo - r * q


def bred(x, y, q, bhi, blo):
    """x*y mod q, fully reduced (BRed)."""
    return cred(bred_lazy(x, y, q, bhi, blo), q)


def modsum(x: jnp.ndarray, q: jnp.ndarray, bhi: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Sum of values < 2q along ``axis``, mod q.

    Tree reduction that folds 4 terms per round (safe: 4 * 2q < 2^64 for
    q < 2^61) with a Barrett reduction between rounds.  Used by matmul-form
    NTTs and CRT reconstruction where u64 accumulation would overflow.

    ``q``/``bhi`` must broadcast against ``x`` with the reduction axis removed.
    """
    x = jnp.moveaxis(x, axis, -1)
    qe, be = jnp.asarray(q)[..., None], jnp.asarray(bhi)[..., None]
    while x.shape[-1] > 1:
        n = x.shape[-1]
        pad = (-n) % 4
        if pad:
            x = jnp.concatenate([x, jnp.zeros(x.shape[:-1] + (pad,), x.dtype)], axis=-1)
        x = x.reshape(x.shape[:-1] + ((n + pad) // 4, 4)).sum(axis=-1, dtype=jnp.uint64)
        x = bred_add_lazy(x, qe, be)
    return bred_add(x[..., 0], q, bhi)
