"""FastRing: RNS ring over <2^23 moduli with int32 residues.

The native TPU fast path (SURVEY.md §7.1).  Replaces the reference's 64-bit
Montgomery/Barrett scalar kernels (/root/reference/ring/modular_reduction.go,
ring/vec_ops.go) with:

  * int32 storage, values canonical in [0, q) at op boundaries;
  * float32 Shoup reductions: r = a*b - rint(f32(a)*f32(b)/q)*q computed in
    *wrapping* int32 (exact: the true remainder is a few q < 2^31, and
    wrapping arithmetic preserves it mod 2^32).  No Montgomery domain is
    needed — ``mform`` is the identity and ``mul_coeffs_montgomery`` is a
    plain modular multiply, so fully-reduced op boundaries match the u64
    parity path (ops/rings.py) bit-for-bit;
  * NTT/INTT via the fused Pallas four-step MXU kernel (ops/pallas_ntt2.py)
    on TPU, and the jnp MXU form (ops/mxu_ntt.py) elsewhere — both bit-exact
    to the reference's ring/ntt.go tables.

Duck-types the ``ops.rings.Ring`` surface (add/sub/neg/mul_*/ntt/intt/
at_level/...) so scheme-level code can run unchanged on either path.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from matrix_fhe_tpu.ops import mxu_ntt, pallas_ntt2

MAX_FAST_MODULUS = pallas_ntt2.MAX_V2_MODULUS  # 2^23


# ---------------------------------------------------------------------------
# Scalar helpers (jnp, XLA-fused; all exact for q < 2^23).
# ---------------------------------------------------------------------------

def _rint_i32(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.rint(a).astype(jnp.int32)


def center(v: jnp.ndarray, q_i) -> jnp.ndarray:
    """[0, q) -> (-q/2, q/2]."""
    return jnp.where(v > q_i >> 1, v - q_i, v)


def canon(v: jnp.ndarray, q_i) -> jnp.ndarray:
    """(-2q, 2q) int32 -> [0, q)."""
    v = jnp.where(v >= q_i, v - q_i, v)
    v = jnp.where(v < 0, v + q_i, v)
    return jnp.where(v < 0, v + q_i, v)


def reduce_once(v: jnp.ndarray, q_i, qinv_f) -> jnp.ndarray:
    """v - rint(f32(v)/q)*q for |v| < 2^30: result in (-1.6q, 1.6q)
    (f32(v) rounds with err <= 64, so the multiple is within ~1 of nearest)."""
    m = _rint_i32(v.astype(jnp.float32) * qinv_f)
    return v - m * q_i


def mulmod(a: jnp.ndarray, b: jnp.ndarray, q_i, qinv_f) -> jnp.ndarray:
    """a*b mod q in [0, q) for canonical a, b in [0, q), q < 2^23.

    Centered operands keep |ab| < 0.25 q^2 < 2^44; m = rint(f32(a)f32(b)/q)
    is within ~1.3 of the true ratio (f32 products of exact <2^23 ints have
    2^-24 relative error), so the wrapping-int32 remainder is in (-2.5q, 2.5q)
    and one reduce_once + canon restores [0, q)."""
    ac = center(a, q_i)
    bc = center(b, q_i)
    p = ac * bc  # wrapping int32; exact mod 2^32
    m = _rint_i32(ac.astype(jnp.float32) * bc.astype(jnp.float32) * qinv_f)
    r = p - m * q_i
    return canon(reduce_once(r, q_i, qinv_f), q_i)


def mulmod_lazy_centered(a, b, q_i, qinv_f):
    """Like mulmod but keeps the result centered in (-1.6q, 1.6q)."""
    ac = center(a, q_i)
    bc = center(b, q_i)
    p = ac * bc
    m = _rint_i32(ac.astype(jnp.float32) * bc.astype(jnp.float32) * qinv_f)
    return reduce_once(p - m * q_i, q_i, qinv_f)


def ptile_pad(B: int) -> tuple[int, int]:
    """(poly-tile, batch padding) for the fused Pallas NTT on a batch of B
    polynomials.  Mosaic requires the second-to-last block dim to be a
    multiple of 8 OR equal to the array dim, so the only legal tiles are
    ptile == 8 (with B padded to a multiple of 8) or ptile == B for B < 8
    (ADVICE r2, high)."""
    if B % 8 == 0:
        return 8, 0
    if B < 8:
        return B, 0
    return 8, (-B) % 8


# ---------------------------------------------------------------------------
# Table slicing helper (at_level views over [L, ...] table stacks).
# ---------------------------------------------------------------------------

def _slice_tables(tabs, s: slice):
    kws = {}
    for f in dataclasses.fields(tabs):
        v = getattr(tabs, f.name)
        kws[f.name] = v[s] if isinstance(v, jnp.ndarray) and v.ndim >= 1 \
            and v.shape[0] != 0 else v
    for meta in ("n", "rows", "cols"):
        kws[meta] = getattr(tabs, meta)
    return type(tabs)(**kws)


# ---------------------------------------------------------------------------
# FastRing pytree.
# ---------------------------------------------------------------------------

@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["moduli", "qinv_f", "v2_tabs", "mxu_tabs"],
    meta_fields=["n", "nth_root", "ring_type", "moduli_tuple"],
)
@dataclasses.dataclass(frozen=True)
class FastRing:
    """RNS ring over int32 residues (fast path of ops/rings.py:Ring)."""

    n: int
    nth_root: int
    ring_type: str
    moduli_tuple: tuple[int, ...]

    moduli: jnp.ndarray    # int32 [L]
    qinv_f: jnp.ndarray    # f32 [L]  (1/q)
    v2_tabs: pallas_ntt2.NTT2Tables | None   # TPU fused kernel tables
    mxu_tabs: mxu_ntt.MxuNTTTables           # jnp fallback tables

    # -- level views ---------------------------------------------------------
    @property
    def level(self) -> int:
        return len(self.moduli_tuple) - 1

    @property
    def num_limbs(self) -> int:
        return len(self.moduli_tuple)

    def at_level(self, level: int) -> "FastRing":
        if level == self.level:
            return self
        if level > self.level:
            raise ValueError(
                f"at_level({level}) above the built level {self.level}")
        s = slice(0, level + 1)
        return dataclasses.replace(
            self,
            moduli_tuple=self.moduli_tuple[s],
            moduli=self.moduli[s], qinv_f=self.qinv_f[s],
            v2_tabs=None if self.v2_tabs is None
            else _slice_tables(self.v2_tabs, s),
            mxu_tabs=_slice_tables(self.mxu_tabs, s),
        )

    def modulus_at_level(self, level: int | None = None) -> int:
        level = self.level if level is None else level
        m = 1
        for q in self.moduli_tuple[: level + 1]:
            m *= q
        return m

    # -- broadcasting helpers ------------------------------------------------
    def _q(self):
        return self.moduli[:, None]

    def _qf(self):
        return self.qinv_f[:, None]

    # -- elementwise ops (int32 [.., L, N] canonical in [0, q)) --------------
    def add(self, p1, p2):
        s = p1 + p2
        return jnp.where(s >= self._q(), s - self._q(), s)

    def add_lazy(self, p1, p2):
        return p1 + p2

    def sub(self, p1, p2):
        d = p1 - p2
        return jnp.where(d < 0, d + self._q(), d)

    def neg(self, p1):
        return jnp.where(p1 == 0, p1, self._q() - p1)

    def reduce(self, p1):
        return canon(reduce_once(p1, self._q(), self._qf()), self._q())

    def mform(self, p1):
        return p1

    def imform(self, p1):
        return p1

    def mul_coeffs_montgomery(self, p1, p2):
        return mulmod(p1, p2, self._q(), self._qf())

    def mul_coeffs_montgomery_then_add(self, p1, p2, p3):
        return self.add(self.mul_coeffs_montgomery(p1, p2), p3)

    def mul_coeffs_montgomery_then_sub(self, p1, p2, p3):
        return self.sub(p3, self.mul_coeffs_montgomery(p1, p2))

    def mul_coeffs_barrett(self, p1, p2):
        return mulmod(p1, p2, self._q(), self._qf())

    def mul_scalar_montgomery(self, p1, scalar):
        """scalar: [L] per-limb int32 values (plain domain)."""
        return mulmod(p1, jnp.asarray(scalar, jnp.int32)[:, None],
                      self._q(), self._qf())

    def add_scalar(self, p1, scalar):
        s = self._scalar_limbs(scalar)[:, None]
        return self.add(p1, jnp.broadcast_to(s, p1.shape))

    def sub_scalar(self, p1, scalar):
        s = self._scalar_limbs(scalar)[:, None]
        return self.sub(p1, jnp.broadcast_to(s, p1.shape))

    def _scalar_limbs(self, scalar) -> jnp.ndarray:
        if isinstance(scalar, int):
            return jnp.array([scalar % q for q in self.moduli_tuple],
                             dtype=jnp.int32)
        return jnp.asarray(scalar, dtype=jnp.int32)

    # -- NTT ------------------------------------------------------------------
    def _use_pallas(self) -> bool:
        return (self.v2_tabs is not None
                and jax.default_backend() not in ("cpu",))

    def ntt(self, p: jnp.ndarray) -> jnp.ndarray:
        return self._transform(p, fwd=True)

    def intt(self, p: jnp.ndarray) -> jnp.ndarray:
        return self._transform(p, fwd=False)

    def _transform(self, p: jnp.ndarray, fwd: bool) -> jnp.ndarray:
        *lead, L, N = p.shape
        if self._use_pallas():
            x = p.reshape(-1, L, N)
            ptile, pad = ptile_pad(x.shape[0])
            if pad:
                x = jnp.concatenate(
                    [x, jnp.zeros((pad, L, N), x.dtype)], axis=0)
            fn = pallas_ntt2.ntt_fwd if fwd else pallas_ntt2.ntt_bwd
            out = fn(x, self.v2_tabs, ptile=ptile)
            if pad:
                out = out[:-pad]
            return out.reshape(*lead, L, N)
        fn = mxu_ntt.ntt_fwd if fwd else mxu_ntt.ntt_bwd
        return fn(p, self.mxu_tabs)

    def new_poly(self, batch: tuple[int, ...] = ()) -> jnp.ndarray:
        return jnp.zeros(batch + (self.num_limbs, self.n), dtype=jnp.int32)


def find_fast_primes(n: int, count: int) -> list[int]:
    """NTT-friendly primes < 2^23 for degree n, largest first."""
    return pallas_ntt2.find_v2_primes(n, count)


def new_fast_ring(n: int, moduli: list[int]) -> FastRing:
    """Standard (power-of-two negacyclic) fast ring over <2^23 primes."""
    if n < 16 or n & (n - 1):
        raise ValueError("N must be a power of two >= 16")
    for q in moduli:
        if q >= MAX_FAST_MODULUS:
            raise ValueError(f"modulus {q} too large for the fast path")
    if len(set(moduli)) != len(moduli):
        raise ValueError("moduli must be distinct")

    logn = n.bit_length() - 1
    R, C = 1 << (logn // 2), 1 << (logn - logn // 2)
    v2 = pallas_ntt2.build_tables(n, moduli) if min(R, C) >= 128 else None
    mxu = mxu_ntt.build_tables(n, moduli)
    return FastRing(
        n=n, nth_root=2 * n, ring_type="standard",
        moduli_tuple=tuple(moduli),
        moduli=jnp.asarray(np.array(moduli, dtype=np.int32)),
        qinv_f=jnp.asarray(1.0 / np.array(moduli, dtype=np.float32)),
        v2_tabs=v2, mxu_tabs=mxu,
    )
