"""WideRing: RNS ring over 41-55-bit moduli with int32 pair residues.

The wide fast path for the reference's production prime sets
(schemes/ckks/example_parameters.go PN14QP438: 45/55-bit primes) — the
counterpart of ops/rings.py:Ring (u64 parity path) and fast/fring.py
(<2^23 narrow path).  Residues are centered base-2^25 int32 pairs
[..., 2, L, N] (ops/wide.py); the NTT is the 7-digit-plane four-step MXU
kernel (ops/wide_ntt.py).  Duck-types the Ring surface used by the
fckks-style composites (add/sub/neg/mul_*/scalar ops/ntt/intt/at_level).

Canonical form at op boundaries: centered, |x| <= 0.51q (use
wide.unpack_pair for the [0, q) form); bit-exactness vs the u64 path is
pinned in tests/test_wring.py at those boundaries.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from matrix_fhe_tpu.ops import wide, wide_ntt


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["tabs", "ntt_tabs"],
    meta_fields=["n", "nth_root", "ring_type", "moduli_tuple"],
)
@dataclasses.dataclass(frozen=True)
class WideRing:
    n: int
    nth_root: int
    ring_type: str
    moduli_tuple: tuple[int, ...]
    tabs: wide.WideTables
    ntt_tabs: wide_ntt.WideNTTTables

    @property
    def level(self) -> int:
        return len(self.moduli_tuple) - 1

    @property
    def num_limbs(self) -> int:
        return len(self.moduli_tuple)

    @property
    def moduli(self) -> jnp.ndarray:  # parity with FastRing ([L] int64 here)
        return jnp.asarray(np.array(self.moduli_tuple, dtype=np.int64))

    def at_level(self, level: int) -> "WideRing":
        if level == self.level:
            return self
        if level > self.level:
            raise ValueError(
                f"at_level({level}) above the built level {self.level}")
        s = slice(0, level + 1)
        nt = self.ntt_tabs
        sliced = wide_ntt.WideNTTTables(
            n=nt.n, rows=nt.rows, cols=nt.cols,
            a7=nt.a7[s], b7=nt.b7[s], tw=nt.tw[:, s],
            a7i=nt.a7i[s], b7i=nt.b7i[s], twi=nt.twi[:, s],
            wt=self.tabs.at_level(level))
        return dataclasses.replace(
            self, moduli_tuple=self.moduli_tuple[s],
            tabs=self.tabs.at_level(level), ntt_tabs=sliced)

    def limb_band(self, start: int, end: int) -> "WideRing":
        """View of limbs [start, end) (decomposer digit bands)."""
        s = slice(start, end)
        nt = self.ntt_tabs
        tb = self.tabs.limb_slice(s)
        sliced = wide_ntt.WideNTTTables(
            n=nt.n, rows=nt.rows, cols=nt.cols,
            a7=nt.a7[s], b7=nt.b7[s], tw=nt.tw[:, s],
            a7i=nt.a7i[s], b7i=nt.b7i[s], twi=nt.twi[:, s],
            wt=tb)
        return dataclasses.replace(
            self, moduli_tuple=self.moduli_tuple[s], tabs=tb, ntt_tabs=sliced)

    def modulus_at_level(self, level: int | None = None) -> int:
        level = self.level if level is None else level
        m = 1
        for q in self.moduli_tuple[: level + 1]:
            m *= q
        return m

    # -- elementwise pair ops ------------------------------------------------
    def add(self, p1, p2):
        return wide.add(self.tabs, p1, p2)

    def sub(self, p1, p2):
        return wide.sub(self.tabs, p1, p2)

    def neg(self, p1):
        return wide.neg(self.tabs, p1)

    def mform(self, p1):
        return p1

    def imform(self, p1):
        return p1

    def mul_coeffs_montgomery(self, p1, p2):
        return wide.mulmod(self.tabs, p1, p2)

    def mul_coeffs_barrett(self, p1, p2):
        return wide.mulmod(self.tabs, p1, p2)

    def mul_coeffs_montgomery_then_add(self, p1, p2, p3):
        return self.add(self.mul_coeffs_montgomery(p1, p2), p3)

    def mul_scalar_montgomery(self, p1, scalar):
        """scalar: per-limb ints ([L] array/list or python int applied
        mod each q)."""
        return wide.mulmod_planes(self.tabs, p1, self._scalar_planes(scalar))

    def _scalar_planes(self, scalar):
        if isinstance(scalar, int):
            vals = [scalar % q for q in self.moduli_tuple]
        else:
            vals = [int(v) for v in np.asarray(scalar)]
        return wide.const_planes(self.tabs, vals)

    def add_scalar(self, p1, scalar):
        return self.add(p1, self._scalar_pair(scalar, p1.shape))

    def sub_scalar(self, p1, scalar):
        return self.sub(p1, self._scalar_pair(scalar, p1.shape))

    def _scalar_pair(self, scalar, shape):
        if isinstance(scalar, int):
            vals = np.array([scalar % q for q in self.moduli_tuple],
                            dtype=np.uint64)
        else:
            vals = np.asarray(scalar, dtype=np.uint64)
        del shape  # broadcasting over [.., 2, L, N] handles the coeff axis
        pair = wide.pack_pair(vals[:, None], self.moduli_tuple,
                              pair31=self.tabs.shift == 31)  # [2, L, 1]
        return jnp.asarray(pair)

    # -- NTT -----------------------------------------------------------------
    def ntt(self, p):
        return wide_ntt.ntt_fwd(p, self.ntt_tabs)

    def intt(self, p):
        return wide_ntt.ntt_bwd(p, self.ntt_tabs)

    def new_poly(self, batch: tuple[int, ...] = ()) -> jnp.ndarray:
        return jnp.zeros(batch + (2, self.num_limbs, self.n),
                         dtype=jnp.int32)


def new_wide_ring(n: int, moduli, pair31: bool | None = None) -> WideRing:
    """``pair31`` selects the 6-plane/base-2^31 mode (61-bit support); None
    derives it from ``moduli``.  Context builders must pass the mode of the
    FULL parameter set (q and p) so every ring of one context matches."""
    if n < 16 or n & (n - 1):
        raise ValueError("N must be a power of two >= 16")
    moduli = [int(q) for q in moduli]
    if len(set(moduli)) != len(moduli):
        raise ValueError("moduli must be distinct")
    ntt_tabs = wide_ntt.build_tables(n, moduli, pair31=pair31)
    return WideRing(
        n=n, nth_root=2 * n, ring_type="standard",
        moduli_tuple=tuple(moduli), tabs=ntt_tabs.wt, ntt_tabs=ntt_tabs)
