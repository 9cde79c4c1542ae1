"""matrix_fhe_tpu — a TPU-native lattice-FHE framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
swanhong/matrix-fhe-lattigo (a Lattigo v6 fork): full-RNS Ring-LWE primitives,
CKKS / BGV-BFV / matrix-CKKS schemes over power-of-two, conjugate-invariant and
3N-friendly (N = 2^a*3^b) rings, homomorphic circuits (linear transforms,
polynomial evaluation, bootstrapping) and multiparty protocols.

Design stance (TPU-first, not a port):
  * Polynomials are dense device arrays ``uint64[L, N]`` (RNS-limb-major, like
    the reference's ``Poly.Coeffs``; see /root/reference/ring/poly.go:18), with
    optional leading batch axes handled by ``jax.vmap``.
  * All evaluators are pure functions of (params, keys, operands) — the
    reference's mutable-evaluator + ShallowCopy concurrency idiom
    (core/rlwe/evaluator.go:240) is replaced by jit/vmap/pjit.
  * Host precomputation (prime search, roots, Montgomery/Barrett constants,
    ModUp tables, BSGS plans) mirrors the reference's table generation
    bit-for-bit; device code consumes them as pytree leaves.
  * Multi-chip scaling shards the RNS-limb axis (zero-communication for NTT and
    vector ops) and the coefficient axis (butterfly super-stages exchanged via
    collectives) over a ``jax.sharding.Mesh``; see matrix_fhe_tpu.parallel.
"""

import jax as _jax

# 64-bit integer arithmetic everywhere (TPU emulates u64; CPU is native).
_jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"
