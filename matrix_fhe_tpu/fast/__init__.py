"""The TPU-native fast path: int32 residues over <2^23 moduli.

SURVEY.md §7.1 design stance: "choose ≤31-bit moduli chains as the native
fast path" — on TPU (no 64-bit multiplier, 32-bit VPU + int8/bf16 MXU) the
speed-of-light representation is int32 residues with float32 Shoup-style
reductions and the fused Pallas four-step MXU NTT (ops/pallas_ntt2.py).

This package mirrors the value semantics of the u64 parity path
(ops/rings.py, ops/rns_tools.py, rlwe/, schemes/ckks/) on word-size-reduced
parameter sets: many ~22-bit primes instead of few 45/55-bit primes, with
rescaling by *pairs* of primes so the CKKS scale budget per level (~2^44)
matches the reference's 45-bit parameter sets.  Every kernel is validated
bit-exact against the u64 path on the same moduli.
"""

from matrix_fhe_tpu.fast.fring import FastRing, new_fast_ring  # noqa: F401
from matrix_fhe_tpu.fast import fckks, fring, frns  # noqa: F401
