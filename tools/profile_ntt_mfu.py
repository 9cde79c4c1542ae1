"""NTT MFU attribution: time kernel variants to find the non-MXU cost.

VERDICT r4 next #4: mxu_util ~0.20 at hbm_frac ~0.17 means the fused NTT
chain is compute-inefficient, not bandwidth-starved.  The kernel per
(poly, limb) does: digit bitcast -> int8 matmul -> Horner recombination
(5 rint-reduce rounds) -> Shoup twiddle (7 ops) -> per-poly transpose x2
-> second matmul + recombination.  The MXU work is fixed; everything else
is VPU/relayout work that serializes with it.

This script times ntt_chain against stripped variants (same memory motion,
parts of the math removed) to attribute the gap.  Run on the real chip.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from matrix_fhe_tpu.ops import pallas_ntt2 as v2

LOGN = 14
N = 1 << LOGN
B, L, K = 24, 10, 500         # bench.py fused-chain shape (k=500)


def timeit(fn, *args):
    # mirror bench.py exactly: an OUTER jit wrapper (the bare pallas-call
    # partial's async completion misreports through the remote runtime)
    jfn = jax.jit(lambda a: fn(a))
    jax.block_until_ready(jfn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(jfn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    print("devices:", jax.devices())
    moduli = v2.find_v2_primes(N, L)
    tabs = v2.build_tables(N, moduli)
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.stack(
        [np.stack([rng.integers(0, q, N, dtype=np.int64).astype(np.int32)
                   for q in moduli]) for _ in range(B)]))

    t_full = timeit(lambda a: v2.ntt_chain(a, tabs, K), x)
    per = t_full / (B * L * K)
    print(f"full chain: {t_full*1e3:.2f} ms -> {1/per:.0f} NTT/s "
          f"({per*1e9:.0f} ns/transform)")

    # variant timings: monkeypatch pieces out (same shapes, fewer ops)
    orig_shoup = v2._shoup_mul
    orig_mm = v2._mm_reduce
    orig_transpose = v2._transpose_tiles
    orig_digits = v2._digits3

    def no_shoup(y, t_i, t_f, qinv, qi, ptile):
        return y

    def mm_only(dig, rhs, qinv, qi):
        Kp = rhs.shape[1] // 3
        mm = jax.lax.dot_general(
            dig, rhs, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return mm[:, :Kp]          # skip the 5-round Horner recombination

    def no_transpose(xx, ptile, a, b):
        # right shape, wrong data: reshape is free, swapaxes is not
        return xx.reshape(ptile * b, a)

    variants = {}
    jax.clear_caches()
    v2._shoup_mul = no_shoup
    variants["no_twiddle"] = timeit(
        lambda a: v2.ntt_chain(a, tabs, K), x)
    v2._shoup_mul = orig_shoup
    jax.clear_caches()

    v2._mm_reduce = mm_only
    variants["no_horner"] = timeit(
        lambda a: v2.ntt_chain(a, tabs, K), x)
    v2._mm_reduce = orig_mm
    jax.clear_caches()

    v2._shoup_mul = no_shoup
    v2._mm_reduce = mm_only
    v2._transpose_tiles = no_transpose
    variants["mxu_skeleton"] = timeit(
        lambda a: v2.ntt_chain(a, tabs, K), x)
    v2._shoup_mul = orig_shoup
    v2._mm_reduce = orig_mm
    v2._transpose_tiles = orig_transpose
    jax.clear_caches()

    v2._transpose_tiles = no_transpose
    variants["no_transpose"] = timeit(
        lambda a: v2.ntt_chain(a, tabs, K), x)
    v2._transpose_tiles = orig_transpose

    print(f"{'variant':16s} {'ms':>8s} {'vs full':>8s}")
    print(f"{'full':16s} {t_full*1e3:8.2f} {'100%':>8s}")
    for k, v in variants.items():
        print(f"{k:16s} {v*1e3:8.2f} {v/t_full:7.1%}")


if __name__ == "__main__":
    main()
