"""Probe 8: is the ~23 ms/call gap the axon tunnel fetching the result
buffer on block_until_ready?  Time identical compute with (a) the full
[B,L,N] output vs (b) a tiny slice of it as the fetched result.
"""
from __future__ import annotations

import importlib.util
import time

import jax
import jax.numpy as jnp
import numpy as np

from matrix_fhe_tpu.ops import pallas_ntt2 as P

spec = importlib.util.spec_from_file_location("probe7", "bench_ntt_probe7.py")
probe7 = importlib.util.module_from_spec(spec)
spec.loader.exec_module(probe7)


def timeit(fn, x, reps=5):
    jax.block_until_ready(fn(x))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(x))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    logn, limbs = 14, 10
    n = 1 << logn
    moduli = P.find_v2_primes(n, limbs)
    tabs = P.build_tables(n, moduli)
    rng = np.random.default_rng(0)
    x64 = jnp.asarray(rng.integers(0, min(moduli), (64, limbs, n),
                                   dtype=np.int64).astype(np.int32))
    x16 = x64[:16]

    @jax.jit
    def loop_full(y):
        return jax.lax.fori_loop(0, 40, lambda _, v: P.ntt_fwd(v, tabs), y)

    @jax.jit
    def loop_slice(y):
        out = jax.lax.fori_loop(0, 40, lambda _, v: P.ntt_fwd(v, tabs), y)
        return out[0, 0, :128]

    chain_full = jax.jit(lambda a: probe7.run_chain(a, tabs, 50))
    chain_slice = jax.jit(lambda a: probe7.run_chain(a, tabs, 50)[0, 0, :128])
    chain_slice_k500 = jax.jit(
        lambda a: probe7.run_chain(a, tabs, 500)[0, 0, :128])

    for name, fn, data, nn in [
        ("loop40_full", loop_full, x64, 40 * 640),
        ("loop40_slice", loop_slice, x64, 40 * 640),
        ("chain50_full", chain_full, x16, 50 * 160),
        ("chain50_slice", chain_slice, x16, 50 * 160),
        ("chain500_slice", chain_slice_k500, x16, 500 * 160),
    ]:
        dt = timeit(fn, data)
        per = dt / (nn // 160 if "chain" in name else 40)
        print(f"{name:15s}: {dt*1e3:8.3f} ms total  {nn/dt/1e3:8.1f}k NTT/s",
              flush=True)


if __name__ == "__main__":
    main()
