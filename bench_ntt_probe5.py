"""Probe 5: decompose the pallas_call cost into fixed launch overhead +
marginal per-byte cost, and test batch amortization of the full kernel.

  launch    -- near-empty kernel (one (8,128) block in/out), grid (1,)
  launch_g80-- near-empty kernel, grid (80,) over the same tiny block
  copy_b16/64/128 -- copy kernel at batches 16/64/128 (10/40/80 MB)
  full_b16/64/128/256 -- full fwd kernel at batches 16..256
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from matrix_fhe_tpu.ops import pallas_ntt2 as P


def timeit_chained(fn, x, reps=3, k=40):
    @jax.jit
    def run(y):
        return jax.lax.fori_loop(0, k, lambda _, v: fn(v), y)
    jax.block_until_ready(run(x))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(x))
        best = min(best, time.perf_counter() - t0)
    return best / k


@functools.partial(jax.jit, static_argnames=("steps",))
def run_launch(x, steps):
    def kernel(x_ref, out_ref):
        out_ref[:] = x_ref[:] + 1
    with jax.enable_x64(False):
        return pl.pallas_call(
            kernel, grid=(steps,),
            in_specs=[pl.BlockSpec((8, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        )(x)


@jax.jit
def run_copy(x, scal):
    B, L, N = x.shape
    xf = x.reshape(B, L * N)

    def kernel(scal_ref, x_ref, out_ref):
        l = pl.program_id(1)
        qi = scal_ref[l, 0].astype(jnp.int32)
        v = x_ref[:]
        out_ref[:] = jnp.where(v > qi >> 1, v - qi, v)

    spec = pl.BlockSpec((8, N), lambda b, l: (b, l), memory_space=pltpu.VMEM)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel, grid=(B // 8, L),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((B, L * N), jnp.int32),
        )(scal, xf)
    return out.reshape(B, L, N)


def main():
    logn, limbs = 14, 10
    n = 1 << logn
    moduli = P.find_v2_primes(n, limbs)
    tabs = P.build_tables(n, moduli)
    rng = np.random.default_rng(0)
    xs = {b: jnp.asarray(rng.integers(0, min(moduli), (b, limbs, n),
                                      dtype=np.int64).astype(np.int32))
          for b in (16, 64, 128, 256)}

    t = jnp.zeros((8, 128), jnp.int32)
    for steps in (1, 80):
        dt = timeit_chained(lambda a: run_launch(a, steps), t)
        print(f"launch_g{steps:<3d}: {dt*1e6:8.1f} us", flush=True)

    for b in (16, 64, 128):
        dt = timeit_chained(lambda a: run_copy(a, tabs.scal), xs[b])
        mb = b * limbs * n * 4 / 1e6
        print(f"copy_b{b:<4d}: {dt*1e3:7.3f} ms  "
              f"{2 * mb / 1e3 / dt:6.1f} GB/s ({mb:.0f} MB)", flush=True)

    for b in (16, 64, 128, 256):
        dt = timeit_chained(lambda a: P.ntt_fwd(a, tabs), xs[b])
        print(f"full_b{b:<4d}: {dt*1e3:7.3f} ms  "
              f"{b * limbs / dt / 1e3:8.1f}k NTT/s", flush=True)


if __name__ == "__main__":
    main()
