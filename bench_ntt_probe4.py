"""Probe 4: why does a pure copy through the v2 NTT's pallas structure run
at only ~108 GB/s (0.74 ms of the 1.12 ms kernel)?

  hbm_roll  -- pure-XLA roll+add loop (real HBM floor, not collapsible)
  copy      -- baseline copy kernel, grid (b, l), block (8, N)
  copy_half -- same, half the batch (time ∝ data, or fixed?)
  copy_g10  -- grid (b,) only, block (8, L*N): 5 MB blocks
  copy_p32  -- ptile=32, block (32, N)
  copy_lb   -- grid (l, b) swapped
  full_g10  -- full fwd kernel, one grid dim over b, all limbs per step
  full_p16g5-- full fwd kernel, ptile=16, 5 limbs per step
"""
from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from matrix_fhe_tpu.ops import pallas_ntt2 as P

K_CHAIN = 40


def timeit_chained(fn, x, reps=3, k=K_CHAIN):
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


def bench_hbm_roll():
    x = jnp.arange(640 * 16384, dtype=jnp.int32).reshape(640, 16384)
    def f(v):
        return jnp.roll(v, 1, axis=0) + 1
    dt = timeit_chained(f, x, k=20)
    gbs = 2 * x.size * 4 / dt / 1e9
    print(f"hbm_roll  : {dt*1e6:7.1f} us  {gbs:7.1f} GB/s", flush=True)


@functools.partial(jax.jit, static_argnames=("ptile", "mode"))
def run_copy(x, scal, ptile, mode):
    B, L, N = x.shape
    xf = x.reshape(B, L * N)

    if mode == "g10":
        def kernel(scal_ref, x_ref, out_ref):
            qi = scal_ref[0, 0].astype(jnp.int32)
            v = x_ref[:]
            out_ref[:] = jnp.where(v > qi >> 1, v - qi, v)
        grid = (B // ptile,)
        spec = pl.BlockSpec((ptile, L * N), lambda b: (b, 0),
                            memory_space=pltpu.VMEM)
    elif mode == "lb":
        def kernel(scal_ref, x_ref, out_ref):
            l = pl.program_id(0)
            qi = scal_ref[l, 0].astype(jnp.int32)
            v = x_ref[:]
            out_ref[:] = jnp.where(v > qi >> 1, v - qi, v)
        grid = (L, B // ptile)
        spec = pl.BlockSpec((ptile, N), lambda l, b: (b, l),
                            memory_space=pltpu.VMEM)
    else:
        def kernel(scal_ref, x_ref, out_ref):
            l = pl.program_id(1)
            qi = scal_ref[l, 0].astype(jnp.int32)
            v = x_ref[:]
            out_ref[:] = jnp.where(v > qi >> 1, v - qi, v)
        grid = (B // ptile, L)
        spec = pl.BlockSpec((ptile, N), lambda b, l: (b, l),
                            memory_space=pltpu.VMEM)

    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel, grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((B, L * N), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(scal, xf)
    return out.reshape(B, L, N)


@functools.partial(jax.jit, static_argnames=("ptile", "G"))
def run_full(x, tabs, ptile, G):
    """Full forward kernel, grid (b, L//G), G limbs per step."""
    B, L, N = x.shape
    R, C = tabs.rows, tabs.cols
    assert L % G == 0
    xf = x.reshape(B, L * N)

    def kernel(scal_ref, x_ref, a2_ref, b2_ref, twi_ref, twf_ref, out_ref):
        lg = pl.program_id(1)
        for g in range(G):
            l = lg * G + g
            qf = scal_ref[l, 0]
            qinv = scal_ref[l, 1]
            qi = qf.astype(jnp.int32)
            xs = x_ref[:, g * N:(g + 1) * N]
            v = jnp.where(xs > qi >> 1, xs - qi, xs)
            xt = P._transpose_tiles(v.reshape(ptile * R, C), ptile, R, C)
            y = P._mm_reduce(P._digits3(xt, R), a2_ref[g], qinv, qi)
            w = P._shoup_mul(y, twi_ref[g], twf_ref[g], qinv, qi, ptile)
            w2 = P._transpose_tiles(w, ptile, C, R)
            out = P._mm_reduce(P._digits3(w2, C), b2_ref[g], qinv, qi)
            out_ref[:, g * N:(g + 1) * N] = \
                P._canon(out, qi).reshape(ptile, R * C)

    grid = (B // ptile, L // G)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel, grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((ptile, G * N), lambda b, l: (b, l),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((G,) + tabs.a2.shape[1:], lambda b, l: (l, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((G,) + tabs.b2.shape[1:], lambda b, l: (l, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((G,) + tabs.tw_i.shape[1:], lambda b, l: (l, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((G,) + tabs.tw_f.shape[1:], lambda b, l: (l, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((ptile, G * N), lambda b, l: (b, l),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, L * N), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=110 * 1024 * 1024),
        )(tabs.scal, xf, tabs.a2, tabs.b2, tabs.tw_i, tabs.tw_f)
    return out.reshape(B, L, N)


def main():
    logn, limbs, batch = 14, 10, 64
    n = 1 << logn
    moduli = P.find_v2_primes(n, limbs)
    tabs = P.build_tables(n, moduli)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, min(moduli), (batch, limbs, n),
                                 dtype=np.int64).astype(np.int32))
    xh = x[:32]
    n_ntt = batch * limbs

    bench_hbm_roll()

    want = np.asarray(P.ntt_fwd(x, tabs))
    got = np.asarray(run_full(x, tabs, 8, 10))
    assert np.array_equal(want, got), "full_g10 mismatch!"
    print("full_g10 == base: OK", flush=True)

    for name, fn, data, nn in [
        ("copy", lambda a: run_copy(a, tabs.scal, 8, "bl"), x, n_ntt),
        ("copy_half", lambda a: run_copy(a, tabs.scal, 8, "bl"), xh, n_ntt // 2),
        ("copy_g10", lambda a: run_copy(a, tabs.scal, 8, "g10"), x, n_ntt),
        ("copy_p32", lambda a: run_copy(a, tabs.scal, 32, "bl"), x, n_ntt),
        ("copy_lb", lambda a: run_copy(a, tabs.scal, 8, "lb"), x, n_ntt),
        ("full_g10", lambda a: run_full(a, tabs, 8, 10), x, n_ntt),
        ("full_p16g5", lambda a: run_full(a, tabs, 16, 5), x, n_ntt),
        ("full_p32g2", lambda a: run_full(a, tabs, 32, 2), x, n_ntt),
    ]:
        try:
            dt = timeit_chained(fn, data)
            print(f"{name:10s}: {dt*1e3:7.3f} ms  {nn/dt/1e3:8.1f}k NTT/s",
                  flush=True)
        except Exception as e:
            print(f"{name:10s}: FAIL {type(e).__name__}: {str(e)[:150]}",
                  flush=True)


if __name__ == "__main__":
    main()
