"""Scratch probe: cost attribution for the v2 Pallas NTT kernel.

The axon tunnel adds ~26 ms fixed per host sync, so each measurement chains
K kernel invocations inside ONE jit (fori_loop) and divides.

Variants (cumulative structure of the forward kernel):
  copy      -- load block, center, store (HBM + canonicalize floor)
  mm1       -- + transpose, digits, stage-1 matmul, take one output block
  red1      -- + full stage-1 Horner reduction chain
  shoup     -- + twiddle Shoup multiply
  full      -- + transpose, stage-2 matmul + reductions (the real kernel)
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


def chain(fn):
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, K_CHAIN, lambda _, y: fn(y), x)
    return run


def timeit_chained(fn, x, reps=3):
    f = chain(fn)
    jax.block_until_ready(f(x))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f(x))
        best = min(best, time.perf_counter() - t0)
    return best / K_CHAIN


def make_variant_kernel(R, C, ptile, mode):
    def kernel(scal_ref, x_ref, a2_ref, b2_ref, twi_ref, twf_ref, out_ref):
        l = pl.program_id(1)
        qf = scal_ref[l, 0]
        qinv = scal_ref[l, 1]
        qi = qf.astype(jnp.int32)
        a2 = a2_ref[0]
        b2 = b2_ref[0]
        t_i = twi_ref[0]
        t_f = twf_ref[0]

        x = x_ref[:]
        v = jnp.where(x > qi >> 1, x - qi, x)
        if mode == "copy":
            out_ref[:] = v
            return
        xt = P._transpose_tiles(v.reshape(ptile * R, C), ptile, R, C)
        dig = P._digits3(xt, R)
        if mode == "mm1":
            mm = jax.lax.dot_general(
                dig, a2, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            out_ref[:] = mm[:, :R].reshape(ptile, R * C)
            return
        y = P._mm_reduce(dig, a2, qinv, qi)
        if mode == "red1":
            out_ref[:] = y.reshape(ptile, R * C)
            return
        w = P._shoup_mul(y, t_i, t_f, qinv, qi, ptile)
        if mode == "shoup":
            out_ref[:] = w.reshape(ptile, R * C)
            return
        w2 = P._transpose_tiles(w, ptile, C, R)
        out = P._mm_reduce(P._digits3(w2, C), b2, qinv, qi)
        out_ref[:] = P._canon(out, qi).reshape(ptile, R * C)
    return kernel


@functools.partial(jax.jit, static_argnames=("mode", "ptile"))
def run(x, tabs, mode, ptile):
    B, L, N = x.shape
    R, C = tabs.rows, tabs.cols
    kernel = make_variant_kernel(R, C, ptile, mode)
    grid = (B // ptile, L)
    xf = x.astype(jnp.int32).reshape(B, L * N)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((ptile, N), lambda b, l: (b, l),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1,) + tabs.a2.shape[1:], lambda b, l: (l, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1,) + tabs.b2.shape[1:], lambda b, l: (l, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1,) + tabs.tw_i.shape[1:], lambda b, l: (l, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1,) + tabs.tw_f.shape[1:], lambda b, l: (l, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((ptile, N), lambda b, l: (b, l),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, L * N), jnp.int32),
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
    n_ntt = batch * limbs

    modes = sys.argv[1].split(",") if len(sys.argv) > 1 else [
        "copy", "mm1", "red1", "shoup", "full"]
    ptiles = [int(p) for p in sys.argv[2].split(",")] if len(sys.argv) > 2 \
        else [8]
    for ptile in ptiles:
        for mode in modes:
            try:
                dt = timeit_chained(lambda a: run(a, tabs, mode, ptile), x)
                print(f"ptile={ptile:2d} {mode:9s}: {dt*1e3:7.3f} ms  "
                      f"{n_ntt/dt/1e3:8.1f}k NTT/s", flush=True)
            except Exception as e:
                print(f"ptile={ptile:2d} {mode:9s}: FAIL {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
