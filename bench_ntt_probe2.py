"""Probe 2: grid order + pipelining variants for the v2 Pallas NTT.

Probe 1 showed copy-only costs 0.77ms of the 1.16ms full kernel: the kernel
is data-movement bound.  Hypothesis: grid (B/pt, L) iterates limbs fastest,
so per-limb tables (~550KB) are refetched every grid step.  Variants:

  base      -- current _transform (grid (B/pt, L))
  swap      -- grid (L, B/pt): table block index constant across inner steps
  swap_par  -- swap + dimension_semantics=(arbitrary, arbitrary)
  copy_swap -- copy-only kernel with swapped grid (new ceiling)
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


@functools.partial(jax.jit, static_argnames=("mode", "ptile"))
def run(x, tabs, mode, ptile):
    B, L, N = x.shape
    R, C = tabs.rows, tabs.cols
    fwd_kernel = P._make_kernel(R, C, ptile, fwd=True)

    def copy_kernel(scal_ref, x_ref, a2_ref, b2_ref, twi_ref, twf_ref,
                    out_ref):
        l = pl.program_id(0)
        qi = scal_ref[l, 0].astype(jnp.int32)
        x = x_ref[:]
        out_ref[:] = jnp.where(x > qi >> 1, x - qi, x)

    if mode.startswith("copy"):
        kernel = copy_kernel
    elif mode == "base":
        kernel = fwd_kernel
    else:
        # swapped grid: program_id(1) must be the limb -> wrap
        def kernel(scal_ref, x_ref, a2_ref, b2_ref, twi_ref, twf_ref,
                   out_ref, _k=P._make_kernel(R, C, ptile, fwd=True)):
            _k(scal_ref, x_ref, a2_ref, b2_ref, twi_ref, twf_ref, out_ref)

    xf = x.astype(jnp.int32).reshape(B, L * N)
    tab_specs_swapped = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((ptile, N), lambda l, b: (b, l), memory_space=pltpu.VMEM),
        pl.BlockSpec((1,) + tabs.a2.shape[1:], lambda l, b: (l, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1,) + tabs.b2.shape[1:], lambda l, b: (l, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1,) + tabs.tw_i.shape[1:], lambda l, b: (l, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1,) + tabs.tw_f.shape[1:], lambda l, b: (l, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    base_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((ptile, N), lambda b, l: (b, l), memory_space=pltpu.VMEM),
        pl.BlockSpec((1,) + tabs.a2.shape[1:], lambda b, l: (l, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1,) + tabs.b2.shape[1:], lambda b, l: (l, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1,) + tabs.tw_i.shape[1:], lambda b, l: (l, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1,) + tabs.tw_f.shape[1:], lambda b, l: (l, 0, 0),
                     memory_space=pltpu.VMEM),
    ]

    if mode == "base":
        grid = (B // ptile, L)
        in_specs = base_specs
        out_spec = pl.BlockSpec((ptile, N), lambda b, l: (b, l),
                                memory_space=pltpu.VMEM)
        kern = fwd_kernel
        sem = None
    else:
        grid = (L, B // ptile)
        in_specs = tab_specs_swapped
        out_spec = pl.BlockSpec((ptile, N), lambda l, b: (b, l),
                                memory_space=pltpu.VMEM)
        if mode.startswith("copy"):
            kern = copy_kernel
        else:
            # pallas kernel uses program_id(1) for the limb in P._make_kernel;
            # with swapped grid the limb is program_id(0) -> make a wrapper
            def kern(scal_ref, x_ref, a2_ref, b2_ref, twi_ref, twf_ref,
                     out_ref):
                l = pl.program_id(0)
                qf = scal_ref[l, 0]
                qinv = scal_ref[l, 1]
                qi = qf.astype(jnp.int32)
                a2 = a2_ref[0]
                b2 = b2_ref[0]
                t_i = twi_ref[0]
                t_f = twf_ref[0]
                x = x_ref[:]
                v = jnp.where(x > qi >> 1, x - qi, x)
                xt = P._transpose_tiles(v.reshape(ptile * R, C), ptile, R, C)
                y = P._mm_reduce(P._digits3(xt, R), a2, qinv, qi)
                w = P._shoup_mul(y, t_i, t_f, qinv, qi, ptile)
                w2 = P._transpose_tiles(w, ptile, C, R)
                out = P._mm_reduce(P._digits3(w2, C), b2, qinv, qi)
                out_ref[:] = P._canon(out, qi).reshape(ptile, R * C)
        sem = (("arbitrary", "arbitrary") if mode.endswith("par") else None)

    kwargs = {}
    if mode != "base" and mode.endswith("par"):
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"))
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kern, grid=grid, in_specs=in_specs, out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((B, L * N), jnp.int32),
            **kwargs,
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

    # correctness: swapped grid must equal base
    want = np.asarray(run(x, tabs, "base", 8))
    got = np.asarray(run(x, tabs, "swap", 8))
    assert np.array_equal(want, got), "grid swap changed results!"
    print("swap == base: OK", flush=True)

    modes = sys.argv[1].split(",") if len(sys.argv) > 1 else [
        "base", "swap", "swap_par", "copy_swap"]
    ptiles = [int(p) for p in sys.argv[2].split(",")] if len(sys.argv) > 2 \
        else [8]
    for ptile in ptiles:
        for mode in modes:
            try:
                dt = timeit_chained(lambda a: run(a, tabs, mode, ptile), x)
                print(f"ptile={ptile:2d} {mode:10s}: {dt*1e3:7.3f} ms  "
                      f"{n_ntt/dt/1e3:8.1f}k NTT/s", flush=True)
            except Exception as e:
                print(f"ptile={ptile:2d} {mode:10s}: FAIL {type(e).__name__}:"
                      f" {str(e)[:150]}", flush=True)


if __name__ == "__main__":
    main()
