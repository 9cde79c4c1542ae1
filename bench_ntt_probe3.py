"""Probe 3: what is the 9.6us/step floor of the v2 NTT kernel?

  hbm      -- real HBM bandwidth (reverse+add loop, cannot be elided)
  copy     -- current copy kernel (tables declared, unused)
  copy_nt  -- copy kernel with NO table in_specs (isolates table DMA cost)
  gl<G>    -- full fwd kernel, G limbs per grid step (amortize per-step cost)
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


def bench_hbm():
    x = jnp.arange(64 * 10 * 16384, dtype=jnp.int32).reshape(640, 16384)
    def f(v):
        return v[::-1] + 1
    dt = timeit_chained(f, x, k=20)
    gbs = 2 * x.size * 4 / dt / 1e9
    print(f"hbm rev+add : {dt*1e6:7.1f} us  {gbs:7.1f} GB/s", flush=True)


@functools.partial(jax.jit, static_argnames=("ptile", "notab"))
def run_copy(x, tabs, ptile, notab):
    B, L, N = x.shape
    xf = x.reshape(B, L * N)

    def kernel(scal_ref, x_ref, *rest):
        out_ref = rest[-1]
        l = pl.program_id(1)
        qi = scal_ref[l, 0].astype(jnp.int32)
        v = x_ref[:]
        out_ref[:] = jnp.where(v > qi >> 1, v - qi, v)

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((ptile, N), lambda b, l: (b, l),
                             memory_space=pltpu.VMEM)]
    args = [tabs.scal, xf]
    if not notab:
        for t in (tabs.a2, tabs.b2, tabs.tw_i, tabs.tw_f):
            in_specs.append(pl.BlockSpec((1,) + t.shape[1:],
                                         lambda b, l: (l, 0, 0),
                                         memory_space=pltpu.VMEM))
            args.append(t)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel, grid=(B // ptile, L), in_specs=in_specs,
            out_specs=pl.BlockSpec((ptile, N), lambda b, l: (b, l),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, L * N), jnp.int32),
        )(*args)
    return out.reshape(B, L, N)


@functools.partial(jax.jit, static_argnames=("ptile", "G"))
def run_glimb(x, tabs, ptile, G):
    """Full forward kernel, G limbs per grid step."""
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
            a2 = a2_ref[g]
            b2 = b2_ref[g]
            t_i = twi_ref[g]
            t_f = twf_ref[g]
            xs = x_ref[:, g * N:(g + 1) * N]
            v = jnp.where(xs > qi >> 1, xs - qi, xs)
            xt = P._transpose_tiles(v.reshape(ptile * R, C), ptile, R, C)
            y = P._mm_reduce(P._digits3(xt, R), a2, qinv, qi)
            w = P._shoup_mul(y, t_i, t_f, qinv, qi, ptile)
            w2 = P._transpose_tiles(w, ptile, C, R)
            out = P._mm_reduce(P._digits3(w2, C), b2, qinv, qi)
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

    bench_hbm()

    want = np.asarray(P.ntt_fwd(x, tabs))
    got = np.asarray(run_glimb(x, tabs, 8, 2))
    assert np.array_equal(want, got), "glimb mismatch!"
    print("glimb == base: OK", flush=True)

    for name, fn in [
        ("copy", lambda a: run_copy(a, tabs, 8, False)),
        ("copy_nt", lambda a: run_copy(a, tabs, 8, True)),
        ("gl1", lambda a: run_glimb(a, tabs, 8, 1)),
        ("gl2", lambda a: run_glimb(a, tabs, 8, 2)),
        ("gl5", lambda a: run_glimb(a, tabs, 8, 5)),
        ("gl2p16", lambda a: run_glimb(a, tabs, 16, 2)),
    ]:
        try:
            dt = timeit_chained(fn, x)
            print(f"{name:8s}: {dt*1e3:7.3f} ms  {n_ntt/dt/1e3:8.1f}k NTT/s",
                  flush=True)
        except Exception as e:
            print(f"{name:8s}: FAIL {type(e).__name__}: {str(e)[:150]}",
                  flush=True)


if __name__ == "__main__":
    main()
