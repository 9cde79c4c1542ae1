"""Probe 6: is the ~0.5 ms fixed cost the [B,L,N]->[B,L*N] relayout at the
pallas boundary?  ([B,L,N] is tiled on (L,N) with L=10 padded to 16
sublanes; reshaping to [B,L*N] retiles on (B,L*N) -> physical relayout.)

  resh      -- jnp reshape roundtrip + add (no pallas): relayout cost alone
  copy3d    -- copy kernel on [B, L, N] directly, block (8, L, N), no reshape
  full3d    -- full fwd kernel, block (8, L, N), limb loop inside kernel
  full3d_b128/256
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


@jax.jit
def run_resh(x):
    B, L, N = x.shape
    return (x.reshape(B, L * N) + 1).reshape(B, L, N)


@jax.jit
def run_copy3d(x, scal):
    B, L, N = x.shape

    def kernel(scal_ref, x_ref, out_ref):
        v = x_ref[:]
        qi = scal_ref[:, 0].astype(jnp.int32)[None, :, None]
        out_ref[:] = jnp.where(v > qi >> 1, v - qi, v)

    spec = pl.BlockSpec((8, L, N), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    with jax.enable_x64(False):
        return pl.pallas_call(
            kernel, grid=(B // 8,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((B, L, N), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(scal, x)


@functools.partial(jax.jit, static_argnames=("ptile",))
def run_full3d(x, tabs, ptile=8):
    B, L, N = x.shape
    R, C = tabs.rows, tabs.cols

    def kernel(scal_ref, x_ref, a2_ref, b2_ref, twi_ref, twf_ref, out_ref):
        for l in range(L):
            qf = scal_ref[l, 0]
            qinv = scal_ref[l, 1]
            qi = qf.astype(jnp.int32)
            x2 = x_ref[:, l, :]
            v = jnp.where(x2 > qi >> 1, x2 - qi, x2)
            xt = P._transpose_tiles(v.reshape(ptile * R, C), ptile, R, C)
            y = P._mm_reduce(P._digits3(xt, R), a2_ref[l], qinv, qi)
            w = P._shoup_mul(y, twi_ref[l], twf_ref[l], qinv, qi, ptile)
            w2 = P._transpose_tiles(w, ptile, C, R)
            out = P._mm_reduce(P._digits3(w2, C), b2_ref[l], qinv, qi)
            out_ref[:, l, :] = P._canon(out, qi).reshape(ptile, N)

    spec = pl.BlockSpec((ptile, L, N), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    full = lambda t: pl.BlockSpec(t.shape, lambda b: (0,) * t.ndim,
                                  memory_space=pltpu.VMEM)
    with jax.enable_x64(False):
        return pl.pallas_call(
            kernel, grid=(B // ptile,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                spec,
                full(tabs.a2), full(tabs.b2), full(tabs.tw_i),
                full(tabs.tw_f),
            ],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((B, L, N), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=100 * 1024 * 1024),
        )(tabs.scal, x, tabs.a2, tabs.b2, tabs.tw_i, tabs.tw_f)


def main():
    logn, limbs = 14, 10
    n = 1 << logn
    moduli = P.find_v2_primes(n, limbs)
    tabs = P.build_tables(n, moduli)
    rng = np.random.default_rng(0)
    xs = {b: jnp.asarray(rng.integers(0, min(moduli), (b, limbs, n),
                                      dtype=np.int64).astype(np.int32))
          for b in (64, 128, 256)}

    for name, fn, b in [
        ("resh_b64", run_resh, 64),
        ("copy3d", lambda a: run_copy3d(a, tabs.scal), 64),
        ("full3d_b64", lambda a: run_full3d(a, tabs), 64),
        ("full3d_b128", lambda a: run_full3d(a, tabs), 128),
        ("full3d_b256", lambda a: run_full3d(a, tabs), 256),
    ]:
        try:
            dt = timeit_chained(fn, xs[b])
            print(f"{name:12s}: {dt*1e3:7.3f} ms  "
                  f"{b * limbs / dt / 1e3:8.1f}k NTT/s", flush=True)
        except Exception as e:
            print(f"{name:12s}: FAIL {type(e).__name__}: {str(e)[:150]}",
                  flush=True)

    want = np.asarray(P.ntt_fwd(xs[64], tabs))
    got = np.asarray(run_full3d(xs[64], tabs))
    assert np.array_equal(want, got), "full3d mismatch!"
    print("full3d == base: OK", flush=True)


if __name__ == "__main__":
    main()
