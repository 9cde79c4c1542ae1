"""Probe 7: chain NTT applications inside ONE pallas kernel via a persistent
VMEM scratch (grid step k transforms the scratch in place; only step 0 reads
HBM and the last step writes).  Bypasses the ~0.5 ms/iteration host-tunnel
gap between kernel launches; measures sustained on-device NTT throughput.

  chain_b16_k50 : 16 polys x 10 limbs, 50 chained transforms
  chain_b24_k50
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


@functools.partial(jax.jit, static_argnames=("k",))
def run_chain(x, tabs, k):
    """x: int32 [B, L, N]; applies the forward transform k times."""
    B, L, N = x.shape
    R, C = tabs.rows, tabs.cols
    ptile = B

    def kernel2(scal_ref, x_ref, a2_ref, b2_ref, twi_ref, twf_ref, out_ref,
                scratch):
        step = pl.program_id(0)

        def transform(src_fn):
            for l in range(L):
                qf = scal_ref[l, 0]
                qinv = scal_ref[l, 1]
                qi = qf.astype(jnp.int32)
                x2 = src_fn(l)
                v = jnp.where(x2 > qi >> 1, x2 - qi, x2)
                xt = P._transpose_tiles(v.reshape(ptile * R, C), ptile, R, C)
                y = P._mm_reduce(P._digits3(xt, R), a2_ref[l], qinv, qi)
                w = P._shoup_mul(y, twi_ref[l], twf_ref[l], qinv, qi, ptile)
                w2 = P._transpose_tiles(w, ptile, C, R)
                out = P._mm_reduce(P._digits3(w2, C), b2_ref[l], qinv, qi)
                scratch[:, l, :] = P._canon(out, qi).reshape(ptile, N)

        @pl.when(step == 0)
        def _():
            transform(lambda l: x_ref[:, l, :])

        @pl.when(step > 0)
        def _():
            transform(lambda l: scratch[:, l, :])

        @pl.when(step == k - 1)
        def _():
            out_ref[:] = scratch[:]

    spec = pl.BlockSpec((B, L, N), lambda s: (0, 0, 0),
                        memory_space=pltpu.VMEM)
    full = lambda t: pl.BlockSpec(t.shape, lambda s: (0,) * t.ndim,
                                  memory_space=pltpu.VMEM)
    with jax.enable_x64(False):
        return pl.pallas_call(
            kernel2, grid=(k,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                spec,
                full(tabs.a2), full(tabs.b2), full(tabs.tw_i),
                full(tabs.tw_f),
            ],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((B, L, N), jnp.int32),
            scratch_shapes=[pltpu.VMEM((B, L, N), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=120 * 1024 * 1024),
        )(tabs.scal, x, tabs.a2, tabs.b2, tabs.tw_i, tabs.tw_f)


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

    # correctness: chain k=3 == 3 sequential ntt_fwd calls
    xs = jnp.asarray(rng.integers(0, min(moduli), (8, limbs, n),
                                  dtype=np.int64).astype(np.int32))
    want = xs
    for _ in range(3):
        want = P.ntt_fwd(want, tabs)
    got = run_chain(xs, tabs, 3)
    assert np.array_equal(np.asarray(want), np.asarray(got)), "chain mismatch"
    print("chain(3) == ntt_fwd^3: OK", flush=True)

    for b, k in ((16, 50), (24, 50), (16, 200)):
        x = jnp.asarray(rng.integers(0, min(moduli), (b, limbs, n),
                                     dtype=np.int64).astype(np.int32))
        try:
            dt = timeit(lambda a: run_chain(a, tabs, k), x)
            nn = b * limbs * k
            print(f"chain_b{b}_k{k}: {dt*1e3:8.3f} ms  "
                  f"{nn/dt/1e3:8.1f}k NTT/s", flush=True)
        except Exception as e:
            print(f"chain_b{b}_k{k}: FAIL {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
