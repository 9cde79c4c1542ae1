"""Scratch probe: honest on-device timing of the Pallas NTT variants.

The axon tunnel adds ~26 ms fixed per host sync, so each measurement chains
K kernel invocations inside ONE jit (data-dependent fori_loop) and divides.
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

from matrix_fhe_tpu.ops import pallas_ntt as P

K_CHAIN = 40


def chain(fn):
    @jax.jit
    def run(x):
        def body(_, y):
            return fn(y)
        return jax.lax.fori_loop(0, K_CHAIN, body, x)
    return run


def timeit_chained(fn, x, reps=3):
    f = chain(fn)
    jax.block_until_ready(f(x))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f(x))
        best = min(best, time.perf_counter() - t0)
    return best / K_CHAIN


def make_variant_kernel(R, C, ptile, mode):
    def kernel(scal_ref, x_ref, a_ref, bt_ref, tw_ref, out_ref):
        l = pl.program_id(1)
        q = scal_ref[l, 0]
        qinv = scal_ref[l, 1]
        ck = [scal_ref[l, 2 + k] for k in range(5)]
        a_pl = a_ref[0]
        bt_pl = bt_ref[0]
        tw = tw_ref[0]

        x = x_ref[0].astype(jnp.float32)
        xc = jnp.where(x > q * 0.5, x - q, x)

        if mode == "copy":
            out_ref[0] = xc.astype(jnp.int32)
            return

        tw_wide = jnp.concatenate([tw] * ptile, axis=1)
        if mode == "notrans":
            x2 = xc.reshape(ptile * R, C)
            y = P._right_mul(x2, bt_pl, ptile * R, C, ck, q, qinv)
            twb = jnp.concatenate([tw] * ptile, axis=0)
            w = P._mulmod(y, twb, q, qinv)
            out = P._right_mul(w, bt_pl, ptile * R, C, ck, q, qinv)
            out = jnp.where(out < 0, out + q, out)
            out_ref[0] = out.reshape(ptile, R * C).astype(jnp.int32)
            return

        if mode == "norecomb":
            xt = xc.reshape(ptile, R, C).swapaxes(0, 1).reshape(R, ptile * C)
            rhs = P._digits_cols(xt, R)
            mm = jax.lax.dot_general(
                a_pl, rhs, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            y = (mm[:R, :ptile * C] + mm[R:2 * R, ptile * C:2 * ptile * C]
                 + mm[2 * R:, 2 * ptile * C:]).astype(jnp.float32)
            w = y * tw_wide
            w = w - jnp.rint(w * qinv) * q
            w2 = w.reshape(R, ptile, C).swapaxes(0, 1).reshape(ptile * R, C)
            lhs = P._digits(w2)
            mm2 = jax.lax.dot_general(
                lhs, bt_pl, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            out = (mm2[:ptile * R, :C] + mm2[ptile * R:2 * ptile * R, C:2 * C]
                   + mm2[2 * ptile * R:, 2 * C:]).astype(jnp.float32)
            out = jnp.where(out < 0, out + q, out)
            out_ref[0] = out.reshape(ptile, R * C).astype(jnp.int32)
            return

        xt = xc.reshape(ptile, R, C).swapaxes(0, 1).reshape(R, ptile * C)
        y = P._left_mul(a_pl, xt, R, ptile * C, ck, q, qinv)
        w = P._mulmod(y, tw_wide, q, qinv)
        if mode == "onestage":
            w2 = w.reshape(R, ptile, C).swapaxes(0, 1)
            out = jnp.where(w2 < 0, w2 + q, w2)
            out_ref[0] = out.reshape(ptile, R * C).astype(jnp.int32)
            return
        w2 = w.reshape(R, ptile, C).swapaxes(0, 1).reshape(ptile * R, C)
        out = P._right_mul(w2, bt_pl, ptile * R, C, ck, q, qinv)
        out = jnp.where(out < 0, out + q, out)
        out_ref[0] = out.reshape(ptile, R * C).astype(jnp.int32)

    return kernel


@functools.partial(jax.jit, static_argnames=("mode", "ptile"))
def run(x, tabs, mode, ptile):
    B, L, N = x.shape
    R, C = tabs.rows, tabs.cols
    kernel = make_variant_kernel(R, C, ptile, mode)
    grid = (B // ptile, L)
    xt = jnp.swapaxes(x.astype(jnp.int32), 0, 1)
    with jax.enable_x64(False):
        out = P._call(kernel, grid, tabs, xt, tabs.a_fwd, tabs.bt_fwd,
                      tabs.tw_fwd, R, C, ptile, B, L, N)
    return jnp.swapaxes(out, 0, 1)


def main():
    logn, limbs, batch = 14, 10, 64
    n = 1 << logn
    moduli = P.find_w22_primes(n, limbs)
    tabs = P.build_tables(n, moduli)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, min(moduli), (batch, limbs, n),
                                 dtype=np.int64).astype(np.int32))
    n_ntt = batch * limbs

    modes = sys.argv[1].split(",") if len(sys.argv) > 1 else [
        "copy", "norecomb", "onestage", "full"]
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
