"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline (BASELINE.json): RNS-NTTs/s/chip at N=2^14, bit-exact kernels.
Also measures CKKS ct-mult+relin+rescale ops/s (config 3) to stderr.

Runs on whatever backend JAX selects (the real TPU under the driver; CPU if
forced).  ``python bench.py --quick`` shrinks the workload for smoke testing.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp


def _time_fn(fn, args, iters: int, warmup: int = 2) -> float:
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def bench_ntt(quick: bool) -> dict:
    """Headline: the fused Pallas four-step MXU NTT (w22 native fast path,
    bit-exact vs the u64 reference kernels)."""
    import numpy as np
    from matrix_fhe_tpu.ops import pallas_ntt

    logn, limbs = 14, 10
    batch = 16 if quick else 64
    n = 1 << logn
    moduli = pallas_ntt.find_w22_primes(n, limbs)
    tabs = pallas_ntt.build_tables(n, moduli)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, min(moduli), (batch, limbs, n),
                                 dtype=np.int64).astype(np.int32))
    try:
        fn = jax.jit(lambda a: pallas_ntt.ntt_fwd(a, tabs))
        dt = _time_fn(fn, (x,), iters=3 if quick else 10)
    except Exception as e:  # CPU / no Mosaic: fall back to the jnp MXU form
        print(f"pallas path unavailable ({type(e).__name__}); jnp fallback",
              file=sys.stderr)
        from matrix_fhe_tpu.ops import mxu_ntt
        tabs2 = mxu_ntt.build_tables(n, moduli)
        fn = jax.jit(lambda a: mxu_ntt.ntt_fwd(a, tabs2))
        dt = _time_fn(fn, (x,), iters=2 if quick else 5)
    return {"ntt_per_s": batch * limbs / dt, "dt": dt}


def bench_ntt_u64(quick: bool) -> dict:
    """Reference-parity 45-bit u64 butterfly path (secondary metric)."""
    from matrix_fhe_tpu.ops import rings
    from matrix_fhe_tpu.utils import primes as pr

    logn, limbs = 14, 10
    batch = 4 if quick else 16
    n = 1 << logn
    g = pr.NTTFriendlyPrimesGenerator(45, 2 * n)
    ring = rings.new_ring(n, g.next_alternating_primes(limbs), rings.STANDARD)

    key = jax.random.key(0)
    x = jax.random.randint(key, (batch, limbs, n), 0, 1 << 30,
                           dtype=jnp.int64).astype(jnp.uint64)
    fn = jax.jit(lambda a: ring.intt(ring.ntt(a)))
    dt = _time_fn(fn, (x,), iters=3 if quick else 10)
    ntts_per_call = 2 * batch * limbs
    return {"ntt_per_s": ntts_per_call / dt, "dt": dt}


def bench_ct_mult(quick: bool) -> dict:
    from matrix_fhe_tpu.flagship import build_flagship, make_step

    logn = 12 if quick else 14
    params, sk, rlk, ev, ct1, ct2 = build_flagship(logn=logn, num_q=6 if quick else 9)
    step = jax.jit(make_step(params, ev, ct1.metadata))
    args = (ct1.value[0], ct1.value[1], ct2.value[0], ct2.value[1], rlk)
    dt = _time_fn(step, args, iters=2 if quick else 5, warmup=1)
    return {"ct_mult_per_s": 1.0 / dt, "dt": dt, "logn": logn}


def main() -> None:
    quick = "--quick" in sys.argv
    print(f"devices: {jax.devices()}", file=sys.stderr)

    ntt = bench_ntt(quick)
    print(f"ntt (pallas w22): {ntt}", file=sys.stderr)
    try:
        ntt64 = bench_ntt_u64(quick)
        print(f"ntt (u64 45-bit): {ntt64}", file=sys.stderr)
    except Exception as e:
        print(f"u64 ntt bench failed: {e}", file=sys.stderr)
        ntt64 = None
    try:
        ct = bench_ct_mult(quick)
        print(f"ct_mult: {ct}", file=sys.stderr)
    except Exception as e:  # pragma: no cover
        print(f"ct_mult bench failed: {e}", file=sys.stderr)
        ct = None

    target = 1e6  # BASELINE.json north star: >= 10^6 N=2^14 RNS-NTTs/s/chip
    result = {
        "metric": "rns_ntt_per_s_n2^14",
        "value": round(ntt["ntt_per_s"], 1),
        "unit": "NTT/s/chip",
        "vs_baseline": round(ntt["ntt_per_s"] / target, 4),
    }
    if ct is not None:
        result["ct_mult_relin_rescale_per_s"] = round(ct["ct_mult_per_s"], 2)
    if ntt64 is not None:
        result["u64_ntt_per_s"] = round(ntt64["ntt_per_s"], 1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
