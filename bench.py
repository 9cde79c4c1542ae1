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


def _time_chained(fn, x, iters: int, reps: int = 3) -> float:
    """Steady-state kernel time: chain ``iters`` dependent applications of
    ``fn`` inside ONE jit (fori_loop) and divide.  Removes the per-dispatch
    host-sync overhead of the remote-TPU tunnel (~0.3-26 ms/call), which is
    not a property of the kernel."""
    import jax.lax as lax

    @jax.jit
    def run(y):
        return lax.fori_loop(0, iters, lambda _, v: fn(v), y)

    jax.block_until_ready(run(x))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(x))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def bench_ntt(quick: bool) -> dict:
    """Headline: sustained RNS-NTT/s of the fused v2 Pallas four-step MXU
    kernel (int32 Shoup reductions over <2^23 moduli, bit-exact vs the u64
    reference kernels).

    Two numbers: ``ntt_per_s`` uses ``ntt_chain`` — k transforms inside ONE
    kernel with the batch VMEM-resident (the fused-pipeline form used by
    composite FHE ops, and free of the remote runtime's ~20 ms per-launch
    overhead); ``ntt_per_s_dispatch`` launches the kernel per transform from
    HBM (fori_loop of pallas calls, long enough to amortize the same
    per-call overhead)."""
    import numpy as np
    from matrix_fhe_tpu.ops import pallas_ntt2

    logn, limbs = 14, 10
    batch = 8 if quick else 24
    k = 200 if quick else 500
    n = 1 << logn
    moduli = pallas_ntt2.find_v2_primes(n, limbs)
    tabs = pallas_ntt2.build_tables(n, moduli)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, min(moduli), (batch, limbs, n),
                                 dtype=np.int64).astype(np.int32))
    xd = jnp.asarray(rng.integers(0, min(moduli), (64, limbs, n),
                                  dtype=np.int64).astype(np.int32))
    try:
        fn = jax.jit(lambda a: pallas_ntt2.ntt_chain(a, tabs, k))
        jax.block_until_ready(fn(x))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(x))
            best = min(best, time.perf_counter() - t0)
        dt = best / k
        res = {"ntt_per_s": batch * limbs / dt, "dt": dt,
               "method": "fused-chain"}
        dtd = _time_chained(lambda a: pallas_ntt2.ntt_fwd(a, tabs), xd,
                            iters=20 if quick else 200, reps=2)
        res["ntt_per_s_dispatch"] = 64 * limbs / dtd
        return res
    except Exception as e:  # CPU / no Mosaic: fall back to the jnp MXU form
        print(f"pallas path unavailable ({type(e).__name__}); jnp fallback",
              file=sys.stderr)
        from matrix_fhe_tpu.ops import mxu_ntt
        tabs2 = mxu_ntt.build_tables(n, moduli)
        fn = jax.jit(lambda a: mxu_ntt.ntt_fwd(a, tabs2))
        dt = _time_fn(fn, (x,), iters=2 if quick else 5)
        return {"ntt_per_s": batch * limbs / dt, "dt": dt,
                "method": "mxu-fallback"}


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


def bench_wide_ntt(quick: bool) -> dict:
    """Wide (45/55-bit pair25) four-step MXU NTT throughput — the
    production-width transform (ops/wide_ntt.py), previously unreported
    (VERDICT r4 weak #3)."""
    from matrix_fhe_tpu.fast import wckks
    from matrix_fhe_tpu.ops import wide, wide_ntt

    logn = 12 if quick else 14
    limbs = 5 if quick else 7
    batch = 2 if quick else 4
    n = 1 << logn
    from matrix_fhe_tpu.utils import primes as pr
    g55 = pr.NTTFriendlyPrimesGenerator(55, 2 * n)
    g45 = pr.NTTFriendlyPrimesGenerator(45, 2 * n)
    moduli = [g55.next_alternating_prime()] + \
        g45.next_alternating_primes(limbs - 1)
    tabs = wide_ntt.build_tables(n, moduli)
    import numpy as np
    rng = np.random.default_rng(0)
    x = jnp.asarray(wide.pack_pair(np.stack(
        [np.stack([rng.integers(0, q, n, dtype=np.uint64) for q in moduli])
         for _ in range(batch)]), moduli))
    fn = jax.jit(lambda a: wide_ntt.ntt_bwd(wide_ntt.ntt_fwd(a, tabs), tabs))
    dt = _time_fn(fn, (x,), iters=3 if quick else 10)
    per_call = 2 * batch * limbs
    return {"wide_ntt_per_s": per_call / dt, "dt": dt, "logn": logn}


def bench_ct_mult(quick: bool) -> dict:
    """Config 3: CKKS ct-mult + relinearize + rescale on the int32 fast path
    (PN14QP438-equivalent bit budget: 19 q-limbs + 3 p-limbs of ~22-bit
    primes, rescale by pairs).  Bit-exactness of the step vs the u64
    evaluator is pinned in tests/test_fckks.py; operands here are uniform
    mod q (timing is data-independent)."""
    from matrix_fhe_tpu.fast import fckks

    logn = 12 if quick else 14
    num_q, num_p = (9, 2) if quick else (19, 3)
    ctx, (c0, c1, d0, d1) = fckks.make_synthetic_context(logn, num_q, num_p)

    # chained steady-state timing: fold the (rescaled, shorter) outputs back
    # into the full-level operands so iterations are data-dependent without
    # changing shapes (timing is data-independent; correctness is pinned in
    # tests/test_fckks.py)
    rq = ctx.ring_q

    def one(carry):
        c0, c1 = carry
        o0, o1 = fckks.mul_relin_rescale(ctx, c0, c1, d0, d1)
        pad = [(0, 0)] * (o0.ndim - 2) + [(0, num_q - o0.shape[-2]), (0, 0)]
        return rq.add(c0, jnp.pad(o0, pad)), rq.add(c1, jnp.pad(o1, pad))

    dt = _time_chained(one, (c0, c1), iters=10 if quick else 100)
    return {"ct_mult_per_s": 1.0 / dt, "dt": dt, "logn": logn,
            "num_q": num_q, "num_p": num_p}


def bench_rotate(quick: bool) -> dict:
    """Hoisted rotations on the int32 fast path: one decomposition, R
    MAC+ModDown+permute key-switches (RotateHoisted,
    core/rlwe/evaluator_automorphism.go:62)."""
    from matrix_fhe_tpu.fast import fckks

    logn = 12 if quick else 14
    num_q, num_p = (9, 2) if quick else (19, 3)
    R = 4 if quick else 8
    ctx, (c0, c1, _, _) = fckks.make_synthetic_context(
        logn, num_q, num_p, num_rot=R)
    gal_els = ctx.gal_els

    def one(carry):
        a0, a1 = carry
        outs = fckks.rotations_hoisted(ctx, a0, a1, gal_els)
        r0, r1 = outs[gal_els[0]]
        return ctx.ring_q.add(a0, r0), ctx.ring_q.add(a1, r1)

    dt = _time_chained(one, (c0, c1), iters=10 if quick else 50, reps=2)
    return {"rot_hoisted_per_s": R / dt, "dt": dt, "rotations": R,
            "logn": logn}


def bench_wide_ct_mult(quick: bool) -> dict:
    """Ct-mult + relinearize + rescale on the wide pair path (fast/wckks.py)
    with the EXACT PN14QP438 prime ladder (55+45x6-bit Q, 55x2-bit P —
    schemes/ckks/example_parameters.go:22-30,70-72).  Bit-exactness vs the
    u64 evaluator on these primes is pinned in tests/test_wring.py;
    operands here are uniform mod q."""
    import jax.lax as lax
    from matrix_fhe_tpu.fast import wckks

    logn = 12 if quick else 14
    if quick:
        ctx, (c0, c1, d0, d1) = wckks.make_synthetic_context(logn, 5, 2)
    else:
        ctx, (c0, c1, d0, d1) = wckks.make_synthetic_context(
            logn, 0, 0, moduli=(wckks.PN14QP438_Q, wckks.PN14QP438_P))
    num_q, num_p = ctx.ring_q.num_limbs, ctx.ring_p.num_limbs
    rq = ctx.ring_q

    def one(carry):
        a0, a1 = carry
        o0, o1 = wckks.mul_relin_rescale(ctx, a0, a1, d0, d1)
        pad = [(0, 0)] * (o0.ndim - 3) + [(0, 0), (0, num_q - o0.shape[-2]),
                                          (0, 0)]
        return rq.add(a0, jnp.pad(o0, pad)), rq.add(a1, jnp.pad(o1, pad))

    iters = 10 if quick else 30

    @jax.jit
    def run(c):
        return lax.fori_loop(0, iters, lambda _, v: one(v), c)

    jax.block_until_ready(run((c0, c1)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run((c0, c1)))
        best = min(best, time.perf_counter() - t0)
    dt = best / iters
    return {"wide_ct_mult_per_s": 1.0 / dt, "dt": dt, "logn": logn,
            "num_q": num_q, "num_p": num_p}


# -- roofline accounting (BASELINE: "profiled to speed-of-light per chip") ---
# TPU v5e (v5 lite) per-chip peaks: 394 TOPs int8 MXU, 197 TFLOPs bf16,
# 819 GB/s HBM.
V5E_INT8_OPS = 394e12
V5E_HBM_BPS = 819e9


def ntt_roofline(logn: int, limbs: int, per_s: float,
                 digit_planes: int = 3) -> dict:
    """Model the four-step digit-plane NTT: 2 matmul stages of
    [M, dK] @ [dK, dK'] int8 MACs per (limb, transform) + int32 in/out HBM
    traffic (pair path doubles bytes via digit_planes=7 and 8 B/coeff)."""
    n = 1 << logn
    a_bits = logn // 2
    R, C = 1 << a_bits, 1 << (logn - a_bits)
    d = digit_planes
    macs = C * (d * R) * (d * R) + R * (d * C) * (d * C)  # per limb-transform
    int8_ops = 2 * macs * per_s
    coeff_bytes = 8 if d == 7 else 4
    hbm = 2 * n * coeff_bytes * per_s  # read + write per limb-transform
    return {"mxu_util": round(int8_ops / V5E_INT8_OPS, 4),
            "hbm_frac": round(hbm / V5E_HBM_BPS, 4)}


def bench_ct_mult_u64(quick: bool) -> dict:
    """Reference-parity u64 evaluator path (secondary metric)."""
    from matrix_fhe_tpu.flagship import build_flagship, make_step

    logn = 12 if quick else 14
    params, sk, rlk, ev, ct1, ct2 = build_flagship(logn=logn, num_q=6 if quick else 9)
    step = jax.jit(make_step(params, ev, ct1.metadata))
    args = (ct1.value[0], ct1.value[1], ct2.value[0], ct2.value[1], rlk)
    dt = _time_fn(step, args, iters=2 if quick else 5, warmup=1)
    return {"ct_mult_per_s": 1.0 / dt, "dt": dt, "logn": logn}


def bench_wide61_ct_mult(quick: bool) -> dict:
    """Ct-mult + relinearize + rescale on the pair31 (6-plane) wide path
    with the reference bootstrap sets' widths: 60-bit q0 + 45-bit scale
    primes, 61-bit P (default_parameters.go:45-65 N16QP1547 residual
    shape).  Bit-exactness on 60/61-bit primes is pinned in
    tests/test_wring.py[pair31] and tests/test_wide61.py."""
    import jax.lax as lax
    from matrix_fhe_tpu.fast import wckks

    logn = 12 if quick else 14
    num_q = 4 if quick else 6
    ctx, (c0, c1, d0, d1) = wckks.make_synthetic_context(
        logn, num_q, 2, q_bits=(60,) + (45,) * 8, p_bits=61)
    assert ctx.ring_q.tabs.nplanes == 6
    rq = ctx.ring_q

    def one(carry):
        a0, a1 = carry
        o0, o1 = wckks.mul_relin_rescale(ctx, a0, a1, d0, d1)
        pad = [(0, 0)] * (o0.ndim - 3) + [(0, 0), (0, num_q - o0.shape[-2]),
                                          (0, 0)]
        return rq.add(a0, jnp.pad(o0, pad)), rq.add(a1, jnp.pad(o1, pad))

    iters = 10 if quick else 30

    @jax.jit
    def run(c):
        return lax.fori_loop(0, iters, lambda _, v: one(v), c)

    jax.block_until_ready(run((c0, c1)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run((c0, c1)))
        best = min(best, time.perf_counter() - t0)
    dt = best / iters
    return {"wide61_ct_mult_per_s": 1.0 / dt, "dt": dt, "logn": logn,
            "num_q": num_q, "num_p": 2}


def main() -> None:
    quick = "--quick" in sys.argv
    print(f"devices: {jax.devices()}", file=sys.stderr)

    ntt = bench_ntt(quick)
    print(f"ntt (pallas w22): {ntt}", file=sys.stderr)
    try:
        wntt = bench_wide_ntt(quick)
        print(f"ntt (wide 45/55-bit): {wntt}", file=sys.stderr)
    except Exception as e:  # pragma: no cover
        print(f"wide ntt bench failed: {e}", file=sys.stderr)
        wntt = None
    try:
        ntt64 = bench_ntt_u64(quick)
        print(f"ntt (u64 45-bit): {ntt64}", file=sys.stderr)
    except Exception as e:
        print(f"u64 ntt bench failed: {e}", file=sys.stderr)
        ntt64 = None
    try:
        ct = bench_ct_mult(quick)
        print(f"ct_mult (fast int32): {ct}", file=sys.stderr)
    except Exception as e:  # pragma: no cover
        print(f"ct_mult bench failed: {e}", file=sys.stderr)
        ct = None
    try:
        rot = bench_rotate(quick)
        print(f"rotate (fast int32, hoisted): {rot}", file=sys.stderr)
    except Exception as e:  # pragma: no cover
        print(f"rotate bench failed: {e}", file=sys.stderr)
        rot = None
    try:
        wct = bench_wide_ct_mult(quick)
        print(f"ct_mult (wide 45/55-bit): {wct}", file=sys.stderr)
    except Exception as e:  # pragma: no cover
        print(f"wide ct_mult bench failed: {e}", file=sys.stderr)
        wct = None
    try:
        w61 = bench_wide61_ct_mult(quick)
        print(f"ct_mult (wide61 60/45/61-bit): {w61}", file=sys.stderr)
    except Exception as e:  # pragma: no cover
        print(f"wide61 ct_mult bench failed: {e}", file=sys.stderr)
        w61 = None
    try:
        ct64 = bench_ct_mult_u64(quick)
        print(f"ct_mult (u64 45-bit): {ct64}", file=sys.stderr)
    except Exception as e:  # pragma: no cover
        print(f"ct_mult u64 bench failed: {e}", file=sys.stderr)
        ct64 = None

    target = 1e6  # BASELINE.json north star: >= 10^6 N=2^14 RNS-NTTs/s/chip
    result = {
        "metric": "rns_ntt_per_s_n2^14",
        "value": round(ntt["ntt_per_s"], 1),
        "unit": "NTT/s/chip",
        "vs_baseline": round(ntt["ntt_per_s"] / target, 4),
        # timing method for apples-to-apples round comparisons (ADVICE r2):
        # r1 = "per-dispatch", r2 = "chained" (fori_loop of kernel launches),
        # r3+ = "fused-chain" (k transforms in ONE kernel, VMEM-resident;
        # ntt_per_s_dispatch is the r2-comparable launch-per-transform rate).
        "timing": ntt.get("method", "chained"),
    }
    if "ntt_per_s_dispatch" in ntt:
        result["ntt_per_s_dispatch"] = round(ntt["ntt_per_s_dispatch"], 1)
    if ct is not None:
        result["ct_mult_relin_rescale_per_s"] = round(ct["ct_mult_per_s"], 2)
    if rot is not None:
        result["rot_hoisted_per_s"] = round(rot["rot_hoisted_per_s"], 2)
    if wct is not None:
        result["wide_ct_mult_per_s"] = round(wct["wide_ct_mult_per_s"], 2)
        result["wide_ct_mult_logn"] = wct["logn"]
        if not quick:
            result["wide_ct_mult_ladder"] = "PN14QP438-exact"
    if w61 is not None:
        result["wide61_ct_mult_per_s"] = round(w61["wide61_ct_mult_per_s"], 2)
        result["wide61_ct_mult_logn"] = w61["logn"]
    if ntt64 is not None:
        result["u64_ntt_per_s"] = round(ntt64["ntt_per_s"], 1)
    # roofline accounting vs the v5e chip peaks (speed-of-light audit)
    result["roofline_ntt"] = ntt_roofline(14, 1, ntt["ntt_per_s"],
                                          digit_planes=3)
    if wntt is not None:
        result["wide_ntt_per_s"] = round(wntt["wide_ntt_per_s"], 1)
        result["roofline_wide_ntt"] = ntt_roofline(
            wntt["logn"], 1, wntt["wide_ntt_per_s"], digit_planes=7)
    # measured-offline bootstrap number (the full pipeline takes ~10+ min of
    # keygen+compile, too slow to re-run inside every bench invocation;
    # tools/probe_wboot_stage.py writes the committed artifact).  A missing
    # artifact is a LOUD failure (VERDICT r4 next #1), not a silent pass.
    import glob
    import os
    boots = sorted(glob.glob(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BOOT_r*.json")))
    if boots:
        with open(boots[-1]) as f:
            boot = json.load(f)
        result["bootstrap_per_s"] = boot["bootstrap_per_s"]
        result["bootstrap_logn"] = boot["logn"]
        result["bootstrap_precision_bits"] = boot.get("precision_mean_bits")
        result["bootstrap_slots"] = boot.get("slots")
        result["bootstrap_artifact"] = os.path.basename(boots[-1])
    else:
        print("ERROR: no BOOT_r*.json bootstrap artifact committed — run "
              "tools/probe_wboot_stage.py on the chip and commit the result",
              file=sys.stderr)
        result["bootstrap_per_s"] = None
        result["bootstrap_missing"] = True
    print(json.dumps(result))


if __name__ == "__main__":
    main()
