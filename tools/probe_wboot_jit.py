"""Probe: jit the ENTIRE wide bootstrap pipeline as one XLA graph and time
it on the current backend.

Usage: python tools/probe_wboot_jit.py [logn] [--synthetic]

With --synthetic, keys are uniform-random arrays (timing-identical,
garbage payload) so the probe starts fast; without, real keys are
generated and the refreshed precision is printed.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from matrix_fhe_tpu.circuits.ckks import bootstrapping as btp
from matrix_fhe_tpu.fast import fboot, weval
from matrix_fhe_tpu.ops import wide
from matrix_fhe_tpu.rlwe import decryptor, encryptor, keys as K
from matrix_fhe_tpu.rlwe.elements import Ciphertext

logn = int(sys.argv[1]) if len(sys.argv) > 1 else 12
synthetic = "--synthetic" in sys.argv

t0 = time.perf_counter()
print("devices:", jax.devices())
lit = fboot.wide_parameters_literal(logn, sparse_weight=32)
p = btp.Parameters(lit)
params = p.params
print(f"params: logN={logn} L={params.max_level} LP={len(params.p)} "
      f"slots=2^{p.log_slots} gal={len(p.galois_elements())} "
      f"[{time.perf_counter()-t0:.1f}s]")

if synthetic:
    rng = np.random.default_rng(0)

    def unif_gadget():
        D = -(-len(params.q) // len(params.p))
        gq = np.stack([np.stack([
            np.stack([rng.integers(0, q, params.n, dtype=np.uint64)
                      for q in params.q]) for _ in range(2)])
            for _ in range(D)])
        gp = np.stack([np.stack([
            np.stack([rng.integers(0, q, params.n, dtype=np.uint64)
                      for q in params.p]) for _ in range(2)])
            for _ in range(D)])
        return K.GadgetCiphertext(q=jnp.asarray(gq), p=jnp.asarray(gp))

    rlk = K.RelinearizationKey(gadget=unif_gadget())
    gks = {g: K.GaloisKey(gadget=unif_gadget(), gal_el=g)
           for g in p.galois_elements()}
    evk = btp.EvaluationKeys(rlk=rlk, gks=gks,
                             evk_dense_to_sparse=None,
                             evk_sparse_to_dense=None)
    sk = None
else:
    sk = K.gen_secret_key(jax.random.key(0), params)
    evk = btp.gen_evaluation_keys(jax.random.key(1), p, sk)
print(f"keys [{time.perf_counter()-t0:.1f}s]")

bts = fboot.make_wide_bootstrapper(p, evk)
print(f"evaluator [{time.perf_counter()-t0:.1f}s]")

rng = np.random.default_rng(0)
v = rng.uniform(-1, 1, params.max_slots)
if sk is not None:
    pt = bts.enc.encode(v, level=p.residual_level)
    ct = weval.ct_to_wide(
        encryptor.encrypt(jax.random.key(3), params, sk, pt), params)
else:
    lq = p.residual_level + 1
    vals = tuple(jnp.asarray(wide.pack_pair(
        np.stack([rng.integers(0, q, params.n, dtype=np.uint64)
                  for q in params.q[:lq]]), params.q[:lq]))
        for _ in range(2))
    pt = bts.enc.encode(v, level=p.residual_level)
    ct = Ciphertext(value=vals, metadata=pt.metadata)

meta_in = ct.metadata
out_meta = {}


def boot_fn(c0, c1):
    inp = Ciphertext(value=(c0, c1), metadata=meta_in)
    out = bts.bootstrap(inp)
    out_meta["meta"] = out.metadata
    return out.value


jfn = jax.jit(boot_fn)
t1 = time.perf_counter()
res = jax.block_until_ready(jfn(ct.value[0], ct.value[1]))
print(f"bootstrap jit compile+run: {time.perf_counter()-t1:.1f}s "
      f"[{time.perf_counter()-t0:.1f}s]")

best = float("inf")
for _ in range(3):
    t1 = time.perf_counter()
    res = jax.block_until_ready(jfn(ct.value[0], ct.value[1]))
    best = min(best, time.perf_counter() - t1)
print(f"bootstrap steady-state: {best:.3f}s -> {1/best:.3f} bootstraps/s "
      f"(logN={logn})")

prec = None
if sk is not None:
    out = Ciphertext(value=tuple(res), metadata=out_meta["meta"])
    got = bts.enc.decode(
        decryptor.decrypt(params, sk, weval.ct_to_u64(out, params)))
    err = np.abs(np.asarray(got).real[: len(v)] - v)
    prec = -np.log2(np.maximum(err, 1e-17))
    print(f"precision: mean={prec.mean():.2f} min={prec.min():.2f} bits")
print(f"total [{time.perf_counter()-t0:.1f}s]")

# record the measured number for bench.py to carry (measured_offline tag)
import json
art = {"bootstrap_per_s": round(1 / best, 4), "seconds": round(best, 3),
       "logn": logn, "chain": "wide 45/55-bit",
       "slots": 1 << p.log_slots, "synthetic_keys": synthetic,
       "backend": jax.default_backend()}
if prec is not None:
    art["precision_mean_bits"] = round(float(prec.mean()), 2)
    art["precision_min_bits"] = round(float(prec.min()), 2)
with open("BOOT_r04.json", "w") as f:
    json.dump(art, f, indent=1)
print("wrote BOOT_r04.json")
