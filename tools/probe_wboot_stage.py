"""Stage-wise-jitted wide bootstrap on the TPU: one compiled graph per
pipeline stage (the whole-pipeline graph exceeds the remote-compile upload
limit), a dozen launches per bootstrap instead of ~50k eager dispatches.
The staging machinery is library code: circuits/ckks/staged.py.

Usage: python tools/probe_wboot_stage.py [logn] [--wide61] [--out PATH]
  --wide61: use the reference-width pair31 preset (60-bit q0, 61-bit P,
  58-bit C2S) instead of the 45/55-bit pair25 preset.
"""
import json
import sys
import time

import jax
import numpy as np

from matrix_fhe_tpu.circuits.ckks import bootstrapping as btp, staged
from matrix_fhe_tpu.fast import fboot, weval
from matrix_fhe_tpu.rlwe import decryptor, encryptor, keys as K

args = [a for a in sys.argv[1:] if not a.startswith("-")]
logn = int(args[0]) if args else 12
wide61 = "--wide61" in sys.argv
path = (sys.argv[sys.argv.index("--out") + 1] if "--out" in sys.argv
        else "BOOT_r05.json")

t0 = time.perf_counter()
print("devices:", jax.devices())
lit = (fboot.wide61_parameters_literal(logn, sparse_weight=32) if wide61
       else fboot.wide_parameters_literal(logn, sparse_weight=32))
p = btp.Parameters(lit)
params = p.params
print(f"params: logN={logn} L={params.max_level} LP={len(params.p)} "
      f"slots=2^{p.log_slots} [{time.perf_counter()-t0:.1f}s]")

sk = K.gen_secret_key(jax.random.key(0), params)
evk = btp.gen_evaluation_keys(jax.random.key(1), p, sk)
print(f"keys [{time.perf_counter()-t0:.1f}s]")
bts = fboot.make_wide_bootstrapper(p, evk)
print(f"evaluator [{time.perf_counter()-t0:.1f}s]")

bootstrap_staged = staged.StagedBootstrapper(bts)
bootstrap_staged.on_stage = \
    lambda n: print(f"  stage {n} done [{time.perf_counter()-t0:.1f}s]",
                    flush=True)

print("building staged pipeline: first call compiles each stage", flush=True)
rng = np.random.default_rng(0)
v = rng.uniform(-1, 1, params.max_slots)
# encode with the U64 encoder: the u64 encryptor consumes u64 plaintexts
# (the WideEncoder's pair-plaintext form is for the evaluator's internals)
pt = bts.enc._u64.encode(v, level=p.residual_level)
ct = weval.ct_to_wide(
    encryptor.encrypt(jax.random.key(3), params, sk, pt), params)
print(f"encrypted [{time.perf_counter()-t0:.1f}s]", flush=True)

t1 = time.perf_counter()
out = bootstrap_staged(ct)
jax.block_until_ready(out.value)
print(f"staged bootstrap compile+run: {time.perf_counter()-t1:.1f}s "
      f"[{time.perf_counter()-t0:.1f}s]")
bootstrap_staged.on_stage = None

best = float("inf")
for _ in range(3):
    t1 = time.perf_counter()
    out = bootstrap_staged(ct)
    jax.block_until_ready(out.value)
    best = min(best, time.perf_counter() - t1)
print(f"bootstrap steady-state: {best:.3f}s -> {1/best:.3f} bootstraps/s "
      f"(logN={logn})")

got = bts.enc._u64.decode(
    decryptor.decrypt(params, sk, weval.ct_to_u64(out, params)))
err = np.abs(np.asarray(got).real[: len(v)] - v)
prec = -np.log2(np.maximum(err, 1e-17))
print(f"precision: mean={prec.mean():.2f} min={prec.min():.2f} bits")

art = {"bootstrap_per_s": round(1 / best, 4), "seconds": round(best, 3),
       "logn": logn,
       "chain": ("wide61 60/45/61-bit (pair31)" if wide61
                 else "wide 45/55-bit (pair25)"),
       "slots": 1 << p.log_slots,
       "precision_mean_bits": round(float(prec.mean()), 2),
       "precision_min_bits": round(float(prec.min()), 2),
       "backend": jax.default_backend(), "staging": "per-stage jit"}
# merge: keep every run in "entries", headline = highest-logN entry
import os
entries = []
if os.path.exists(path):
    with open(path) as f:
        old = json.load(f)
    entries = old.get("entries", [])
    old.pop("entries", None)
    if old and old not in entries:
        entries.append(old)
entries = [e for e in entries
           if not (e["logn"] == logn and e["chain"] == art["chain"]
                   and e["backend"] == art["backend"])]
entries.append(dict(art))
head = max(entries, key=lambda e: (e["backend"] == "tpu", e["logn"],
                                   e["bootstrap_per_s"]))
head = dict(head)
head["entries"] = entries
with open(path, "w") as f:
    json.dump(head, f, indent=1)
print(f"wrote {path}")
print(f"total [{time.perf_counter()-t0:.1f}s]")
