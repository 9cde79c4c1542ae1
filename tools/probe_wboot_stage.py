"""Stage-wise-jitted wide bootstrap on the TPU: one compiled graph per
pipeline stage (the whole-pipeline graph exceeds the remote-compile upload
limit), a dozen launches per bootstrap instead of ~50k eager dispatches.

Usage: python tools/probe_wboot_stage.py [logn] [--wide61]
  --wide61: use the reference-width pair31 preset (60-bit q0, 61-bit P,
  58-bit C2S) instead of the 45/55-bit pair25 preset.
"""
import json
import sys
import time

import jax
import numpy as np

from matrix_fhe_tpu.circuits.ckks import bootstrapping as btp, dft, mod1
from matrix_fhe_tpu.fast import fboot, weval
from matrix_fhe_tpu.rlwe import decryptor, encryptor, keys as K
from matrix_fhe_tpu.rlwe.elements import Ciphertext

args = [a for a in sys.argv[1:] if not a.startswith("-")]
logn = int(args[0]) if args else 12
wide61 = "--wide61" in sys.argv

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
ev = bts.ev
print(f"evaluator [{time.perf_counter()-t0:.1f}s]")


def jit_ct(fn, n_in=1, n_out=1):
    """Jit a Ciphertext-tuple function at the array level.

    The evaluator's big device-resident state (wide context with all keys,
    converted lintrans diagonals, encapsulation-key pairs) is threaded as
    jit ARGUMENTS — closure-captured arrays would be inlined into the HLO
    as constants, and the resulting compile payloads (100s of MB of keys)
    exceed the remote-compile upload limit.  The evaluator's caches are
    temporarily pointed at the traced pytrees during tracing."""
    cache = {}

    def wrapped(*cts):
        key = tuple((c.level, c.scale, c.metadata.is_ntt, len(c.value))
                    for c in cts)
        state = (ev._ctx_cache[params.max_level], dict(ev._wlt_cache),
                 dict(ev._evk_cache))
        if key not in cache:
            metas = [c.metadata for c in cts]
            degs = [len(c.value) for c in cts]
            holder = {}

            def raw(ctx_top, wlt_cache, evk_cache, *flat):
                saved = (ev._ctx_cache, ev._wlt_cache, ev._evk_cache)
                ev._ctx_cache = {ctx_top.level: ctx_top}
                ev._wlt_cache = wlt_cache
                ev._evk_cache = evk_cache
                try:
                    ins = []
                    i = 0
                    for m, d in zip(metas, degs):
                        ins.append(Ciphertext(value=tuple(flat[i:i + d]),
                                              metadata=m))
                        i += d
                    outs = fn(*ins)
                    if n_out == 1:
                        outs = (outs,)
                    holder["meta"] = [None if o is None else o.metadata
                                      for o in outs]
                    holder["deg"] = [0 if o is None else len(o.value)
                                     for o in outs]
                    flat_out = []
                    for o in outs:
                        if o is not None:
                            flat_out.extend(o.value)
                    return tuple(flat_out)
                finally:
                    ev._ctx_cache, ev._wlt_cache, ev._evk_cache = saved

            cache[key] = (jax.jit(raw), holder)
        f, holder = cache[key]
        flat = [v for c in cts for v in c.value]
        res = f(*state, *flat)
        outs = []
        i = 0
        for m, d in zip(holder["meta"], holder["deg"]):
            outs.append(None if m is None else
                        Ciphertext(value=tuple(res[i:i + d]), metadata=m))
            i += d
        return outs[0] if n_out == 1 else tuple(outs)

    return wrapped


# -- staged pipeline ---------------------------------------------------------

def head(ct):
    ct = bts.scale_down(ct)
    if bts.evk_dense_to_sparse is not None:
        ct = ev.apply_evaluation_key(ct, bts.evk_dense_to_sparse)
    return bts.mod_up(ct)


c2s_mats = bts.c2s_matrix.matrices
s2c_mats = bts.s2c_matrix.matrices
lit_fmt = bts.c2s_matrix.literal


def c2s_tail(zv):
    from fractions import Fraction
    ct_real = ev.conjugate(zv)
    ct_imag = ev.mul_const_complex(ev.sub(zv, ct_real), -1j,
                                   scale=Fraction(1))
    ct_real = ev.add(ct_real, zv)
    if (lit_fmt.format == dft.REPACK_IMAG_AS_REAL
            and lit_fmt.log_slots < params.log_n - 1):
        ct_imag = ev.rotate(ct_imag, 1 << lit_fmt.log_slots)
        return ev.add(ct_real, ct_imag), ct_real  # second unused
    return ct_real, ct_imag


def s2c_head(ct_real, ct_imag):
    from fractions import Fraction
    return ev.add(ev.mul_const_complex(ct_imag, 1j, scale=Fraction(1)),
                  ct_real)


stage_head = jit_ct(head)
stage_mat = [jit_ct(lambda c, m=m: ev.rescale(ev.evaluate_lintrans(c, m)))
             for m in c2s_mats]
stage_c2s_tail = jit_ct(c2s_tail, n_out=2)
stage_evalmod = jit_ct(lambda c: bts.eval_mod(c))
stage_s2c_head = jit_ct(s2c_head, n_in=2)
stage_s2c = [jit_ct(lambda c, m=m: ev.rescale(ev.evaluate_lintrans(c, m)))
             for m in s2c_mats]

repack = (lit_fmt.format == dft.REPACK_IMAG_AS_REAL
          and lit_fmt.log_slots < params.log_n - 1)


_first = [True]


def _tick(name):
    if _first[0]:
        print(f"  stage {name} done [{time.perf_counter()-t0:.1f}s]",
              flush=True)


def bootstrap_staged(ct):
    ct = stage_head(ct)
    _tick("head")
    for i, s in enumerate(stage_mat):
        ct = s(ct)
        _tick(f"c2s[{i}]")
    ct_real, ct_imag = stage_c2s_tail(ct)
    _tick("c2s_tail")
    if repack:
        ct = stage_evalmod(ct_real)
        _tick("evalmod")
    else:
        ct_real = stage_evalmod(ct_real)
        ct_imag = stage_evalmod(ct_imag)
        _tick("evalmod2")
        ct = stage_s2c_head(ct_real, ct_imag)
    for i, s in enumerate(stage_s2c):
        ct = s(ct)
        _tick(f"s2c[{i}]")
    _first[0] = False
    return ct


print("building staged pipeline: first call compiles each stage",
      flush=True)
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
path = "BOOT_r05.json"
entries = []
if os.path.exists(path):
    with open(path) as f:
        old = json.load(f)
    entries = old.get("entries", [])
    old.pop("entries", None)
    if old and old not in entries:
        entries.append(old)
entries = [e for e in entries
           if not (e["logn"] == logn and e["chain"] == art["chain"])]
entries.append(dict(art))
head = max(entries, key=lambda e: (e["logn"], e["bootstrap_per_s"]))
head = dict(head)
head["entries"] = entries
with open(path, "w") as f:
    json.dump(head, f, indent=1)
print("wrote BOOT_r05.json")
print(f"total [{time.perf_counter()-t0:.1f}s]")
