"""Probe: time the int32 fast bootstrap at logN=14 on the current backend."""
import time

import jax
import numpy as np

from matrix_fhe_tpu.circuits.ckks import bootstrapping as btp
from matrix_fhe_tpu.fast import fboot, feval
from matrix_fhe_tpu.rlwe import encryptor, decryptor, keys as K

t0 = time.perf_counter()
print("devices:", jax.devices())
lit = fboot.fast_parameters_literal(14)
p = btp.Parameters(lit)
print(f"params: logN={p.params.log_n} L={p.params.max_level} "
      f"LP={len(p.params.p)} slots=2^{p.log_slots} "
      f"gal_els={len(p.galois_elements())}  [{time.perf_counter()-t0:.1f}s]")

sk = K.gen_secret_key(jax.random.key(0), p.params)
evk = btp.gen_evaluation_keys(jax.random.key(1), p, sk)
print(f"keys done [{time.perf_counter()-t0:.1f}s]")

ev = fboot.make_fast_bootstrapper(p, evk)
print(f"evaluator built [{time.perf_counter()-t0:.1f}s]")

enc = ev.enc
rng = np.random.default_rng(0)
v = rng.uniform(-1, 1, p.params.max_slots)
pt = enc.encode(v, level=p.residual_level)
ct = feval.ct_to_fast(encryptor.encrypt(jax.random.key(3), p.params, sk, pt))

t1 = time.perf_counter()
out = ev.bootstrap(ct)
jax.block_until_ready(out.value)
print(f"bootstrap #1 (compile+run): {time.perf_counter()-t1:.1f}s")

for i in range(3):
    t1 = time.perf_counter()
    out = ev.bootstrap(ct)
    jax.block_until_ready(out.value)
    print(f"bootstrap #{i+2}: {time.perf_counter()-t1:.3f}s")

# precision
got = enc.decode(decryptor.decrypt(p.params, sk, feval.ct_to_u64(out)))
err = np.abs(np.asarray(got)[: len(v)] - v)
prec = -np.log2(np.maximum(err, 1e-16))
print(f"precision: mean={prec.mean():.2f} min={prec.min():.2f} bits")
print(f"total [{time.perf_counter()-t0:.1f}s]")
