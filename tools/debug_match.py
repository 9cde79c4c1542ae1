"""Instrument Evaluator._match / add paths for suspicious scale ratios."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

from fractions import Fraction
from matrix_fhe_tpu.schemes import ckks
from matrix_fhe_tpu.schemes.ckks import evaluator as ev_mod

orig_match = ev_mod.Evaluator._match
events = []

def patched(self, a, b):
    if a.scale != b.scale:
        lo, hi = (a, b) if a.scale < b.scale else (b, a)
        r = hi.scale / lo.scale
        fr = float(r)
        frac_err = float(r - int(r)) / max(float(int(r)), 1e-30) if int(r) >= 1 else 1.0
        events.append((fr, frac_err))
    return orig_match(self, a, b)

ev_mod.Evaluator._match = patched

orig_addplain = ev_mod.Evaluator.add_plain
def patched_ap(self, a, pt):
    if pt.scale != a.scale:
        r = a.scale / pt.scale
        events.append((float(r), "add_plain" if r.denominator == 1 else f"ADD_PLAIN_NONINT {float(r)}"))
    return orig_addplain(self, a, pt)
ev_mod.Evaluator.add_plain = patched_ap

from matrix_fhe_tpu.circuits.ckks import bootstrapping as btp
from matrix_fhe_tpu.fast import fboot
from matrix_fhe_tpu.rlwe import decryptor, encryptor, keys as K

lit = fboot.fast_parameters_literal(6, residual_levels=2, sparse_weight=0)
p = btp.Parameters(lit)
params = p.params
sk = K.gen_secret_key(jax.random.key(0), p.params)
evk = btp.gen_evaluation_keys(jax.random.key(1), p, sk)
ev = btp.Evaluator(p, evk)
enc = ev.enc
rng = np.random.default_rng(0)
v = (rng.uniform(-1, 1, params.max_slots) + 1j * rng.uniform(-1, 1, params.max_slots))
pt = enc.encode(v, level=p.residual_level)
ct = encryptor.encrypt(jax.random.key(3), params, sk, pt)
out = ev.bootstrap(ct)
got = enc.decode(decryptor.decrypt(params, sk, out))
err = np.abs(got - v)
print("final prec:", -np.log2(np.mean(err) + 1e-30))
print(f"{len(events)} scale-mismatched combines:")
for e in sorted(set(str(x) for x in events)):
    print("  ", e)
