"""CPU precision probe for the wide bootstrap presets.

Usage: [W61=1] python tools/probe_boot_precision.py <logn> <sparse_weight>
W61=1 selects the reference-width pair31 preset (60-bit q0 / 61-bit P).
Round-5 measurements: 45/55 preset logN=8 h=32 -> 22.1 bits mean;
wide61 preset logN=10 h=32 -> 24.5 bits mean.
"""
import sys
import numpy as np
import jax
from matrix_fhe_tpu.circuits.ckks import bootstrapping as btp
from matrix_fhe_tpu.fast import fboot, weval
from matrix_fhe_tpu.rlwe import decryptor, encryptor, keys as K

logn = int(sys.argv[1]); sw = int(sys.argv[2])
import os
lit = (fboot.wide61_parameters_literal(logn, sparse_weight=sw)
       if os.environ.get("W61") else
       fboot.wide_parameters_literal(logn, sparse_weight=sw))
p = btp.Parameters(lit)
params = p.params
sk = K.gen_secret_key(jax.random.key(0), params)
evk = btp.gen_evaluation_keys(jax.random.key(1), p, sk)
bts = fboot.make_wide_bootstrapper(p, evk)
rng = np.random.default_rng(0)
v = rng.uniform(-1, 1, params.max_slots)
pt = bts.enc._u64.encode(v, level=p.residual_level)
ct = weval.ct_to_wide(encryptor.encrypt(jax.random.key(3), params, sk, pt), params)
out = bts.bootstrap(ct)
got = bts.enc._u64.decode(decryptor.decrypt(params, sk, weval.ct_to_u64(out, params)))
err = np.abs(np.asarray(got).real[: len(v)] - v)
prec = -np.log2(np.maximum(err, 1e-17))
print(f"logn={logn} sw={sw}: mean={prec.mean():.2f} min={prec.min():.2f}")
