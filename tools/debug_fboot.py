"""Staged-decryption debug of the word-size-reduced bootstrap (u64 path).

Decrypts after every pipeline stage to locate precision loss.  Run on CPU:
  JAX_PLATFORMS=cpu python tools/debug_fboot.py
"""

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from matrix_fhe_tpu.circuits.ckks import bootstrapping as btp
from matrix_fhe_tpu.fast import fboot
from matrix_fhe_tpu.rlwe import decryptor, encryptor, keys as K
from matrix_fhe_tpu.schemes import ckks

lit = fboot.fast_parameters_literal(6, residual_levels=2, sparse_weight=0)
p = btp.Parameters(lit)
params = p.params
print("chain:", [f"{q:#x}({q.bit_length()}b)" for q in params.q])
print("levels: residual", p.residual_level, "max", params.max_level,
      "c2s lvl", p.c2s_lit.level_q, "s2c lvl", p.s2c_lit.level_q,
      "mod1 lvl", p.mod1_lit.level_q)

sk = K.gen_secret_key(jax.random.key(0), p.params)
evk = btp.gen_evaluation_keys(jax.random.key(1), p, sk)
ev = btp.Evaluator(p, evk)
enc = ev.enc

rng = np.random.default_rng(0)
v = (rng.uniform(-1, 1, params.max_slots)
     + 1j * rng.uniform(-1, 1, params.max_slots))
pt = enc.encode(v, level=p.residual_level)
ct = encryptor.encrypt(jax.random.key(3), params, sk, pt)


def show(tag, ct, want=None):
    got = enc.decode(decryptor.decrypt(params, sk, ct))
    print(f"{tag}: level={ct.level} scale={float(ct.scale):.6g}")
    if want is not None:
        err = np.abs(got - want)
        print(f"    prec avg {-np.log2(np.mean(err) + 1e-30):.2f} "
              f"min {-np.log2(np.max(err) + 1e-30):.2f}")
    return got


show("input", ct, v)

ct0 = ev.scale_down(ct)
show("scale_down", ct0, v)

ct1 = ev.mod_up(ct0)
# After ModUp the message is m + q0*I at the bottom scale; decode mod-q0-ish
got = enc.decode(decryptor.decrypt(params, sk, ct1))
print("mod_up: level", ct1.level, "scale", float(ct1.scale))
q0 = params.q[0]
m1 = ev.mod1_params
print("    msg/q0:", np.abs(got[:4]) / (q0 / float(m1.message_ratio)))

ct_real, ct_imag = ev.coeffs_to_slots(ct1)
print("c2s: level", ct_real.level, "scale", float(ct_real.scale))

# expected C2S output: (m/q0 + I)/ (K*q_diff)-ish; check EvalMod directly
r = ev.eval_mod(ct_real)
i = ev.eval_mod(ct_imag) if ct_imag is not None else None
print("eval_mod: level", r.level, "scale", float(r.scale))
want_re = np.concatenate([np.real(v), np.imag(v)])[: params.max_slots]
# real part holds Re coefficients after C2S+EvalMod; compare decoded directly
got_r = enc.decode(decryptor.decrypt(params, sk, r))
# the slots now hold coeff-domain values scaled; just report magnitudes
print("    evalmod out sample:", got_r[:4])

out = ev.slots_to_coeffs(r, i)
show("s2c(final)", out, v)


# -- isolate EvalMod: numerical simulation on decrypted C2S slots ------------
evm = ev.mod1_params
z = enc.decode(decryptor.decrypt(params, sk, ct_real))  # declared scale 2^15
# eval_mod reinterprets the input at scaling_factor: u = Re(z)*orig/scaling
u = np.real(z) / float(m1.message_ratio)

a_i, b_i = evm.mod1_poly.interval.a, evm.mod1_poly.interval.b
offset = -0.5 / (evm.interval_shrink_factor * float(b_i - a_i))
u = u + offset
Kp = float(b_i)  # symmetric interval [-K', K']
sqrt2pi = evm.sqrt_2pi
# poly.evaluate applies the change of basis internally: feed t = u*K'
y = np.array([complex(evm.mod1_poly.evaluate(t)).real for t in u * Kp])
for _ in range(evm.double_angle):
    sqrt2pi *= sqrt2pi
    y = 2 * y * y - sqrt2pi
want_evalmod = y * float(m1.message_ratio)

got_em = np.real(enc.decode(decryptor.decrypt(params, sk, r)))
err = np.abs(got_em - want_evalmod)
print("evalmod vs numeric-sim: avg prec",
      -np.log2(np.mean(err) + 1e-30), "max err", err.max())

# ideal: the C2S slots hold (m/q0 + I)/K (+offset)...; recover the message
# value the pipeline should produce: frac((u-offset)*K*2?)  -- instead
# compare the final output against v separately (printed above).
x_full = (np.real(z) / float(m1.message_ratio) ) * float(evm.k)
print("x=(m/q0+I) range:", x_full.min(), x_full.max())
frac = x_full - np.round(x_full)
want_msg = frac * float(m1.message_ratio) * float(evm.k) / float(evm.k)
err2 = np.abs(got_em - frac * float(m1.message_ratio))
print("evalmod vs ideal mod1(msg): avg prec", -np.log2(np.mean(err2) + 1e-30))
