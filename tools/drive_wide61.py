"""Drive the pair31 (60/61-bit) wide path end-to-end on the real TPU chip.

User-level flow: build a reference-bootstrap-shaped chain (60-bit q0,
45-bit scale primes, 61-bit P), encrypt real data, run the jitted
mul+relin+rescale composite and a hoisted rotation ON DEVICE, and
cross-check bit-exact against the independent u64 evaluator (computed
separately) plus decode precision.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from matrix_fhe_tpu.fast import wckks
from matrix_fhe_tpu.ops import wide
from matrix_fhe_tpu.rlwe import decryptor, encryptor, keys as K
from matrix_fhe_tpu.schemes import ckks
from matrix_fhe_tpu.utils import primes as pr

t0 = time.perf_counter()
print("devices:", jax.devices())

logn, n = 12, 1 << 12
g60 = pr.NTTFriendlyPrimesGenerator(60, 2 * n)
g61 = pr.NTTFriendlyPrimesGenerator(61, 2 * n)
g45 = pr.NTTFriendlyPrimesGenerator(45, 2 * n)
Q = [g60.next_alternating_prime()] + g45.next_alternating_primes(5)
P = g61.next_alternating_primes(2)
params = ckks.new_parameters(ckks.CKKSParametersLiteral(
    logn=logn, q=tuple(Q), p=tuple(P), log_default_scale=45))
assert wide.use_pair31(Q + P), "chain must trip the pair31 mode"
print(f"chain: q0={Q[0].bit_length()}b x1 + 45b x5, P={P[0].bit_length()}b x2 "
      f"[{time.perf_counter()-t0:.1f}s]")

key = jax.random.key(0)
ks, kr, kg, k1, k2 = jax.random.split(key, 5)
sk = K.gen_secret_key(ks, params)
rlk = K.gen_relinearization_key(kr, params, sk)
rot_el = params.galois_element(1)
gks = K.gen_galois_keys(kg, params, sk, [rot_el])
ev = ckks.Evaluator(params, rlk=rlk, galois_keys=gks)
enc = ckks.Encoder(params)
print(f"keys [{time.perf_counter()-t0:.1f}s]")

rng = np.random.default_rng(0)
v1 = rng.uniform(-1, 1, params.max_slots)
v2 = rng.uniform(-1, 1, params.max_slots)
ct1 = encryptor.encrypt(k1, params, sk, enc.encode(v1))
ct2 = encryptor.encrypt(k2, params, sk, enc.encode(v2))
ctx = wckks.make_context(params, rlk, gks, rescale_limbs=1)
assert ctx.ring_q.tabs.nplanes == 6
print(f"wide context (pair31) [{time.perf_counter()-t0:.1f}s]")


def pair(v):
    return jnp.asarray(wide.pack_pair(np.asarray(v), params.q, True))


a0, a1 = pair(ct1.value[0]), pair(ct1.value[1])
b0, b1 = pair(ct2.value[0]), pair(ct2.value[1])

step = jax.jit(lambda c0, c1, d0, d1: wckks.mul_relin_rescale(
    ctx, c0, c1, d0, d1))
got0, got1 = jax.block_until_ready(step(a0, a1, b0, b1))
print(f"jitted wide step on {jax.default_backend()} "
      f"[{time.perf_counter()-t0:.1f}s]")

best = float("inf")
for _ in range(3):
    t1 = time.perf_counter()
    jax.block_until_ready(step(a0, a1, b0, b1))
    best = min(best, time.perf_counter() - t1)
print(f"pair31 ct-mult steady-state: {best*1e3:.2f} ms = {1/best:.1f} ops/s "
      f"(logN={logn}, 6+2 limbs)")

# cross-check vs the independent u64 evaluator
want = ev.rescale(ev.mul_relin(ct1, ct2))
lvl = params.max_level - 1
g0 = wide.unpack_pair(np.asarray(got0), params.q[:lvl + 1], True)
g1 = wide.unpack_pair(np.asarray(got1), params.q[:lvl + 1], True)
np.testing.assert_array_equal(g0, np.asarray(want.value[0]))
np.testing.assert_array_equal(g1, np.asarray(want.value[1]))
print("bit-exact vs u64 evaluator: OK")

out = want.with_value((jnp.asarray(g0), jnp.asarray(g1)))
dec = enc.decode(decryptor.decrypt(params, sk, out))[: params.max_slots]
err = np.abs(dec.real - v1 * v2)
prec = -np.log2(np.maximum(err, 1e-17))
print(f"decode precision: mean={prec.mean():.2f} min={prec.min():.2f} bits")
assert prec.mean() > 30

# hoisted rotation on device
rot = jax.jit(lambda c0, c1: wckks.rotations_hoisted(ctx, c0, c1, [rot_el]))
res = jax.block_until_ready(rot(a0, a1))
wrot = ev.rotate(ct1, 1)
r0 = wide.unpack_pair(np.asarray(res[rot_el][0]), params.q, True)
r1 = wide.unpack_pair(np.asarray(res[rot_el][1]), params.q, True)
np.testing.assert_array_equal(r0, np.asarray(wrot.value[0]))
np.testing.assert_array_equal(r1, np.asarray(wrot.value[1]))
print(f"hoisted rotation bit-exact: OK [{time.perf_counter()-t0:.1f}s]")
print("DRIVE OK")
