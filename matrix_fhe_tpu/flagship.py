"""Flagship workload builders: the CKKS ct-mult + relinearize + rescale step.

This is the throughput metric op of the framework (SURVEY.md section 3.3,
BASELINE.json config 3): one homomorphic multiply with relinearization
followed by a rescale, the chain that touches every L1 primitive (NTT/INTT,
basis extension, Montgomery MACs, rescale).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from matrix_fhe_tpu import rlwe
from matrix_fhe_tpu.rlwe import encryptor, keys as K
from matrix_fhe_tpu.schemes import ckks


def build_flagship(logn: int = 14, num_q: int = 9, num_p: int = 1,
                   seed: int = 0):
    """PN14QP438-style parameter set (schemes/ckks/example_parameters.go:11:
    logN=14, logQP ~ 438 = 55 + 8*45 + 61) and its key material."""
    logq = (55,) + (45,) * (num_q - 1)
    logp = (61,) * num_p
    params = ckks.new_parameters(ckks.CKKSParametersLiteral(
        logn=logn, logq=logq, logp=logp, log_default_scale=45))
    key = jax.random.key(seed)
    ks, kr, k1, k2 = jax.random.split(key, 4)
    sk = K.gen_secret_key(ks, params)
    rlk = K.gen_relinearization_key(kr, params, sk)
    ev = ckks.Evaluator(params, rlk=rlk)

    enc = ckks.Encoder(params)
    import numpy as np
    rng = np.random.default_rng(seed)
    v1 = rng.uniform(-1, 1, params.max_slots) + 1j * rng.uniform(-1, 1, params.max_slots)
    v2 = rng.uniform(-1, 1, params.max_slots) + 1j * rng.uniform(-1, 1, params.max_slots)
    ct1 = encryptor.encrypt(k1, params, sk, enc.encode(v1))
    ct2 = encryptor.encrypt(k2, params, sk, enc.encode(v2))
    return params, sk, rlk, ev, ct1, ct2


def make_step(params, ev, metadata):
    """A jittable (ct0_values, ct1_values, rlk_gadget) -> out_values step."""
    from matrix_fhe_tpu.rlwe.elements import Ciphertext
    from matrix_fhe_tpu.schemes.ckks.evaluator import Evaluator

    def step(c0, c1, d0, d1, rlk):
        ev2 = Evaluator(params, rlk=rlk)
        a = Ciphertext(value=(c0, c1), metadata=metadata)
        b = Ciphertext(value=(d0, d1), metadata=metadata)
        out = ev2.rescale(ev2.mul_relin(a, b))
        return out.value

    return step
