"""Blind rotation (LMKCDEY): homomorphic sign via the test polynomial.

Mirrors core/rgsw/blindrot/blindrot_test.go (sign over [-1, 1], insecure
small parameters)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from matrix_fhe_tpu import rlwe as rlwe_pkg
from matrix_fhe_tpu.ops import samplers as smp
from matrix_fhe_tpu.rgsw import blindrot
from matrix_fhe_tpu.rlwe import decryptor, keys as K, encryptor
from matrix_fhe_tpu.rlwe.elements import MetaData, Plaintext
from matrix_fhe_tpu.schemes.ckks.encoder import crt_reconstruct_centered
from matrix_fhe_tpu.utils import primes as pr


def sign(x: float) -> float:
    return 1.0 if x > 0 else (-1.0 if x < 0 else 0.0)


@pytest.mark.slow
def test_blind_rotation_sign():
    n_br = 1 << 9
    q_br = pr.NTTFriendlyPrimesGenerator(27, 2 * n_br).next_alternating_primes(1)
    p_br = pr.NTTFriendlyPrimesGenerator(31, 2 * n_br).next_alternating_primes(1)
    params_br = rlwe_pkg.new_parameters(rlwe_pkg.ParametersLiteral(
        logn=9, q=tuple(q_br), p=tuple(p_br)))

    n_lwe = 1 << 6
    q_lwe = pr.NTTFriendlyPrimesGenerator(14, 2 * n_lwe).next_alternating_primes(1)
    params_lwe = rlwe_pkg.new_parameters(rlwe_pkg.ParametersLiteral(
        logn=6, q=tuple(q_lwe), xs=smp.Ternary(h=16)))

    k0, k1, k2 = jax.random.split(jax.random.key(0), 3)
    sk_br = K.gen_secret_key(k0, params_br)
    sk_lwe = K.gen_secret_key(k1, params_lwe)
    brk = blindrot.gen_evaluation_key(k2, params_br, sk_br, params_lwe, sk_lwe)

    scale_lwe = q_lwe[0] / 4.0
    scale_br = q_br[0] / 4.0

    slots = 4
    test_poly = blindrot.init_test_polynomial(sign, scale_br, params_br, -1, 1)
    test_map = {i: test_poly for i in range(slots)}

    values = np.array([-1 + 2 * i / slots for i in range(slots)])
    values[0] = -0.75  # keep away from the sign discontinuity

    coeffs = np.zeros((1, params_lwe.n), dtype=np.uint64)
    for i, v in enumerate(values):
        c = int(round(abs(v) * scale_lwe))
        coeffs[0, i] = (q_lwe[0] - c) % q_lwe[0] if v < 0 else c
    ring = params_lwe.ring_q
    pt = Plaintext(value=ring.ntt(jnp.asarray(coeffs)), metadata=MetaData(is_ntt=True))
    ct = encryptor.encrypt(jax.random.key(3), params_lwe, sk_lwe, pt)

    ev = blindrot.Evaluator(params_br, params_lwe)
    out = ev.evaluate(ct, test_map, brk)

    for i in range(slots):
        ptd = decryptor.decrypt(params_br, sk_br, out[i])
        c = params_br.ring_q.intt(ptd.value)
        dec = crt_reconstruct_centered(np.asarray(c), params_br.q)
        got = float(dec[0]) / scale_br
        want = sign(values[i])
        assert abs(got - want) < 0.1, (i, got, want)
