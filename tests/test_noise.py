"""Noise/norm debug utilities (rlwe/noise.py vs core/rlwe/utils.go).

The reference's analytic noise bounds (core/rlwe/params.go:448-478): fresh
sk-encryption noise std is Xe's sigma (default 3.2 -> log2 ~ 1.68); key and
gadget noise likewise sits at the fresh-encryption level.
"""

import jax
import numpy as np
import pytest

from matrix_fhe_tpu import rlwe
from matrix_fhe_tpu.rlwe import encryptor, keys as K, noise


@pytest.fixture(scope="module")
def ctx():
    params = rlwe.new_parameters(rlwe.ParametersLiteral(
        logn=6, logq=(45, 40), logp=(50,)))
    k = jax.random.key(0)
    ks, kp, kr, kg = jax.random.split(k, 4)
    sk = K.gen_secret_key(ks, params)
    pk = K.gen_public_key(kp, params, sk)
    rlk = K.gen_relinearization_key(kr, params, sk)
    gk = K.gen_galois_key(kg, params, sk, params.galois_element(1))
    return params, sk, pk, rlk, gk


def test_noise_public_key(ctx):
    params, sk, pk, _, _ = ctx
    # fresh noise: sigma = 3.2 -> log2 std ~ 1.7 (sampling variance on N=64)
    assert noise.noise_public_key(params, pk, sk) < 4.0


def test_noise_relinearization_key(ctx):
    params, sk, _, rlk, _ = ctx
    assert noise.noise_relinearization_key(params, rlk, sk) < 4.0


def test_noise_galois_key(ctx):
    params, sk, _, _, gk = ctx
    assert noise.noise_galois_key(params, gk, sk) < 4.0


def test_norm_and_noise_ciphertext(ctx):
    params, sk, _, _, _ = ctx
    rng = np.random.default_rng(7)
    m = rng.integers(0, 1 << 20, params.n)
    limbs = np.stack([(m % q).astype(np.uint64) for q in params.q])
    from matrix_fhe_tpu.rlwe.elements import MetaData, Plaintext
    rq = params.ring_q
    pt = Plaintext(value=rq.ntt(limbs), metadata=MetaData(is_ntt=True))
    ct = encryptor.encrypt(jax.random.key(3), params, sk, pt)

    # norm: message dominates -> log2 max >= 19-ish
    std, mn, mx = noise.norm(params, sk, ct)
    assert mx >= 19.0

    # noise vs the exact plaintext: fresh encryption noise only
    assert noise.noise_ciphertext(params, sk, ct, limbs) < 4.0


def test_norm_stats_exact():
    std, mn, mx = noise.norm_stats([-4, 4, -4, 4])
    assert std == 2.0 and mn == 2.0 and mx == 2.0
