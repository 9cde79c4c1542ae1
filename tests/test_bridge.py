"""Domain switcher: standard <-> conjugate-invariant CKKS (bridge.go)."""

import numpy as np
import pytest
import jax

from matrix_fhe_tpu.rlwe import decryptor, encryptor, keys as K
from matrix_fhe_tpu.schemes import ckks
from matrix_fhe_tpu.schemes.ckks import bridge
from matrix_fhe_tpu.utils import primes as pr


@pytest.fixture(scope="module")
def ctx():
    logn = 6
    n = 1 << logn
    q = tuple(pr.NTTFriendlyPrimesGenerator(45, 2 * n).next_alternating_primes(3))
    p = tuple(pr.NTTFriendlyPrimesGenerator(55, 2 * n).next_alternating_primes(1))
    params_std = ckks.new_parameters(ckks.CKKSParametersLiteral(
        logn=logn, q=q, p=p, log_default_scale=40, ring_type="standard"))
    params_ci = ckks.new_parameters(ckks.CKKSParametersLiteral(
        logn=logn - 1, q=q, p=p, log_default_scale=40,
        ring_type="conjugate_invariant"))
    assert params_std.max_slots == params_ci.max_slots
    k0, k1, k2 = jax.random.split(jax.random.key(0), 3)
    sk_std = K.gen_secret_key(k0, params_std)
    sk_ci = K.gen_secret_key(k1, params_ci)
    s2c, c2s = bridge.gen_ring_swap_keys_ci(k2, params_std, sk_std, sk_ci)
    return params_std, params_ci, sk_std, sk_ci, s2c, c2s


def test_complex_to_real_and_back(ctx):
    params_std, params_ci, sk_std, sk_ci, s2c, c2s = ctx
    enc_std = ckks.Encoder(params_std)
    enc_ci = ckks.Encoder(params_ci)
    rng = np.random.default_rng(0)
    v = rng.uniform(-1, 1, params_std.max_slots)  # real values

    ct = encryptor.encrypt(jax.random.key(5), params_std, sk_std,
                           enc_std.encode(v + 0j))

    # std -> CI: decrypt under the CI key in the CI ring
    ct_ci = bridge.complex_to_real(params_std, ct, s2c)
    got = enc_ci.decode(decryptor.decrypt(params_ci, sk_ci, ct_ci))
    ckks.precision.assert_precision(v, np.real(got), 15)

    # CI -> std: back under the standard key
    ct_std = bridge.real_to_complex(params_std, ct_ci, c2s)
    got2 = enc_std.decode(decryptor.decrypt(params_std, sk_std, ct_std))
    ckks.precision.assert_precision(v, np.real(got2), 12)
