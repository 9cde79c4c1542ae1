"""Ring packing: Expand/Pack roundtrip (core/rlwe ring_packing tests)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from matrix_fhe_tpu import rlwe as rlwe_pkg
from matrix_fhe_tpu.rlwe import decryptor, encryptor, keys as K, ring_packing as rp
from matrix_fhe_tpu.rlwe.elements import MetaData, Plaintext
from matrix_fhe_tpu.schemes.ckks.encoder import crt_reconstruct_centered
from matrix_fhe_tpu.utils import primes as pr


@pytest.fixture(scope="module")
def ctx():
    n = 1 << 5
    q = pr.NTTFriendlyPrimesGenerator(45, 2 * n).next_alternating_primes(2)
    p = pr.NTTFriendlyPrimesGenerator(50, 2 * n).next_alternating_primes(1)
    params = rlwe_pkg.new_parameters(rlwe_pkg.ParametersLiteral(
        logn=5, q=tuple(q), p=tuple(p)))
    sk = K.gen_secret_key(jax.random.key(0), params)
    gels = sorted(set(rp.galois_elements_for_expand(params))
                  | set(rp.galois_elements_for_pack(params, params.log_n)))
    gks = K.gen_galois_keys(jax.random.key(1), params, sk, gels)
    return params, sk, gks


def _coeffs(params, ct, sk):
    pt = decryptor.decrypt(params, sk, ct)
    ring = params.ring_q.at_level(pt.level)
    v = ring.intt(pt.value) if pt.metadata.is_ntt else pt.value
    return np.array([float(x) for x in
                     crt_reconstruct_centered(np.asarray(v), params.q[:pt.level + 1])])


def test_expand_then_pack_roundtrip(ctx):
    params, sk, gks = ctx
    scale = 1 << 30
    rng = np.random.default_rng(0)
    vals = rng.integers(-100, 100, params.n)
    arr = np.stack([(vals * scale) % q for q in params.q]).astype(np.uint64)
    ring = params.ring_q
    pt = Plaintext(value=ring.ntt(jnp.asarray(arr)), metadata=MetaData(is_ntt=True))
    ct = encryptor.encrypt(jax.random.key(3), params, sk, pt)

    # Expand: ct_i holds c_i in the constant coefficient
    cts = rp.expand(params, ct, log_gap=0, gks=gks)
    assert len(cts) == params.n
    for i in (0, 1, 7, params.n - 1):
        c = _coeffs(params, cts[i], sk)
        got = c[0] / scale
        assert abs(got - vals[i]) < 0.01, (i, got, vals[i])
        # all other coefficients are zeroed by the expand tree
        assert np.max(np.abs(c[1:] / scale)) < 0.01

    # Pack them back into a single ciphertext
    packed = rp.pack(params, cts, input_log_gap=params.log_n,
                     zero_garbage_slots=True, gks=gks)
    c = _coeffs(params, packed, sk) / scale
    np.testing.assert_allclose(c, vals, atol=0.05)


def test_pack_strided(ctx):
    """Pack 4 cts with values in the constant coefficient at stride N/4."""
    params, sk, gks = ctx
    scale = 1 << 30
    rng = np.random.default_rng(1)
    stride = params.n // 4
    cts = {}
    vals = {}
    ring = params.ring_q
    for j in range(4):
        v = int(rng.integers(-100, 100))
        vals[j * stride] = v
        arr = np.zeros((len(params.q), params.n), dtype=np.uint64)
        for li, q in enumerate(params.q):
            arr[li, 0] = (v * scale) % q
        pt = Plaintext(value=ring.ntt(jnp.asarray(arr)), metadata=MetaData(is_ntt=True))
        cts[j * stride] = encryptor.encrypt(jax.random.key(10 + j), params, sk, pt)

    packed = rp.pack(params, cts, input_log_gap=params.log_n,
                     zero_garbage_slots=True, gks=gks)
    c = _coeffs(params, packed, sk) / scale
    for pos, v in vals.items():
        assert abs(c[pos] - v) < 0.05, (pos, c[pos], v)
