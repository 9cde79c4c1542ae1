"""Ring-degree switching n <-> N (ApplyEvaluationKey across degrees)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from matrix_fhe_tpu import rlwe as rlwe_pkg
from matrix_fhe_tpu.rlwe import decryptor, encryptor, keys as K, ring_switch as rs
from matrix_fhe_tpu.rlwe.elements import MetaData, Plaintext
from matrix_fhe_tpu.schemes.ckks.encoder import crt_reconstruct_centered
from matrix_fhe_tpu.utils import primes as pr


@pytest.fixture(scope="module")
def ctx():
    logn_l, logn_s = 6, 4
    # moduli must be NTT-friendly for the LARGE ring (1 mod 2N divides both)
    q = pr.NTTFriendlyPrimesGenerator(45, 2 << logn_l).next_alternating_primes(2)
    p = pr.NTTFriendlyPrimesGenerator(50, 2 << logn_l).next_alternating_primes(1)
    pl = rlwe_pkg.new_parameters(rlwe_pkg.ParametersLiteral(
        logn=logn_l, q=tuple(q), p=tuple(p)))
    ps = rlwe_pkg.new_parameters(rlwe_pkg.ParametersLiteral(
        logn=logn_s, q=tuple(q), p=tuple(p)))
    k0, k1, k2 = jax.random.split(jax.random.key(0), 3)
    sk_l = K.gen_secret_key(k0, pl)
    sk_s = K.gen_secret_key(k1, ps)
    evk_up, evk_down = rs.gen_ring_swap_keys(k2, ps, pl, sk_s, sk_l)
    return pl, ps, sk_l, sk_s, evk_up, evk_down


def _coeffs(params, sk, ct, scale):
    pt = decryptor.decrypt(params, sk, ct)
    ring = params.ring_q.at_level(pt.level)
    v = ring.intt(pt.value)
    c = crt_reconstruct_centered(np.asarray(v), params.q[:pt.level + 1])
    return np.array([float(x) for x in c]) / scale


def _encrypt_coeffs(params, sk, vals, scale, key):
    arr = np.stack([(vals * scale) % q for q in params.q]).astype(np.uint64)
    ring = params.ring_q
    pt = Plaintext(value=ring.ntt(jnp.asarray(arr)), metadata=MetaData(is_ntt=True))
    return encryptor.encrypt(key, params, sk, pt)


def test_switch_up_then_down(ctx):
    pl, ps, sk_l, sk_s, evk_up, evk_down = ctx
    scale = 1 << 30
    rng = np.random.default_rng(0)
    vals = rng.integers(-50, 50, ps.n)
    ct_s = _encrypt_coeffs(ps, sk_s, vals, scale, jax.random.key(5))

    # up: Y = X^gap -> X; the small poly appears at stride-gap coefficients
    ct_l = rs.switch_up(ps, pl, ct_s, evk_up)
    gap = pl.n // ps.n
    c = _coeffs(pl, sk_l, ct_l, scale)
    np.testing.assert_allclose(c[::gap], vals, atol=0.01)
    assert np.max(np.abs(np.delete(c, np.arange(0, pl.n, gap)))) < 0.01

    # down again: recover the original small poly under sk_s
    ct_s2 = rs.switch_down(pl, ps, ct_l, evk_down)
    c2 = _coeffs(ps, sk_s, ct_s2, scale)
    np.testing.assert_allclose(c2, vals, atol=0.01)
