"""Cross-degree ring packing (RingPackingEvaluator): Split/Merge round
trips and Extract/Repack across degrees (core/rlwe/ring_packing.go:74-430
parity; the true PackAndSwitchN1ToN2 substrate)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from matrix_fhe_tpu import rlwe as rlwe_pkg
from matrix_fhe_tpu.rlwe import decryptor, encryptor, keys as K, \
    ring_packing as rp
from matrix_fhe_tpu.rlwe.elements import MetaData, Plaintext
from matrix_fhe_tpu.schemes.ckks.encoder import crt_reconstruct_centered
from matrix_fhe_tpu.utils import primes as pr

LOG_MIN, LOG_MAX = 4, 6
SCALE = 1 << 30


@pytest.fixture(scope="module")
def ev():
    n_max = 1 << LOG_MAX
    q = pr.NTTFriendlyPrimesGenerator(45, 2 * n_max).next_alternating_primes(2)
    p = pr.NTTFriendlyPrimesGenerator(50, 2 * n_max).next_alternating_primes(1)

    def make_params(log_n):
        return rlwe_pkg.new_parameters(rlwe_pkg.ParametersLiteral(
            logn=log_n, q=tuple(q), p=tuple(p)))

    return rp.RingPackingEvaluator(jax.random.key(0), make_params,
                                   LOG_MIN, LOG_MAX)


def _encrypt(ev, log_n, vals, key=3):
    params = ev.params[log_n]
    arr = np.stack([(vals * SCALE) % q for q in params.q]).astype(np.uint64)
    pt = Plaintext(value=params.ring_q.ntt(jnp.asarray(arr)),
                   metadata=MetaData(is_ntt=True))
    return encryptor.encrypt(jax.random.key(key), params, ev.sk[log_n], pt)


def _coeffs(ev, log_n, ct):
    params = ev.params[log_n]
    pt = decryptor.decrypt(params, ev.sk[log_n], ct)
    ring = params.ring_q.at_level(pt.level)
    v = ring.intt(pt.value) if pt.metadata.is_ntt else pt.value
    return np.array([float(x) for x in crt_reconstruct_centered(
        np.asarray(v), params.q[:pt.level + 1])]) / SCALE


def test_split_merge_roundtrip(ev):
    rng = np.random.default_rng(0)
    vals = rng.integers(-100, 100, 1 << LOG_MAX)
    ct = _encrypt(ev, LOG_MAX, vals)

    even, odd = ev.split(ct, LOG_MAX)
    np.testing.assert_allclose(_coeffs(ev, LOG_MAX - 1, even), vals[::2],
                               atol=0.05)
    np.testing.assert_allclose(_coeffs(ev, LOG_MAX - 1, odd), vals[1::2],
                               atol=0.05)

    back = ev.merge(even, odd, LOG_MAX)
    np.testing.assert_allclose(_coeffs(ev, LOG_MAX, back), vals, atol=0.05)


@pytest.mark.parametrize("naive_extract,naive_repack",
                         [(False, False), (True, False), (False, True)])
def test_extract_then_repack(ev, naive_extract, naive_repack):
    """Extract coefficients of a degree-64 ct into degree-16 cts and repack
    them into a degree-64 ct: decrypt-close to the original.  Like the
    reference, a naive (non-zeroing) half must be composed with a zeroing
    other half (ExtractNaive+Repack / Extract+RepackNaive)."""
    rng = np.random.default_rng(1)
    n = 1 << LOG_MAX
    vals = rng.integers(-100, 100, n)
    ct = _encrypt(ev, LOG_MAX, vals, key=5)

    idx = list(range(n))
    cts = ev.extract(ct, idx, naive=naive_extract)
    assert len(cts) == n
    for i in (0, 1, 5, n - 1):
        c = _coeffs(ev, LOG_MIN, cts[i])
        assert abs(c[0] - vals[i]) < 0.05, (i, c[0], vals[i])
        if not naive_extract:
            assert np.max(np.abs(c[1:])) < 0.05

    packed = ev.repack(cts, naive=naive_repack)
    np.testing.assert_allclose(_coeffs(ev, LOG_MAX, packed), vals, atol=0.2)


def test_extract_sparse_indices(ev):
    """Strided index sets exercise the bucket bookkeeping."""
    rng = np.random.default_rng(2)
    n = 1 << LOG_MAX
    vals = rng.integers(-100, 100, n)
    ct = _encrypt(ev, LOG_MAX, vals, key=7)
    idx = list(range(0, n, 4))
    cts = ev.extract(ct, idx)
    assert sorted(cts) == idx
    for i in idx:
        c = _coeffs(ev, LOG_MIN, cts[i])
        assert abs(c[0] - vals[i]) < 0.05, (i, c[0], vals[i])
