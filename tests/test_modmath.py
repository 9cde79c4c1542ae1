"""Device modular-arithmetic kernels vs the bit-exact Python oracle."""

import numpy as np
import pytest

import oracle
from matrix_fhe_tpu.ops import modmath as mm
from matrix_fhe_tpu.utils import primes as pr

QS = [
    (1 << 30) - 35,            # 30-bit NTT-unfriendly prime-ish test moduli
    1152921504606846577,       # just below 2^60
    0x1FFFFFFFFFE00001,        # Lattigo Qi60-style 61-bit prime
    4611686018427387847,       # < 2^62
]


@pytest.mark.parametrize("q", [q for q in QS if pr.is_prime(q)])
def test_constants_match_oracle(q):
    assert mm.gen_mred_constant(q) == oracle.gen_mred_constant(q)
    assert mm.gen_bred_constant(q) == oracle.gen_bred_constant(q)


@pytest.mark.parametrize("q", [q for q in QS if pr.is_prime(q)])
def test_primitives_match_oracle(q):
    rng = np.random.default_rng(0)
    n = 512
    x = rng.integers(0, q, n, dtype=np.uint64)
    y = rng.integers(0, q, n, dtype=np.uint64)
    big = rng.integers(0, 1 << 63, n, dtype=np.uint64)

    qinv = mm.gen_mred_constant(q)
    bhi, blo = mm.gen_bred_constant(q)
    qa = np.uint64(q)
    qia = np.uint64(qinv)
    bha, bla = np.uint64(bhi), np.uint64(blo)

    got = np.asarray(mm.mred(mm.u64(x), mm.u64(y), qa, qia))
    want = [oracle.mred(int(a), int(b), q, qinv) for a, b in zip(x, y)]
    np.testing.assert_array_equal(got, np.array(want, dtype=np.uint64))

    got = np.asarray(mm.bred(mm.u64(x), mm.u64(y), qa, bha, bla))
    want = [oracle.bred(int(a), int(b), q, (bhi, blo)) for a, b in zip(x, y)]
    np.testing.assert_array_equal(got, np.array(want, dtype=np.uint64))

    got = np.asarray(mm.bred_add(mm.u64(big), qa, bha))
    want = [oracle.bred_add(int(a), q, (bhi, blo)) for a in big]
    np.testing.assert_array_equal(got, np.array(want, dtype=np.uint64))

    got = np.asarray(mm.mform(mm.u64(x), qa, bha, bla))
    want = [oracle.mform(int(a), q, (bhi, blo)) for a in x]
    np.testing.assert_array_equal(got, np.array(want, dtype=np.uint64))
    # MForm/IMForm roundtrip
    back = np.asarray(mm.imform(mm.u64(got), qa, qia))
    np.testing.assert_array_equal(back, x)


def test_modsum():
    q = QS[2]
    bhi, _ = mm.gen_bred_constant(q)
    rng = np.random.default_rng(1)
    x = rng.integers(0, 2 * q, (3, 100), dtype=np.uint64)
    got = np.asarray(mm.modsum(mm.u64(x), np.uint64(q), np.uint64(bhi), axis=-1))
    want = np.array([sum(int(v) for v in row) % q for row in x], dtype=np.uint64)
    np.testing.assert_array_equal(got, want)
