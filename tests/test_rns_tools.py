"""Rescale / basis-extension / decomposition vs exact big-int CRT semantics."""

import numpy as np
import pytest

from matrix_fhe_tpu.ops import modmath as mm, rings, rns_tools as rt
from matrix_fhe_tpu.utils import primes as pr

N = 16


def _ring(nbits, k, n=N):
    g = pr.NTTFriendlyPrimesGenerator(nbits, 2 * n)
    return rings.new_ring(n, g.next_alternating_primes(k), rings.STANDARD)


def _rand_crt(rng, moduli, n, bigvals=None):
    """Random big-int coefficients and their CRT limb matrix."""
    Q = 1
    for q in moduli:
        Q *= q
    if bigvals is None:
        bigvals = [int(rng.integers(0, 1 << 62)) * int(rng.integers(0, 1 << 62)) % Q
                   for _ in range(n)]
    limbs = np.array([[v % q for v in bigvals] for q in moduli], dtype=np.uint64)
    return bigvals, limbs, Q


def test_div_round_and_floor_by_last_modulus():
    ring = _ring(45, 4)
    rng = np.random.default_rng(0)
    big, limbs, Q = _rand_crt(rng, ring.moduli_tuple, N)
    ql = ring.moduli_tuple[-1]
    h = (ql - 1) >> 1

    got_r = np.asarray(rt.div_round_by_last_modulus(ring, mm.u64(limbs)))
    got_f = np.asarray(rt.div_floor_by_last_modulus(ring, mm.u64(limbs)))
    for i, q in enumerate(ring.moduli_tuple[:-1]):
        want_r = [((v + h) // ql) % q for v in big]
        want_f = [(v // ql) % q for v in big]
        np.testing.assert_array_equal(got_r[i], np.array(want_r, dtype=np.uint64))
        np.testing.assert_array_equal(got_f[i], np.array(want_f, dtype=np.uint64))


def test_div_round_ntt_matches_coeff_path():
    ring = _ring(45, 4)
    rng = np.random.default_rng(1)
    _, limbs, _ = _rand_crt(rng, ring.moduli_tuple, N)
    x = mm.u64(limbs)
    via_ntt = rt.div_round_by_last_modulus_ntt(ring, ring.ntt(x))
    direct = ring.at_level(ring.level - 1).ntt(rt.div_round_by_last_modulus(ring, x))
    np.testing.assert_array_equal(np.asarray(via_ntt), np.asarray(direct))


def test_div_many():
    ring = _ring(40, 5)
    rng = np.random.default_rng(2)
    big, limbs, Q = _rand_crt(rng, ring.moduli_tuple, N)
    got = np.asarray(rt.div_by_last_modulus_many(ring, mm.u64(limbs), 3, rounded=False))
    d = ring.moduli_tuple[-1] * ring.moduli_tuple[-2] * ring.moduli_tuple[-3]
    # sequential floor division: floor(floor(floor(x/q4)/q3)/q2) == floor(x/(q2 q3 q4))
    for i, q in enumerate(ring.moduli_tuple[:2]):
        want = [(v // d) % q for v in big]
        np.testing.assert_array_equal(got[i], np.array(want, dtype=np.uint64))


def test_mod_up_centered():
    ring_q = _ring(45, 3)
    g = pr.NTTFriendlyPrimesGenerator(50, 2 * N)
    ring_p = rings.new_ring(N, g.next_alternating_primes(2), rings.STANDARD)
    rng = np.random.default_rng(3)
    big, limbs, Q = _rand_crt(rng, ring_q.moduli_tuple, N)

    muc = rt.gen_modup_constants(list(ring_q.moduli_tuple), list(ring_p.moduli_tuple))
    got = np.asarray(rt.mod_up(mm.u64(limbs), muc, ring_q, ring_p, centered=True))
    for j, p in enumerate(ring_p.moduli_tuple):
        want = [(v if v < (Q + 1) // 2 else v - Q) % p for v in big]
        np.testing.assert_array_equal(got[j], np.array(want, dtype=np.uint64))


def test_mod_down():
    ring_q = _ring(45, 3)
    g = pr.NTTFriendlyPrimesGenerator(50, 2 * N)
    ring_p = rings.new_ring(N, g.next_alternating_primes(2), rings.STANDARD)
    rng = np.random.default_rng(4)
    Q = ring_q.modulus_at_level()
    P = ring_p.modulus_at_level()
    big = [int(rng.integers(0, 1 << 62)) * int(rng.integers(0, 1 << 62)) % (Q * P)
           for _ in range(N)]
    xq = np.array([[v % q for v in big] for q in ring_q.moduli_tuple], dtype=np.uint64)
    xp = np.array([[v % p for v in big] for p in ring_p.moduli_tuple], dtype=np.uint64)

    mdc = rt.gen_moddown_constants(list(ring_q.moduli_tuple), list(ring_p.moduli_tuple))
    got = np.asarray(rt.mod_down(mm.u64(xq), mm.u64(xp), mdc, ring_q, ring_p))
    # out = (x - [x]_P) / P  with [x]_P the centered remainder
    for i, q in enumerate(ring_q.moduli_tuple):
        want = []
        for v in big:
            r = v % P
            r_c = r if r < (P + 1) // 2 else r - P
            want.append(((v - r_c) // P) % q)
        np.testing.assert_array_equal(got[i], np.array(want, dtype=np.uint64))


def test_decompose_single_ntt():
    ring_q = _ring(45, 5)
    g = pr.NTTFriendlyPrimesGenerator(50, 2 * N)
    ring_p = rings.new_ring(N, g.next_alternating_primes(2), rings.STANDARD)
    rng = np.random.default_rng(5)
    big, limbs, _ = _rand_crt(rng, ring_q.moduli_tuple, N)
    dec = rt.gen_decomposer(list(ring_q.moduli_tuple), list(ring_p.moduli_tuple))
    assert dec.num_digits == 3

    x = mm.u64(limbs)
    x_ntt = ring_q.ntt(x)
    for d in range(dec.num_digits):
        yq, yp = rt.decompose_single_ntt(dec, d, x_ntt, x, ring_q, ring_p)
        start = d * dec.alpha
        end = min(start + dec.alpha, ring_q.num_limbs)
        Qd = 1
        for q in ring_q.moduli_tuple[start:end]:
            Qd *= q
        # digit value: centered residue of x mod Qd
        vals = []
        for v in big:
            r = v % Qd
            if end - start == 1:
                vals.append(r if r < Qd // 2 else r - Qd)  # threshold q>>1
            else:
                vals.append(r if r < (Qd + 1) // 2 else r - Qd)
        yq_c = np.asarray(ring_q.intt(yq))
        yp_c = np.asarray(ring_p.intt(yp))
        for i, q in enumerate(ring_q.moduli_tuple):
            want = np.array([v % q for v in vals], dtype=np.uint64)
            np.testing.assert_array_equal(yq_c[i], want, err_msg=f"digit {d} q-limb {i}")
        for j, p in enumerate(ring_p.moduli_tuple):
            want = np.array([v % p for v in vals], dtype=np.uint64)
            np.testing.assert_array_equal(yp_c[j], want, err_msg=f"digit {d} p-limb {j}")


def test_single_limb_decompose_threshold():
    """coeff == q>>1 lifts negative (reference threshold, basis_extension.go:421)."""
    ring_q = _ring(45, 2)
    g = pr.NTTFriendlyPrimesGenerator(50, 2 * N)
    ring_p = rings.new_ring(N, g.next_alternating_primes(1), rings.STANDARD)
    dec = rt.gen_decomposer(list(ring_q.moduli_tuple), list(ring_p.moduli_tuple))
    q0 = ring_q.moduli_tuple[0]
    x = np.zeros((2, N), dtype=np.uint64)
    x[0, 0] = q0 >> 1
    x[1, 0] = (q0 >> 1) % ring_q.moduli_tuple[1]
    xj = mm.u64(x)
    yq, yp = rt.decompose_single_ntt(dec, 0, ring_q.ntt(xj), xj, ring_q, ring_p)
    got = np.asarray(ring_p.intt(yp))[0, 0]
    p0 = ring_p.moduli_tuple[0]
    assert int(got) == (-(q0 - (q0 >> 1))) % p0
