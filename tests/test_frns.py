"""Fast-path RNS tools: bit-exactness vs ops/rns_tools.py on the same moduli."""

import numpy as np
import jax.numpy as jnp

from matrix_fhe_tpu.fast import fring, frns
from matrix_fhe_tpu.ops import rings, rns_tools as rt


def _setup(n=1 << 8, lq=5, lp=2, seed=0):
    moduli = fring.find_fast_primes(n, lq + lp)
    Q, P = moduli[:lq], moduli[lq:]
    f_q, f_p = fring.new_fast_ring(n, Q), fring.new_fast_ring(n, P)
    u_q, u_p = rings.new_ring(n, Q, rings.STANDARD), rings.new_ring(n, P, rings.STANDARD)
    rng = np.random.default_rng(seed)
    x = rng.integers(0, min(moduli), (lq, n), dtype=np.int64)
    return Q, P, f_q, f_p, u_q, u_p, x


def _eq(got_i32, want_u64):
    np.testing.assert_array_equal(
        np.asarray(got_i32).astype(np.uint64), np.asarray(want_u64))


def test_div_round_by_last_modulus():
    Q, P, f_q, f_p, u_q, u_p, x = _setup()
    got = frns.div_round_by_last_modulus(f_q, jnp.asarray(x.astype(np.int32)))
    want = rt.div_round_by_last_modulus(u_q, jnp.asarray(x.astype(np.uint64)))
    _eq(got, want)


def test_div_round_many_ntt():
    Q, P, f_q, f_p, u_q, u_p, x = _setup()
    xf = f_q.ntt(jnp.asarray(x.astype(np.int32)))
    xu = u_q.ntt(jnp.asarray(x.astype(np.uint64)))
    for nb in (1, 2):
        got = frns.div_round_by_last_modulus_many_ntt(f_q, xf, nb)
        want = rt.div_by_last_modulus_many(u_q, xu, nb, rounded=True, ntt=True)
        _eq(got, want)


def test_mod_up_centered_and_plain():
    Q, P, f_q, f_p, u_q, u_p, x = _setup()
    fmuc = frns.gen_fast_modup_constants(Q, P)
    umuc = rt.gen_modup_constants(Q, P)
    for centered in (True, False):
        got = frns.mod_up(jnp.asarray(x.astype(np.int32)), fmuc, f_q, f_p,
                          centered=centered)
        want = rt.mod_up(jnp.asarray(x.astype(np.uint64)), umuc, u_q, u_p,
                         centered=centered)
        _eq(got, want)


def test_mod_down_ntt():
    Q, P, f_q, f_p, u_q, u_p, x = _setup()
    rng = np.random.default_rng(1)
    xq = rng.integers(0, min(Q), (len(Q), f_q.n), dtype=np.int64)
    xp = rng.integers(0, min(P), (len(P), f_q.n), dtype=np.int64)
    fmdc = frns.gen_fast_moddown_constants(Q, P)
    umdc = rt.gen_moddown_constants(Q, P)
    for ntt in (False, True):
        got = frns.mod_down(jnp.asarray(xq.astype(np.int32)),
                            jnp.asarray(xp.astype(np.int32)),
                            fmdc, f_q, f_p, ntt=ntt)
        want = rt.mod_down(jnp.asarray(xq.astype(np.uint64)),
                           jnp.asarray(xp.astype(np.uint64)),
                           umdc, u_q, u_p, ntt=ntt)
        _eq(got, want)


def test_decompose_single_ntt():
    Q, P, f_q, f_p, u_q, u_p, x = _setup()
    fdec = frns.gen_fast_decomposer(Q, P)
    udec = rt.gen_decomposer(Q, P)
    assert fdec.num_digits == udec.num_digits
    xi = jnp.asarray(x.astype(np.int32))
    xu = jnp.asarray(x.astype(np.uint64))
    xf_ntt, xu_ntt = f_q.ntt(xi), u_q.ntt(xu)
    for d in range(fdec.num_digits):
        gq, gp = frns.decompose_single_ntt(fdec, d, xf_ntt, xi, f_q, f_p)
        wq, wp = rt.decompose_single_ntt(udec, d, xu_ntt, xu, u_q, u_p)
        _eq(gq, wq)
        _eq(gp, wp)
