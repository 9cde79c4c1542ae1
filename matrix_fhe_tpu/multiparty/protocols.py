"""Share-based multiparty protocols: collective keygen and key switching.

Counterpart of /root/reference/multiparty/ (keygen_cpk.go, keygen_evk.go,
keygen_gal.go, keygen_relin.go, keyswitch_sk.go, keyswitch_pk.go).  All
protocols follow the reference's single-round shape

    sample_crp (from the shared CRS key) -> gen_share -> aggregate -> finalize

as pure functions: the CRS is a JAX PRNG key shared by all parties (the
counter-based analogue of the reference's keyed-PRNG CRS, multiparty/crs.go);
shares are device arrays the caller moves between parties (or psum's over a
party axis of a mesh — aggregation is plain modular addition, hence
tree-reducible, keygen_cpk.go:86).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from matrix_fhe_tpu.ops import automorphism as am
from matrix_fhe_tpu.ops import samplers as smp
from matrix_fhe_tpu.rlwe import keys as K
from matrix_fhe_tpu.rlwe.elements import Ciphertext
from matrix_fhe_tpu.rlwe.params import Parameters


# ---------------------------------------------------------------------------
# CRS sampling.
# ---------------------------------------------------------------------------

def sample_crp_qp(crs: jax.Array, params: Parameters) -> K.QPPoly:
    """A uniform (Q, P) common random polynomial (keygen_cpk.go:59)."""
    kq, kp = jax.random.split(crs)
    return K.QPPoly(
        q=smp.uniform_poly(kq, params.ring_q),
        p=None if params.ring_p is None else smp.uniform_poly(kp, params.ring_p))


def sample_crp_q(crs: jax.Array, params: Parameters, level: int) -> jnp.ndarray:
    """A uniform mod-Q polynomial at ``level`` (keyswitch_sk.go:107)."""
    return smp.uniform_poly(crs, params.ring_q.at_level(level))


def _sample_e_qp(key: jax.Array, params: Parameters, ntt: bool = True,
                 mform: bool = False) -> K.QPPoly:
    """Fresh noise over (Q, P): e sampled mod Q, sign-extended to P
    (the ExtendBasisSmallNormAndCenter idiom)."""
    rq, rp = params.ring_q, params.ring_p
    e = smp.sample(key, rq, params.xe)
    eq, ep = e, None
    if rp is not None:
        ep = K.extend_basis_small_norm(params.q[0], rp.moduli, e[0])
    if ntt:
        eq = rq.ntt(eq)
        ep = None if ep is None else rp.ntt(ep)
    if mform:
        eq = rq.mform(eq)
        ep = None if ep is None else rp.mform(ep)
    return K.QPPoly(q=eq, p=ep)


def _qp_add(params, a: K.QPPoly, b: K.QPPoly) -> K.QPPoly:
    rq, rp = params.ring_q, params.ring_p
    return K.QPPoly(q=rq.add(a.q, b.q),
                    p=None if a.p is None else rp.add(a.p, b.p))


def _qp_sub(params, a: K.QPPoly, b: K.QPPoly) -> K.QPPoly:
    rq, rp = params.ring_q, params.ring_p
    return K.QPPoly(q=rq.sub(a.q, b.q),
                    p=None if a.p is None else rp.sub(a.p, b.p))


def _qp_mul_mont(params, a: K.QPPoly, b: K.QPPoly) -> K.QPPoly:
    rq, rp = params.ring_q, params.ring_p
    return K.QPPoly(q=rq.mul_coeffs_montgomery(a.q, b.q),
                    p=None if a.p is None else rp.mul_coeffs_montgomery(a.p, b.p))


# ---------------------------------------------------------------------------
# Collective public key (keygen_cpk.go).
# ---------------------------------------------------------------------------

class PublicKeyGen:
    """share_i = -crp*s_i + e_i; pk = (sum shares, crp)."""

    @staticmethod
    def sample_crp(crs: jax.Array, params: Parameters) -> K.QPPoly:
        return sample_crp_qp(crs, params)

    @staticmethod
    def gen_share(key: jax.Array, params: Parameters, sk: K.SecretKey,
                  crp: K.QPPoly) -> K.QPPoly:
        e = _sample_e_qp(key, params, ntt=True, mform=True)
        return _qp_sub(params, e, _qp_mul_mont(params, sk.value, crp))

    @staticmethod
    def aggregate(params: Parameters, s1: K.QPPoly, s2: K.QPPoly) -> K.QPPoly:
        return _qp_add(params, s1, s2)

    @staticmethod
    def finalize(params: Parameters, agg: K.QPPoly, crp: K.QPPoly) -> K.PublicKey:
        return K.PublicKey(value=(agg, crp))


# ---------------------------------------------------------------------------
# Collective evaluation key skIn -> skOut (keygen_evk.go).
# ---------------------------------------------------------------------------

class EvaluationKeyGen:
    """Per RNS digit i: share_i = MForm(e) + MForm(P skIn sel_i) - skOut*crp_i;
    evk = (sum shares, crp) (keygen_evk.go:120-220)."""

    @staticmethod
    def sample_crp(crs: jax.Array, params: Parameters):
        digits = EvaluationKeyGen.num_digits(params)
        keys = jax.random.split(crs, digits)
        return [sample_crp_qp(k, params) for k in keys]

    @staticmethod
    def num_digits(params: Parameters) -> int:
        alpha = max(len(params.p), 1)
        return -(-len(params.q) // alpha)

    @staticmethod
    def gen_share(key: jax.Array, params: Parameters, sk_in_q: jnp.ndarray,
                  sk_out: K.SecretKey, crp: list) -> list[K.QPPoly]:
        """sk_in_q: NTT+MForm mod Q polynomial of the input key."""
        rq = params.ring_q
        big_p = params.big_p()
        scaled = rq.mul_scalar_montgomery(
            sk_in_q, jnp.array([(big_p << 64) % q for q in params.q],
                               dtype=jnp.uint64))
        alpha = max(len(params.p), 1)
        shares = []
        for i, crp_i in enumerate(crp):
            key, sub = jax.random.split(key)
            e = _sample_e_qp(sub, params, ntt=True, mform=True)
            start, end = i * alpha, min((i + 1) * alpha, len(params.q))
            mask = jnp.zeros((len(params.q), 1), dtype=jnp.uint64)
            mask = mask.at[start:end].set(1)
            h_q = rq.add(e.q, scaled * mask)
            h = K.QPPoly(q=h_q, p=e.p)
            shares.append(_qp_sub(params, h, _qp_mul_mont(params, sk_out.value, crp_i)))
        return shares

    @staticmethod
    def aggregate(params: Parameters, s1: list, s2: list) -> list:
        return [_qp_add(params, a, b) for a, b in zip(s1, s2)]

    @staticmethod
    def finalize(params: Parameters, agg: list, crp: list) -> K.EvaluationKey:
        gq = jnp.stack([jnp.stack([a.q, c.q]) for a, c in zip(agg, crp)])
        gp = None
        if params.ring_p is not None:
            gp = jnp.stack([jnp.stack([a.p, c.p]) for a, c in zip(agg, crp)])
        return K.EvaluationKey(gadget=K.GadgetCiphertext(q=gq, p=gp))


# ---------------------------------------------------------------------------
# Collective Galois key (keygen_gal.go).
# ---------------------------------------------------------------------------

class GaloisKeyGen:
    sample_crp = EvaluationKeyGen.sample_crp
    aggregate = EvaluationKeyGen.aggregate

    @staticmethod
    def gen_share(key: jax.Array, params: Parameters, sk: K.SecretKey,
                  gal_el: int, crp: list) -> list[K.QPPoly]:
        """skOut = pi_{galEl^-1}(sk) (keygen_gal.go:56-79)."""
        gal_inv = params.mod_inv_galois_element(gal_el)
        idx = jnp.asarray(am.automorphism_ntt_index(params.n, params.nth_root,
                                                    gal_inv))
        sk_out = K.SecretKey(value=K.QPPoly(
            q=sk.value.q[..., idx],
            p=None if sk.value.p is None else sk.value.p[..., idx]))
        return EvaluationKeyGen.gen_share(key, params, sk.value.q, sk_out, crp)

    @staticmethod
    def finalize(params: Parameters, agg: list, crp: list,
                 gal_el: int) -> K.GaloisKey:
        evk = EvaluationKeyGen.finalize(params, agg, crp)
        return K.GaloisKey(gadget=evk.gadget, gal_el=gal_el)


# ---------------------------------------------------------------------------
# Collective relinearization key (keygen_relin.go, 2 rounds).
# ---------------------------------------------------------------------------

class RelinKeyGen:
    """round1_i = [-u_i a + P s_i sel + e0_i, s_i a + e1_i] (per digit);
    round2_i = s_i round1[0] + (u_i - s_i) round1[1] + e2_i;
    rlk = (MForm(sum round2), MForm(sum round1[1])) (keygen_relin.go:125-310).

    Round shares are kept out of the Montgomery domain like the reference
    (MForm applied at finalize)."""

    sample_crp = EvaluationKeyGen.sample_crp

    @staticmethod
    def gen_share_round1(key: jax.Array, params: Parameters, sk: K.SecretKey,
                         crp: list):
        """Returns (eph_sk u_i, round1 share list of (h0, h1))."""
        rq, rp = params.ring_q, params.ring_p
        k_u, key = jax.random.split(key)

        u_small = smp.sample(k_u, rq, params.xs)
        uq = rq.mform(rq.ntt(u_small))
        up = None
        if rp is not None:
            up = rp.mform(rp.ntt(K.extend_basis_small_norm(
                params.q[0], rp.moduli, u_small[0])))
        eph = K.SecretKey(value=K.QPPoly(q=uq, p=up))

        # P * s_i out of the Montgomery domain (IMForm, :151)
        big_p = params.big_p()
        sP = rq.imform(rq.mul_scalar_montgomery(
            sk.value.q, jnp.array([(big_p << 64) % q for q in params.q],
                                  dtype=jnp.uint64)))
        alpha = max(len(params.p), 1)
        shares = []
        for i, crp_i in enumerate(crp):
            key, k0, k1 = jax.random.split(key, 3)
            e0 = _sample_e_qp(k0, params, ntt=True, mform=False)
            start, end = i * alpha, min((i + 1) * alpha, len(params.q))
            mask = jnp.zeros((len(params.q), 1), dtype=jnp.uint64)
            mask = mask.at[start:end].set(1)
            h0 = K.QPPoly(q=rq.add(e0.q, sP * mask), p=e0.p)
            h0 = _qp_sub(params, h0, _qp_mul_mont(params, eph.value, crp_i))
            e1 = _sample_e_qp(k1, params, ntt=True, mform=False)
            h1 = _qp_add(params, e1, _qp_mul_mont(params, sk.value, crp_i))
            shares.append((h0, h1))
        return eph, shares

    @staticmethod
    def gen_share_round2(key: jax.Array, params: Parameters,
                         eph: K.SecretKey, sk: K.SecretKey, round1_agg):
        """round2_i = s_i h0 + (u_i - s_i) h1 + e2_i (:231-271)."""
        delta = _qp_sub(params, eph.value, sk.value)
        out = []
        for (h0, h1) in round1_agg:
            key, sub = jax.random.split(key)
            t = _qp_mul_mont(params, h0, sk.value)
            t = _qp_add(params, t, _sample_e_qp(sub, params, ntt=True, mform=False))
            t = _qp_add(params, t, _qp_mul_mont(params, delta, h1))
            out.append(t)
        return out

    @staticmethod
    def aggregate_round1(params, s1, s2):
        return [(_qp_add(params, a0, b0), _qp_add(params, a1, b1))
                for (a0, a1), (b0, b1) in zip(s1, s2)]

    @staticmethod
    def aggregate_round2(params, s1, s2):
        return [_qp_add(params, a, b) for a, b in zip(s1, s2)]

    @staticmethod
    def finalize(params: Parameters, round1_agg, round2_agg) -> K.RelinearizationKey:
        rq, rp = params.ring_q, params.ring_p
        rows_q, rows_p = [], []
        for (h0, h1), r2 in zip(round1_agg, round2_agg):
            rows_q.append(jnp.stack([rq.mform(r2.q), rq.mform(h1.q)]))
            if rp is not None:
                rows_p.append(jnp.stack([rp.mform(r2.p), rp.mform(h1.p)]))
        return K.RelinearizationKey(gadget=K.GadgetCiphertext(
            q=jnp.stack(rows_q), p=jnp.stack(rows_p) if rows_p else None))


# ---------------------------------------------------------------------------
# Collective key switching (keyswitch_sk.go / keyswitch_pk.go).
# ---------------------------------------------------------------------------

def _smudging_sigma(params: Parameters, sigma_smudge: float) -> smp.DiscreteGaussian:
    e_fresh = params.xe.sigma
    sigma = math.sqrt(e_fresh * e_fresh + sigma_smudge * sigma_smudge)
    return smp.DiscreteGaussian(sigma=sigma, bound=6 * sigma)


class KeySwitch:
    """CKS: share_i = c1 (skIn_i - skOut_i) + e_i; out = (c0 + sum, c1)
    (keyswitch_sk.go:114-165)."""

    @staticmethod
    def gen_share(key: jax.Array, params: Parameters, sk_in: K.SecretKey,
                  sk_out: K.SecretKey, ct: Ciphertext,
                  sigma_smudge: float = 3.2) -> jnp.ndarray:
        level = ct.level
        rq = params.ring_q.at_level(level)
        delta = rq.sub(sk_in.value.q[:level + 1], sk_out.value.q[:level + 1])
        share = rq.mul_coeffs_montgomery(ct.value[1], delta)
        e = smp.sample(key, rq, _smudging_sigma(params, sigma_smudge))
        if ct.metadata.is_ntt:
            return rq.add(share, rq.ntt(e))
        return rq.add(rq.intt(share), e)

    @staticmethod
    def aggregate(params: Parameters, s1, s2):
        rq = params.ring_q.at_level(s1.shape[-2] - 1)
        return rq.add(s1, s2)

    @staticmethod
    def finalize(params: Parameters, ct: Ciphertext, agg) -> Ciphertext:
        rq = params.ring_q.at_level(ct.level)
        return ct.with_value((rq.add(ct.value[0], agg), ct.value[1]))


class PublicKeySwitch:
    """PCKS: share_i = EncZero_pk + (c1 s_i + e, 0); out = (c0 + sum0, sum1)
    (keyswitch_pk.go:69-140)."""

    @staticmethod
    def gen_share(key: jax.Array, params: Parameters, sk: K.SecretKey,
                  pk: K.PublicKey, ct: Ciphertext,
                  sigma_smudge: float = 3.2) -> tuple:
        from matrix_fhe_tpu.rlwe import encryptor as enc_mod
        level = ct.level
        rq = params.ring_q.at_level(level)
        k_enc, k_e = jax.random.split(key)
        z0, z1 = enc_mod.encrypt_zero_pk(k_enc, params, pk, level,
                                         metadata=ct.metadata).value
        c1s = rq.mul_coeffs_montgomery(ct.value[1], sk.value.q[:level + 1])
        e = smp.sample(k_e, rq, _smudging_sigma(params, sigma_smudge))
        if ct.metadata.is_ntt:
            z0 = rq.add(z0, rq.add(c1s, rq.ntt(e)))
        else:
            z0 = rq.add(z0, rq.add(rq.intt(c1s), e))
        return z0, z1

    @staticmethod
    def aggregate(params: Parameters, s1, s2):
        rq = params.ring_q.at_level(s1[0].shape[-2] - 1)
        return rq.add(s1[0], s2[0]), rq.add(s1[1], s2[1])

    @staticmethod
    def finalize(params: Parameters, ct: Ciphertext, agg) -> Ciphertext:
        rq = params.ring_q.at_level(ct.level)
        return ct.with_value((rq.add(ct.value[0], agg[0]), agg[1]))
