"""BGV multiparty: EncToShare / ShareToEnc and collective refresh.

Counterpart of /root/reference/multiparty/mpbgv/ (sharing.go, refresh.go):
the integer analogue of mpckks — masks are uniform elements of R_T, moved
between the plaintext ring and R_Q with the scaled RingT2Q / RingQ2T maps of
the BGV encoder (T^{-1} mod Q factor carried by ciphertexts).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from matrix_fhe_tpu.multiparty.protocols import KeySwitch, sample_crp_q
from matrix_fhe_tpu.multiparty.mpckks import _zero_sk
from matrix_fhe_tpu.ops import modmath as mm
from matrix_fhe_tpu.ops import rns_tools as rt
from matrix_fhe_tpu.rlwe.elements import Ciphertext, MetaData
from matrix_fhe_tpu.rlwe import keys as K


def _ring_t2q_scaled(params, level: int, mask_t: jnp.ndarray,
                     ntt: bool) -> jnp.ndarray:
    """RingT2Q with scale-up: lift m in R_T to (m * T^{-1}) mod each q_i
    (the BGV plaintext format; schemes/bgv/encoder.go RingT2Q+scaleUp)."""
    arr_t = np.asarray(mask_t)[0]
    moduli = params.q[:level + 1]
    limbs = np.stack([arr_t % np.uint64(q) for q in moduli])
    ring = params.ring_q.at_level(level)
    tinv = jnp.array([pow(params.t, -1, q) * (1 << 64) % q for q in moduli],
                     dtype=jnp.uint64)
    out = ring.mul_scalar_montgomery(mm.u64(limbs), tinv)
    return ring.ntt(out) if ntt else out


def _ring_q2t_scaled(params, level: int, poly_q: jnp.ndarray) -> jnp.ndarray:
    """RingQ2T with scale-down: centered exact map (m * T mod Q) -> R_T."""
    ring = params.ring_q.at_level(level)
    t = params.t
    tm = jnp.array([(t % q) * (1 << 64) % q for q in params.q[:level + 1]],
                   dtype=jnp.uint64)
    v = ring.mul_scalar_montgomery(poly_q, tm)
    muc = rt.gen_modup_constants(params.q[:level + 1], [t])
    return rt.mod_up(v, muc, ring, params.ring_t, centered=True)


class EncToShare:
    """mpbgv/sharing.go:91-129."""

    @staticmethod
    def gen_share(key: jax.Array, params, sk: K.SecretKey, ct: Ciphertext,
                  sigma_smudge: float = 3.2):
        k_m, k_s = jax.random.split(key)
        mask_t = jnp.asarray(
            jax.random.randint(k_m, (1, params.n), 0, params.t,
                               dtype=jnp.int64).astype(jnp.uint64))
        pub = KeySwitch.gen_share(k_s, params, sk, _zero_sk(params), ct,
                                  sigma_smudge)
        rq = params.ring_q.at_level(ct.level)
        lifted = _ring_t2q_scaled(params, ct.level, mask_t,
                                  ntt=ct.metadata.is_ntt)
        return mask_t, rq.sub(pub, lifted)

    aggregate = staticmethod(KeySwitch.aggregate)

    @staticmethod
    def get_share(params, secret_share, agg, ct: Ciphertext):
        rq = params.ring_q.at_level(ct.level)
        buff = rq.add(agg, ct.value[0])
        if ct.metadata.is_ntt:
            buff = rq.intt(buff)
        vt = _ring_q2t_scaled(params, ct.level, buff)
        if secret_share is not None:
            return params.ring_t.add(secret_share, vt)
        return vt


class ShareToEnc:
    """mpbgv/sharing.go:168-210."""

    @staticmethod
    def gen_share(key: jax.Array, params, sk: K.SecretKey, crs_poly,
                  secret_share_t, sigma_smudge: float = 3.2):
        level = crs_poly.shape[-2] - 1
        md = MetaData(is_ntt=True)
        ct = Ciphertext(value=(crs_poly, crs_poly), metadata=md)
        share = KeySwitch.gen_share(key, params, _zero_sk(params), sk, ct,
                                    sigma_smudge)
        rq = params.ring_q.at_level(level)
        return rq.add(share, _ring_t2q_scaled(params, level, secret_share_t,
                                              ntt=True))

    aggregate = staticmethod(KeySwitch.aggregate)

    @staticmethod
    def get_encryption(params, c0_agg, crs_poly, scale) -> Ciphertext:
        from fractions import Fraction
        md = MetaData(scale=Fraction(scale), is_ntt=True)
        return Ciphertext(value=(c0_agg, crs_poly), metadata=md)


class Refresh:
    """mpbgv/refresh.go: EncToShare at the input level + ShareToEnc at the
    top level with the same R_T mask."""

    sample_crp = staticmethod(sample_crp_q)

    @staticmethod
    def gen_share(key: jax.Array, params, sk: K.SecretKey, ct: Ciphertext,
                  crs_poly, sigma_smudge: float = 3.2):
        k1, k2 = jax.random.split(key)
        mask_t, e2s = EncToShare.gen_share(k1, params, sk, ct, sigma_smudge)
        s2e = ShareToEnc.gen_share(k2, params, sk, crs_poly, mask_t,
                                   sigma_smudge)
        return e2s, s2e

    @staticmethod
    def aggregate(params, a, b):
        return (KeySwitch.aggregate(params, a[0], b[0]),
                KeySwitch.aggregate(params, a[1], b[1]))

    @staticmethod
    def finalize(params, ct: Ciphertext, agg, crs_poly) -> Ciphertext:
        e2s_agg, s2e_agg = agg
        vt = EncToShare.get_share(params, None, e2s_agg, ct)
        max_level = crs_poly.shape[-2] - 1
        rq = params.ring_q.at_level(max_level)
        c0 = rq.add(_ring_t2q_scaled(params, max_level, vt, ntt=True), s2e_agg)
        return ShareToEnc.get_encryption(params, c0, crs_poly, ct.scale)
