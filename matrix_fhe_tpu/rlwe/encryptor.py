"""Encryption as pure functions.

Counterpart of /root/reference/core/rlwe/encryptor.go.  NTT-domain elements
only for now (ntt_flag=True, the CKKS/BGV default); coefficient-domain
ciphertexts are produced by INTT-ing after encryption.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from matrix_fhe_tpu.ops import rns_tools as rt
from matrix_fhe_tpu.ops import samplers as smp
from matrix_fhe_tpu.rlwe.elements import Ciphertext, MetaData, Plaintext
from matrix_fhe_tpu.rlwe.keys import PublicKey, QPPoly, SecretKey, extend_basis_small_norm
from matrix_fhe_tpu.rlwe.params import Parameters


def encrypt_zero_sk(key: jax.Array, params: Parameters, sk: SecretKey,
                    level: int | None = None,
                    metadata: MetaData = MetaData()) -> Ciphertext:
    """Secret-key encryption of zero (encryptor.go:355-423): c1 uniform in
    the NTT domain, c0 = -c1 s + NTT(e)."""
    level = params.max_level if level is None else level
    rq = params.ring_q.at_level(level)
    k1, k2 = jax.random.split(key)
    c1 = smp.uniform_poly(k1, rq)
    e = smp.sample(k2, rq, params.xe)
    sk_q = sk.value.q[..., :level + 1, :]
    c0 = rq.sub(rq.ntt(e), rq.mul_coeffs_montgomery(c1, sk_q))
    if not metadata.is_ntt:
        c0, c1 = rq.intt(c0), rq.intt(c1)
    return Ciphertext(value=(c0, c1), metadata=metadata)


def encrypt_zero_pk(key: jax.Array, params: Parameters, pk: PublicKey,
                    level: int | None = None,
                    metadata: MetaData = MetaData()) -> Ciphertext:
    """Public-key encryption of zero (encryptor.go:218-308): sample ternary u,
    compute (u pk0 + e0, u pk1 + e1) over (Q, P), then ModDown by P."""
    level = params.max_level if level is None else level
    rq = params.ring_q.at_level(level)
    rp = params.ring_p
    ku, k0, k1 = jax.random.split(key, 3)

    u_small = smp.ternary_poly(ku, rq, params.xs if isinstance(params.xs, smp.Ternary)
                               else smp.Ternary(p=2 / 3.0))
    uq = rq.ntt(u_small)
    e0 = smp.sample(k0, rq, params.xe)
    e1 = smp.sample(k1, rq, params.xe)

    pk0q, pk1q = pk.value[0].q[..., :level + 1, :], pk.value[1].q[..., :level + 1, :]

    if rp is None:
        c0 = rq.add(rq.mul_coeffs_montgomery(uq, pk0q), rq.ntt(e0))
        c1 = rq.add(rq.mul_coeffs_montgomery(uq, pk1q), rq.ntt(e1))
    else:
        up = rp.ntt(extend_basis_small_norm(params.q[0], rp.moduli, u_small[0]))
        # coeff-domain accumulation (reference INTTs before adding e)
        c0q = rq.intt(rq.mul_coeffs_montgomery(uq, pk0q))
        c1q = rq.intt(rq.mul_coeffs_montgomery(uq, pk1q))
        c0p = rp.intt(rp.mul_coeffs_montgomery(up, pk.value[0].p))
        c1p = rp.intt(rp.mul_coeffs_montgomery(up, pk.value[1].p))
        c0q, c1q = rq.add(c0q, e0), rq.add(c1q, e1)
        c0p = rp.add(c0p, extend_basis_small_norm(params.q[0], rp.moduli, e0[0]))
        c1p = rp.add(c1p, extend_basis_small_norm(params.q[0], rp.moduli, e1[0]))
        mdc = params.moddown_constants(level, params.max_level_p)
        c0 = rt.mod_down(c0q, c0p, mdc, rq, rp, ntt=False)
        c1 = rt.mod_down(c1q, c1p, mdc, rq, rp, ntt=False)
        if metadata.is_ntt:
            c0, c1 = rq.ntt(c0), rq.ntt(c1)
        return Ciphertext(value=(c0, c1), metadata=metadata)

    if not metadata.is_ntt:
        c0, c1 = rq.intt(c0), rq.intt(c1)
    return Ciphertext(value=(c0, c1), metadata=metadata)


def encrypt(key: jax.Array, params: Parameters, enc_key, pt: Plaintext) -> Ciphertext:
    """Encrypt = EncryptZero + addPtToCt (encryptor.go:148-166, 512-533)."""
    level = pt.level
    md = pt.metadata
    if isinstance(enc_key, SecretKey):
        ct = encrypt_zero_sk(key, params, enc_key, level, md)
    else:
        ct = encrypt_zero_pk(key, params, enc_key, level, md)
    rq = params.ring_q.at_level(level)
    return ct.with_value((rq.add(ct.value[0], pt.value), ct.value[1]))
