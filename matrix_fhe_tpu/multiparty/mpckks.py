"""CKKS multiparty: EncToShare / ShareToEnc and the masked-transform
(collective refresh) protocol.

Counterpart of /root/reference/multiparty/mpckks/ (sharing.go:18-283,
transform.go:17-379):

  * enc-to-share: each party publishes c1 s_i + e_i - M_i (NTT domain) with a
    private big-int mask M_i of log_bound bits; the sum plus c0 decrypts the
    message additively masked.
  * share-to-enc: each party publishes -crs s_i + e_i + M_i; the aggregate
    plus the positional re-encoding of the masked message re-encrypts it
    under the collective key at the top level.
  * masked transform: e2s at the input level + s2e at the output level with
    the same masks (scaled by diffscale = scale_out/scale_in); composing
    both refreshes the ciphertext (collective bootstrapping), optionally
    applying a slot-wise transform to the masked values.

Masks are Python big ints (exact host arithmetic, like the reference's
*big.Int path); the caller provides an integer seed for determinism.
"""

from __future__ import annotations

import dataclasses
import random
from fractions import Fraction

import jax
import jax.numpy as jnp
import numpy as np

from matrix_fhe_tpu.multiparty.protocols import KeySwitch, sample_crp_q
from matrix_fhe_tpu.rlwe import keys as K
from matrix_fhe_tpu.rlwe.elements import Ciphertext, MetaData
from matrix_fhe_tpu.rlwe.params import Parameters


def _zero_sk(params: Parameters) -> K.SecretKey:
    z = jnp.zeros((len(params.q), params.n), dtype=jnp.uint64)
    zp = None
    if params.ring_p is not None:
        zp = jnp.zeros((len(params.p), params.n), dtype=jnp.uint64)
    return K.SecretKey(value=K.QPPoly(q=z, p=zp))


def _dslots(params: Parameters, metadata: MetaData) -> int:
    slots = 1 << metadata.log_dimensions[1]
    if params.ring_type == "standard":
        slots *= 2
    return slots


def set_coefficients_bigint(params: Parameters, level: int,
                            values: list[int], metadata: MetaData) -> jnp.ndarray:
    """Positional big-int values -> RNS limbs at stride N/len(values), then
    NTT per the metadata (ring.SetCoefficientsBigint +
    rlwe.NTTSparseAndMontgomery)."""
    rq = params.ring_q.at_level(level)
    n = params.n
    gap = n // len(values)
    arr = np.zeros((level + 1, n), dtype=np.uint64)
    for j, q in enumerate(params.q[:level + 1]):
        for i, v in enumerate(values):
            arr[j, i * gap] = v % q
    out = jnp.asarray(arr)
    if metadata.is_ntt:
        out = rq.ntt(out)
    if metadata.is_montgomery:
        out = rq.mform(out)
    return out


def poly_to_bigint_centered(params: Parameters, level: int, arr,
                            gap: int) -> list[int]:
    """ring.PolyToBigintCentered at stride gap."""
    moduli = params.q[:level + 1]
    Q = 1
    for q in moduli:
        Q *= q
    basis = []
    for q in moduli:
        qs = Q // q
        basis.append(qs * pow(qs % q, q - 2, q))
    a = np.asarray(arr)
    half = Q >> 1
    out = []
    for j in range(0, params.n, gap):
        acc = 0
        for i in range(len(moduli)):
            acc += int(a[i, j]) * basis[i]
        acc %= Q
        out.append(acc - Q if acc > half else acc)
    return out


def sample_mask(seed: int, count: int, log_bound: int) -> list[int]:
    """Centered uniform masks of log_bound bits (sharing.go:118-131)."""
    rng = random.Random(seed)
    bound = 1 << log_bound
    half = bound >> 1
    out = []
    for _ in range(count):
        m = rng.randrange(bound)
        out.append(m - bound if m >= half else m)
    return out


class EncToShare:
    """sharing.go:18-189."""

    @staticmethod
    def gen_share(key: jax.Array, seed: int, params: Parameters,
                  sk: K.SecretKey, log_bound: int, ct: Ciphertext,
                  sigma_smudge: float = 3.2):
        level = ct.level
        if (1 << log_bound) > params.ring_q.modulus_at_level(level):
            raise ValueError("ciphertext level too low for refresh correctness")
        dslots = _dslots(params, ct.metadata)
        mask = sample_mask(seed, dslots, log_bound)
        pub = KeySwitch.gen_share(key, params, sk, _zero_sk(params), ct,
                                  sigma_smudge)
        rq = params.ring_q.at_level(level)
        pub = rq.sub(pub, set_coefficients_bigint(params, level, mask,
                                                  ct.metadata))
        return mask, pub

    @staticmethod
    def aggregate(params: Parameters, s1, s2):
        return KeySwitch.aggregate(params, s1, s2)

    @staticmethod
    def get_share(params: Parameters, secret_share, agg, ct: Ciphertext):
        """Masked decryption + own-mask removal (sharing.go:145-189)."""
        level = ct.level
        rq = params.ring_q.at_level(level)
        buff = rq.add(agg, ct.value[0])
        if ct.metadata.is_ntt:
            buff = rq.intt(buff)
        dslots = _dslots(params, ct.metadata)
        vals = poly_to_bigint_centered(params, level, buff, params.n // dslots)
        if secret_share is not None:
            return [a + b for a, b in zip(secret_share, vals)]
        return vals


class ShareToEnc:
    """sharing.go:190-283."""

    @staticmethod
    def gen_share(key: jax.Array, params: Parameters, sk: K.SecretKey,
                  crs_poly: jnp.ndarray, metadata: MetaData,
                  secret_share: list[int], sigma_smudge: float = 3.2):
        level = crs_poly.shape[-2] - 1
        ct = Ciphertext(value=(crs_poly, crs_poly), metadata=metadata)
        share = KeySwitch.gen_share(key, params, _zero_sk(params), sk, ct,
                                    sigma_smudge)
        rq = params.ring_q.at_level(level)
        return rq.add(share, set_coefficients_bigint(params, level,
                                                     secret_share, metadata))

    @staticmethod
    def aggregate(params: Parameters, s1, s2):
        return KeySwitch.aggregate(params, s1, s2)

    @staticmethod
    def get_encryption(params: Parameters, c0_agg, crs_poly,
                       metadata: MetaData) -> Ciphertext:
        return Ciphertext(value=(c0_agg, crs_poly), metadata=metadata)


@dataclasses.dataclass
class RefreshShare:
    e2s: jnp.ndarray
    s2e: jnp.ndarray
    metadata: MetaData


class MaskedTransform:
    """transform.go:17-379 (refresh = identity transform).  ``transform`` is
    an optional callable applied to the masked complex slot values."""

    @staticmethod
    def sample_crp(crs: jax.Array, params: Parameters, level: int):
        return sample_crp_q(crs, params, level)

    @staticmethod
    def gen_share(key: jax.Array, seed: int, params: Parameters,
                  sk_in: K.SecretKey, sk_out: K.SecretKey, log_bound: int,
                  ct: Ciphertext, crs_poly, target_scale: Fraction,
                  transform=None, sigma_smudge: float = 3.2) -> RefreshShare:
        k1, k2 = jax.random.split(key)
        mask, e2s_share = EncToShare.gen_share(k1, seed, params, sk_in,
                                               log_bound, ct, sigma_smudge)
        mask = _apply_transform_and_scale(params, ct.metadata, mask, transform,
                                          Fraction(target_scale) / ct.scale)
        s2e_share = ShareToEnc.gen_share(k2, params, sk_out, crs_poly,
                                         ct.metadata, mask, sigma_smudge)
        return RefreshShare(e2s=e2s_share, s2e=s2e_share, metadata=ct.metadata)

    @staticmethod
    def aggregate(params: Parameters, a: RefreshShare, b: RefreshShare) -> RefreshShare:
        return RefreshShare(e2s=KeySwitch.aggregate(params, a.e2s, b.e2s),
                            s2e=KeySwitch.aggregate(params, a.s2e, b.s2e),
                            metadata=a.metadata)

    @staticmethod
    def transform(params: Parameters, ct: Ciphertext, crs_poly,
                  share: RefreshShare, target_scale: Fraction,
                  transform=None) -> Ciphertext:
        """transform.go:220-300."""
        max_level = crs_poly.shape[-2] - 1
        vals = EncToShare.get_share(params, None, share.e2s, ct)
        vals = _apply_transform_and_scale(params, ct.metadata, vals, transform,
                                          Fraction(target_scale) / ct.scale)
        rq = params.ring_q.at_level(max_level)
        c0 = set_coefficients_bigint(params, max_level, vals, ct.metadata)
        c0 = rq.add(c0, share.s2e)
        out = Ciphertext(value=(c0, crs_poly), metadata=ct.metadata)
        return out.with_metadata(scale=Fraction(target_scale))


def _apply_transform_and_scale(params, metadata, mask: list[int], transform,
                               diffscale: Fraction) -> list[int]:
    """applyTransformAndScale (transform.go:302-379): optional slot-wise
    complex transform of the masked values, then scaling by diffscale."""
    if transform is not None:
        slots = 1 << metadata.log_dimensions[1]
        re = np.array([float(v) for v in mask[:slots]])
        if params.ring_type == "standard":
            im = np.array([float(v) for v in mask[slots:2 * slots]])
        else:
            im = np.zeros(slots)
        z = transform(re + 1j * im)
        out = [round(x) for x in np.real(z)]
        if params.ring_type == "standard":
            out += [round(x) for x in np.imag(z)]
        mask = out
    if diffscale != 1:
        mask = [round(v * diffscale) for v in mask]
    return mask
