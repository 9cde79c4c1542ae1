"""Noise / norm debug utilities.

Counterpart of /root/reference/core/rlwe/utils.go: given secret-key access,
measure the log2 standard deviation of the noise carried by public keys,
evaluation keys (gadget ciphertexts), and ciphertexts.  These are the
observability hooks the reference's tests use for noise-budget assertions
(SURVEY.md section 4.4); everything runs on host over exact Python big ints
after CRT reconstruction.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from matrix_fhe_tpu.ops import automorphism as am
from matrix_fhe_tpu.rlwe import decryptor
from matrix_fhe_tpu.rlwe.elements import Ciphertext
from matrix_fhe_tpu.rlwe.keys import (GadgetCiphertext, GaloisKey, PublicKey,
                                      QPPoly, RelinearizationKey, SecretKey)
from matrix_fhe_tpu.rlwe.params import Parameters


def _centered_bigints(arr: np.ndarray, moduli: list[int]) -> list[int]:
    """CRT-reconstruct [L, N] residues to centered big ints
    (ring.PolyToBigintCentered, ring/ring.go:503)."""
    arr = np.asarray(arr, dtype=np.uint64)
    big_q = math.prod(moduli)
    out = [0] * arr.shape[-1]
    for j, q in enumerate(moduli):
        qs = big_q // q
        basis = qs * pow(qs % q, q - 2, q)
        for i in range(arr.shape[-1]):
            out[i] = (out[i] + int(arr[j, i]) * basis) % big_q
    half = big_q >> 1
    return [v - big_q if v > half else v for v in out]


def norm_stats(vec: list[int]) -> tuple[float, float, float]:
    """(log2 std, log2 min |.|, log2 max |.|) of integer coefficients
    (rlwe.NormStats, core/rlwe/utils.go:135)."""
    n = len(vec)
    mean = sum(vec) / n
    var = sum((float(v) - mean) ** 2 for v in vec) / n
    mn = min(abs(v) for v in vec)
    mx = max(abs(v) for v in vec)

    def log2(x: float) -> float:
        return math.log2(x) if x > 0 else float("-inf")

    return log2(math.sqrt(var)), log2(mn), log2(mx)


def log2_std(params: Parameters, arr, moduli: list[int] | None = None) -> float:
    """log2 standard deviation of the centered coefficients of a coeff-domain
    RNS poly [L, N] (ring.Log2OfStandardDeviation, ring/ring.go:645)."""
    arr = np.asarray(arr)
    moduli = list(moduli if moduli is not None else params.q[:arr.shape[-2]])
    std, _, _ = norm_stats(_centered_bigints(arr, moduli))
    return std


def _qp_log2_std(params: Parameters, pol: QPPoly) -> float:
    """log2 std of a coeff-domain QP poly (joint CRT over Q then P limbs)."""
    if pol.p is None:
        return log2_std(params, pol.q)
    arr = np.concatenate([np.asarray(pol.q), np.asarray(pol.p)], axis=0)
    return log2_std(params, arr, list(params.q) + list(params.p))


def noise_public_key(params: Parameters, pk: PublicKey, sk: SecretKey) -> float:
    """log2 std of pk noise: INTT(IMForm(b + a*s)) (utils.go:13-26)."""
    rq, rp = params.ring_q, params.ring_p
    b, a = pk.value
    eq = rq.add(b.q, rq.mul_coeffs_montgomery(a.q, sk.value.q))
    eq = rq.imform(rq.intt(eq))
    ep = None
    if rp is not None:
        ep = rp.add(b.p, rp.mul_coeffs_montgomery(a.p, sk.value.p))
        ep = rp.imform(rp.intt(ep))
    return _qp_log2_std(params, QPPoly(q=eq, p=ep))


def noise_gadget_ciphertext(params: Parameters, gct: GadgetCiphertext,
                            pt_q: jnp.ndarray, sk: SecretKey) -> float:
    """log2 std of the worst digit row of a gadget ciphertext encrypting
    ``pt_q`` ([LQ, N], NTT + Montgomery form) (utils.go:51-103).

    Row i decrypts to P * pt * w_i + e_i with w_i the RNS digit selector
    (1 mod the digit's moduli, 0 elsewhere); we subtract the exact gadget
    plaintext (re-derived via keys._add_poly_times_gadget on a zero gadget)
    and report the noisiest row.
    """
    from matrix_fhe_tpu.rlwe.keys import _add_poly_times_gadget

    rq, rp = params.ring_q, params.ring_p
    digits = gct.num_digits
    zero = jnp.zeros_like(gct.q)
    expected = _add_poly_times_gadget(params, pt_q, zero)  # [digits, 2, LQ, N]

    worst = float("-inf")
    for i in range(digits):
        bq, aq = gct.q[i, 0], gct.q[i, 1]
        eq = rq.add(bq, rq.mul_coeffs_montgomery(aq, sk.value.q))
        eq = rq.sub(eq, expected[i, 0])
        eq = rq.imform(rq.intt(eq))
        ep = None
        if gct.p is not None and rp is not None:
            bp, ap = gct.p[i, 0], gct.p[i, 1]
            ep = rp.add(bp, rp.mul_coeffs_montgomery(ap, sk.value.p))
            ep = rp.imform(rp.intt(ep))
        worst = max(worst, _qp_log2_std(params, QPPoly(q=eq, p=ep)))
    return worst


def noise_evaluation_key(params: Parameters, gct: GadgetCiphertext,
                         sk_in_q: jnp.ndarray, sk_out: SecretKey) -> float:
    """log2 std of an evaluation key skIn -> skOut (utils.go:105-109).
    sk_in_q: [LQ, N] NTT + Montgomery."""
    # Rows are encrypted under sk_out; the gadget plaintext is sk_in.
    return noise_gadget_ciphertext(params, gct, sk_in_q, sk_out)


def noise_relinearization_key(params: Parameters, rlk: RelinearizationKey,
                              sk: SecretKey) -> float:
    """log2 std of rlk noise (utils.go:28-33): gadget plaintext is s^2."""
    rq = params.ring_q
    sk2 = rq.mul_coeffs_montgomery(sk.value.q, sk.value.q)
    return noise_evaluation_key(params, rlk.gadget, sk2, sk)


def noise_galois_key(params: Parameters, gk: GaloisKey, sk: SecretKey) -> float:
    """log2 std of a Galois key (utils.go:35-48): re-encryption from sk to
    pi_{k^-1}(sk)."""
    gal_inv = params.mod_inv_galois_element(gk.gal_el)
    if params.ring_type == "matrix":
        idx = am.automorphism_ntt_index_3n(params.n, params.nth_root, gal_inv)
    else:
        idx = am.automorphism_ntt_index(params.n, params.nth_root, gal_inv)
    iidx = jnp.asarray(idx)
    sk_out = SecretKey(value=QPPoly(
        q=sk.value.q[..., iidx],
        p=None if sk.value.p is None else sk.value.p[..., iidx]))
    return noise_evaluation_key(params, gk.gadget, sk.value.q, sk_out)


def norm(params: Parameters, sk: SecretKey, ct: Ciphertext
         ) -> tuple[float, float, float]:
    """(log2 std, log2 min, log2 max) absolute norm of the decryption of
    ``ct`` before decoding, error included (rlwe.Norm, utils.go:111-133)."""
    pt = decryptor.decrypt(params, sk, ct)
    vals = pt.value
    if pt.metadata.is_ntt:
        vals = params.ring_q.at_level(ct.level).intt(vals)
    moduli = list(params.q[:ct.level + 1])
    return norm_stats(_centered_bigints(np.asarray(vals), moduli))


def noise_ciphertext(params: Parameters, sk: SecretKey, ct: Ciphertext,
                     pt_want) -> float:
    """log2 std of Dec(ct) - pt_want where pt_want is a coeff-domain
    [L, N] RNS poly at ct's level — the per-op noise oracle the tests use."""
    dec = decryptor.decrypt(params, sk, ct)
    rq = params.ring_q.at_level(ct.level)
    vals = dec.value
    if dec.metadata.is_ntt:
        vals = rq.intt(vals)
    diff = rq.sub(vals, jnp.asarray(pt_want, dtype=jnp.uint64))
    return log2_std(params, np.asarray(diff))
