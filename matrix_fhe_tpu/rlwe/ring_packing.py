"""Ring packing: Expand (coefficient extraction) and Pack (coefficient
repacking) via automorphism trees.

Counterpart of /root/reference/core/rlwe/ring_packing.go:

  * ``expand`` (:475-622): ct encrypting sum c_i X^i -> one ciphertext per
    (gap-strided) index i encrypting c_i in the constant coefficient, by
    logN rounds of even/odd splitting with phi_{N/n+1} and X^{-2^i}.
  * ``pack`` (:623-795): the inverse — a map of ciphertexts each holding
    values in strided coefficients is merged into one, by the tree
    a + X^t b + phi(a - X^t b).
  * ``gen_x_pow2_ntt`` (:796-834): MForm NTT monomials X^{+-2^i}.

Standard (power-of-two) rings only, like the reference.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from matrix_fhe_tpu.rlwe import evaluator as rlwe_eval
from matrix_fhe_tpu.rlwe.elements import Ciphertext
from matrix_fhe_tpu.rlwe.params import Parameters


def gen_x_pow2_ntt(params: Parameters, div: bool) -> list[jnp.ndarray]:
    """X^{2^i} (or X^{-2^i} if div) for 0 <= i < logN, NTT + MForm."""
    rq = params.ring_q
    n = params.n
    out = []
    for i in range(params.log_n):
        k = (2 * n - (1 << i)) % (2 * n) if div else (1 << i)
        arr = np.zeros((len(params.q), n), dtype=np.uint64)
        idx, sign = k % n, (k // n) & 1
        for j, q in enumerate(params.q):
            arr[j, idx] = q - 1 if sign else 1
        out.append(rq.mform(rq.ntt(jnp.asarray(arr))))
    return out


def galois_elements_for_expand(params: Parameters) -> list[int]:
    """ring_packing_keys.go:143-153."""
    return [params.nth_root // (2 << i) + 1 for i in range(params.log_n)]


def galois_elements_for_pack(params: Parameters, log_gap: int) -> list[int]:
    """ring_packing_keys.go:156-180."""
    els = [params.galois_element(1 << i) for i in range(log_gap)]
    if log_gap == params.log_n:
        els.append(params.nth_root - 1)
    return els


def _mul_scalar_big(rq, v, c: int):
    sc = jnp.array([(c % q) * (1 << 64) % q for q in rq.moduli_tuple],
                   dtype=jnp.uint64)
    return rq.mul_scalar_montgomery(v, sc)


def expand(params: Parameters, ct: Ciphertext, log_gap: int,
           gks, x_inv_pow2=None,
           num_stages: int | None = None) -> dict[int, Ciphertext]:
    """Expand (ring_packing.go:475-622): NTT-domain degree-1 input.

    ``num_stages`` < log_n stops the extraction tree early: the result is
    2^num_stages ciphertexts where ct_j (times X^{-j}) carries the
    coefficients with index ≡ j mod 2^num_stages and zeros elsewhere — the
    inverse of a 2^num_stages-way coefficient interleave (the unpack step
    of the packed batch bootstrap, evaluator.go:1003-1065)."""
    if params.ring_type != "standard":
        raise ValueError("expand requires the standard ring")
    level = ct.level
    rq = params.ring_q.at_level(level)
    log_n = params.log_n
    if num_stages is None:
        num_stages = log_n
    if x_inv_pow2 is None:
        x_inv_pow2 = gen_x_pow2_ntt(params, div=True)

    n_inv = pow(1 << num_stages, -1, rq.modulus_at_level(level))
    base = ct.with_value(tuple(_mul_scalar_big(rq, v, n_inv) for v in ct.value))

    cts: dict[int, Ciphertext] = {0: base}
    gap = 1 << log_gap
    for i in range(num_stages):
        n = 1 << i
        gal_el = params.n // n + 1
        for j in range(0, n, gap):
            c0 = cts[j]
            tmp = rlwe_eval.automorphism(params, c0, gks[gal_el])
            if j + n // gap > 0:
                c1_vals = tuple(rq.sub(a, b) for a, b in zip(c0.value, tmp.value))
                xp = x_inv_pow2[i][:level + 1]
                c1_vals = tuple(rq.mul_coeffs_montgomery(v, xp) for v in c1_vals)
                cts[j + n] = c0.with_value(c1_vals)
            cts[j] = c0.with_value(tuple(rq.add(a, b)
                                         for a, b in zip(c0.value, tmp.value)))
    return {k: v for k, v in cts.items() if k % gap == 0}


def pack(params: Parameters, cts: dict[int, Ciphertext], input_log_gap: int,
         zero_garbage_slots: bool, gks, x_pow2=None) -> Ciphertext:
    """Pack (ring_packing.go:623-795): NTT-domain degree-1 inputs."""
    if params.ring_type != "standard":
        raise ValueError("pack requires the standard ring")
    if not cts:
        raise ValueError("no ciphertexts to pack")
    keys = sorted(cts.keys())
    log_n = params.log_n
    level = cts[keys[0]].level
    rq = params.ring_q.at_level(level)
    if x_pow2 is None:
        x_pow2 = gen_x_pow2_ntt(params, div=False)

    if len(keys) > 1:
        gap = np.gcd.reduce(np.array(keys[1:], dtype=np.int64)) if keys[0] == 0 \
            else np.gcd.reduce(np.array(keys, dtype=np.int64))
        gap = int(gap)
        log_gap = gap.bit_length() - 1
        if gap != 1 << log_gap:
            raise ValueError("ciphertext indices must have power-of-two gaps")
    else:
        gap, log_gap = params.n, log_n

    log_start = log_n - input_log_gap
    log_end = log_n
    if not zero_garbage_slots and gap > 0:
        log_end -= log_gap
    if log_start >= log_end:
        raise ValueError("gap between ciphertexts smaller than input gap")

    n_inv = pow(1 << (log_end - log_start), -1, rq.modulus_at_level(level))
    work: dict[int, Ciphertext | None] = {
        k: v.with_value(tuple(_mul_scalar_big(rq, x, n_inv) for x in v.value))
        for k, v in cts.items()}

    for i in range(log_start, log_end):
        t = 1 << (log_n - 1 - i)
        xp = x_pow2[log_n - i - 1][:level + 1]
        gal_el = params.nth_root - 1 if i == 0 else params.galois_element(1 << (i - 1))
        for jx in range(t):
            jy = jx + t
            a = work.get(jx)
            b = work.get(jy)
            if b is not None:
                b = b.with_value(tuple(rq.mul_coeffs_montgomery(v, xp)
                                       for v in b.value))
                if a is not None:
                    tmpa = a.with_value(tuple(rq.sub(x, y) for x, y in
                                              zip(a.value, b.value)))
                    a = a.with_value(tuple(rq.add(x, y) for x, y in
                                           zip(a.value, b.value)))
                    tmpa = rlwe_eval.automorphism(params, tmpa, gks[gal_el])
                    work[jx] = a.with_value(tuple(rq.add(x, y) for x, y in
                                                  zip(a.value, tmpa.value)))
                else:
                    # b*X^t - phi(b*X^t)
                    tmpa = rlwe_eval.automorphism(params, b, gks[gal_el])
                    work[jx] = b.with_value(tuple(rq.sub(x, y) for x, y in
                                                  zip(b.value, tmpa.value)))
                work[jy] = None
            elif a is not None:
                tmpa = rlwe_eval.automorphism(params, a, gks[gal_el])
                work[jx] = a.with_value(tuple(rq.add(x, y) for x, y in
                                              zip(a.value, tmpa.value)))
    return work[0]
