"""RGSW: gadget-ciphertext pairs and the RLWE x RGSW external product.

Counterpart of /root/reference/core/rgsw/ (elements.go, encryptor.go,
evaluator.go):

  * RGSW(m) = (GadgetEnc(m) on component 0, GadgetEnc(m) on component 1)
    i.e. rows [(-a s + P w m + e, a), (-b s + e, b + P w m)]
    (evaluator.go:85-87 comment).
  * ExternalProduct(ct, RGSW(m)) ~= m * ct: decompose both limbs of ct,
    inner product with the two gadget ciphertexts, ModDown
    (evaluator.go:42-257, multiple-P path).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from matrix_fhe_tpu.ops import modmath as mm
from matrix_fhe_tpu.rlwe import evaluator as rlwe_eval
from matrix_fhe_tpu.rlwe import keys as K
from matrix_fhe_tpu.rlwe.elements import Ciphertext
from matrix_fhe_tpu.rlwe.params import Parameters


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=["g0", "g1"], meta_fields=[])
@dataclasses.dataclass(frozen=True)
class RGSWCiphertext:
    """elements.go:12-34: two gadget ciphertexts (m and m*s)."""
    g0: K.GadgetCiphertext
    g1: K.GadgetCiphertext


def _num_rows(params: Parameters,
              evk_params: K.EvaluationKeyParameters | None) -> int:
    if evk_params is not None and evk_params.base_two_decomposition > 0:
        return sum(K.base_two_counts(params.q,
                                     evk_params.base_two_decomposition))
    alpha = max(len(params.p), 1)
    return -(-len(params.q) // alpha)


def _encrypt_zero_gadget(key: jax.Array, params: Parameters, sk: K.SecretKey,
                         evk_params: K.EvaluationKeyParameters | None = None
                         ) -> K.GadgetCiphertext:
    """A fresh zero gadget ciphertext [digits, 2, L, N] over (Q, P')."""
    b2 = 0 if evk_params is None else evk_params.base_two_decomposition
    rows_q, rows_p = [], []
    for _ in range(_num_rows(params, evk_params)):
        key, sub = jax.random.split(key)
        c0, c1 = K.encrypt_zero_qp(sub, params, sk)
        rows_q.append(jnp.stack([c0.q, c1.q]))
        if params.ring_p is not None:
            rows_p.append(jnp.stack([c0.p, c1.p]))
    gq = jnp.stack(rows_q)
    gp = jnp.stack(rows_p) if rows_p else None
    return K.GadgetCiphertext(q=gq, p=gp, base_two=b2)


def _add_pt_times_gadget(params: Parameters, pt_q: jnp.ndarray,
                         gct: K.GadgetCiphertext, component: int) -> K.GadgetCiphertext:
    """AddPolyTimesGadgetVectorToGadgetCiphertext (gadgetciphertext.go:172)
    on the given component; pt_q in NTT+MForm."""
    rq = params.ring_q
    big_p = params.big_p()
    rows = []
    if gct.base_two > 0:
        # (limb i)-major x base-2^B digit j rows: P * 2^{jB} * pt * w_i
        counts = K.base_two_counts(params.q, gct.base_two)
        r = 0
        for i, qi in enumerate(params.q):
            for j in range(counts[i]):
                sc = jnp.zeros((len(params.q),), dtype=jnp.uint64)
                s = (big_p << (j * gct.base_two)) % qi
                sc = sc.at[i].set((s << 64) % qi)
                scaled = rq.mul_scalar_montgomery(pt_q, sc)
                row = [gct.q[r, 0], gct.q[r, 1]]
                row[component] = mm.cred(row[component] + scaled,
                                         rq.moduli[:, None])
                rows.append(jnp.stack(row))
                r += 1
        return K.GadgetCiphertext(q=jnp.stack(rows), p=gct.p,
                                  base_two=gct.base_two)
    scaled = rq.mul_scalar_montgomery(
        pt_q, jnp.array([(big_p << 64) % q for q in params.q], dtype=jnp.uint64))
    digits = gct.q.shape[0]
    alpha = max(len(params.p), 1)
    for i in range(digits):
        start, end = i * alpha, min((i + 1) * alpha, len(params.q))
        mask = jnp.zeros((len(params.q), 1), dtype=jnp.uint64)
        mask = mask.at[start:end].set(1)
        row = [gct.q[i, 0], gct.q[i, 1]]
        row[component] = mm.cred(row[component] + scaled * mask,
                                 rq.moduli[:, None])
        rows.append(jnp.stack(row))
    return K.GadgetCiphertext(q=jnp.stack(rows), p=gct.p)


def encrypt(key: jax.Array, params: Parameters, sk: K.SecretKey,
            pt_q: jnp.ndarray,
            evk_params: K.EvaluationKeyParameters | None = None
            ) -> RGSWCiphertext:
    """RGSW encryption of pt (NTT+MForm mod Q) under sk
    (encryptor.go:25-72); ``evk_params`` selects the base-2^B gadget."""
    k0, k1 = jax.random.split(key)
    g0 = _encrypt_zero_gadget(k0, params, sk, evk_params)
    g1 = _encrypt_zero_gadget(k1, params, sk, evk_params)
    g0 = _add_pt_times_gadget(params, pt_q, g0, 0)
    g1 = _add_pt_times_gadget(params, pt_q, g1, 1)
    return RGSWCiphertext(g0=g0, g1=g1)


def encrypt_plaintext(key: jax.Array, params: Parameters, sk: K.SecretKey,
                      value: int,
                      evk_params: K.EvaluationKeyParameters | None = None
                      ) -> RGSWCiphertext:
    """RGSW of the constant ``value`` (NewGadgetPlaintext scalar path)."""
    rq = params.ring_q
    pt = jnp.zeros((len(params.q), params.n), dtype=jnp.uint64)
    pt = pt.at[:, 0].set(jnp.array([value % q for q in params.q],
                                   dtype=jnp.uint64))
    pt_q = rq.mform(rq.ntt(pt))
    return encrypt(key, params, sk, pt_q, evk_params)


def external_product(params: Parameters, ct: Ciphertext,
                     rgsw: RGSWCiphertext) -> Ciphertext:
    """opOut = [<decomp(ct), rgsw.g0>, <decomp(ct), rgsw.g1>]
    (evaluator.go:188-257 multiple-P path + ModDown)."""
    level = ct.level
    rq = params.ring_q.at_level(level)
    if rgsw.g0.base_two > 0:
        d0 = rlwe_eval.decompose_ntt_base2(params, level, ct.value[0],
                                           rgsw.g0.base_two, rgsw.g0.level_p)
        d1 = rlwe_eval.decompose_ntt_base2(params, level, ct.value[1],
                                           rgsw.g1.base_two, rgsw.g1.level_p)
    else:
        d0 = rlwe_eval.decompose_ntt(params, level, ct.value[0])
        d1 = rlwe_eval.decompose_ntt(params, level, ct.value[1])

    a0 = rlwe_eval.gadget_product_hoisted_lazy(params, level, d0, rgsw.g0)
    a1 = rlwe_eval.gadget_product_hoisted_lazy(params, level, d1, rgsw.g1)
    rp = None if rgsw.g0.p is None \
        else params.ring_p.at_level(rgsw.g0.level_p)
    out = [rq.add(a0[0], a1[0]), rq.add(a0[1], a1[1]),
           None if rp is None else rp.add(a0[2], a1[2]),
           None if rp is None else rp.add(a0[3], a1[3])]
    c0 = rlwe_eval.mod_down_qp(params, level, out[0], out[2])
    c1 = rlwe_eval.mod_down_qp(params, level, out[1], out[3])
    return ct.with_value((c0, c1))
