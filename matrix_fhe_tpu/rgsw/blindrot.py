"""Blind rotation (LMKCDEY, eprint 2022/198): LWE -> RLWE functional
bootstrapping core.

Counterpart of /root/reference/core/rgsw/blindrot/:

  * ``init_test_polynomial`` (blindrot.go:12-39): encode g over [a, b] into
    the negacyclic test polynomial.
  * ``gen_evaluation_key`` (keys.go:46-120): RGSW(X^{s_j}) per LWE secret
    coefficient + the automorphism keys for GaloisGen^v (v <= windowSize)
    and X^{-g}.
  * ``Evaluator.evaluate`` (evaluator.go:46-135): extract LWE samples from
    the RLWE ciphertext coefficients (mod-switch to 2N), then run Algorithm 3
    (discrete-log scheduled automorphisms interleaved with external
    products) per requested slot.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from matrix_fhe_tpu import rgsw
from matrix_fhe_tpu.ops import automorphism as am
from matrix_fhe_tpu.rlwe import evaluator as rlwe_eval, keys as K
from matrix_fhe_tpu.rlwe.elements import Ciphertext, MetaData
from matrix_fhe_tpu.rlwe.params import GALOIS_GEN, Parameters
from matrix_fhe_tpu.schemes.ckks.encoder import crt_reconstruct_centered

WINDOW_SIZE = 10  # parameter w of Algorithm 3 (keys.go:14)


def init_test_polynomial(g, scale: float, params_br: Parameters,
                         a: float, b: float) -> jnp.ndarray:
    """InitTestPolynomial (blindrot.go:12-39): NTT-domain [L, N] poly."""
    n = params_br.n
    interval = 2.0 / n

    def norm_inv(x):
        return (x * (b - a) + b + a) / 2.0

    def scale_up(v, q):
        r = int(abs(v) * scale + 0.5) % q
        return (q - r) % q if v < 0 else r

    arr = np.zeros((len(params_br.q), n), dtype=np.uint64)
    for j, q in enumerate(params_br.q):
        for i in range(n // 2 + 1):
            arr[j, i] = scale_up(g(norm_inv(-interval * i)), q)
        for i in range(n // 2 + 1, n):
            arr[j, i] = scale_up(-g(norm_inv(interval * (n - i))), q)
    return params_br.ring_q.ntt(jnp.asarray(arr))


@dataclasses.dataclass
class BlindRotationKeys:
    """MemBlindRotationEvaluationKeySet (keys.go:31-44)."""
    brks: list  # RGSW(X^{s_j}) per LWE secret coefficient
    gks: dict[int, K.GaloisKey]


def gen_evaluation_key(key: jax.Array, params_br: Parameters, sk_br: K.SecretKey,
                       params_lwe: Parameters, sk_lwe: K.SecretKey) -> BlindRotationKeys:
    """GenEvaluationKeyNew (keys.go:46-120)."""
    rq_lwe = params_lwe.ring_q.at_level(0)
    s_coeff = rq_lwe.intt(rq_lwe.imform(sk_lwe.value.q[:1]))
    s = crt_reconstruct_centered(np.asarray(s_coeff), params_lwe.q[:1])

    rq = params_br.ring_q
    brks = []
    for si in s:
        key, sub = jax.random.split(key)
        pt = np.zeros((len(params_br.q), params_br.n), dtype=np.uint64)
        k = int(si) % (2 * params_br.n)
        # X^k mod (X^N + 1)
        idx, sign = k % params_br.n, (k // params_br.n) & 1
        for j, q in enumerate(params_br.q):
            pt[j, idx] = q - 1 if sign else 1
        pt_q = rq.mform(rq.ntt(jnp.asarray(pt)))
        brks.append(rgsw.encrypt(sub, params_br, sk_br, pt_q))

    gal_els = [params_br.galois_element(v) for v in range(1, WINDOW_SIZE + 1)]
    gal_els.append(params_br.nth_root - GALOIS_GEN)
    key, sub = jax.random.split(key)
    gks = K.gen_galois_keys(sub, params_br, sk_br, gal_els)
    return BlindRotationKeys(brks=brks, gks=gks)


class Evaluator:
    """blindrot.Evaluator (evaluator.go:14-257)."""

    def __init__(self, params_br: Parameters, params_lwe: Parameters):
        self.params_br = params_br
        self.params_lwe = params_lwe
        # map[(+/-) g^k mod 2N] = +/- k (getGaloisElementInverseMap :235)
        two_n = 2 * params_br.n
        self._dlog = {}
        pow_ = 1
        for i in range(params_br.n // 2):
            self._dlog[pow_] = i
            self._dlog[two_n - pow_] = -i
            pow_ = pow_ * GALOIS_GEN % two_n

    def _mod_switch_to_2n(self, level, pol, make_odd: bool) -> np.ndarray:
        """round(x * 2N / Q) (evaluator.go:284-307)."""
        params = self.params_lwe
        coeffs = crt_reconstruct_centered(np.asarray(pol), params.q[:level + 1])
        # PolyToBigint (non-centered semantics): use representative mod Q
        Q = params.ring_q.modulus_at_level(level)
        two_n = 2 * self.params_br.n
        out = np.zeros(params.n, dtype=np.int64)
        for i, c in enumerate(coeffs):
            c = c % Q
            v = (2 * c * two_n + Q) // (2 * Q)  # round(c * 2N / Q)
            v &= two_n - 1
            if make_odd and v & 1 == 0 and v != 0:
                v ^= 1
            out[i] = v
        return out

    def evaluate(self, ct: Ciphertext, test_polys: dict[int, jnp.ndarray],
                 brk: BlindRotationKeys) -> dict[int, Ciphertext]:
        """Evaluate (evaluator.go:46-135)."""
        params_br = self.params_br
        params_lwe = self.params_lwe
        rq_lwe = params_lwe.ring_q.at_level(ct.level)
        rq_br = params_br.ring_q

        vals = ct.value
        if ct.metadata.is_ntt:
            vals = tuple(rq_lwe.intt(v) for v in vals)

        two_n = 2 * params_br.n
        mask = two_n - 1
        a2n = self._mod_switch_to_2n(ct.level, vals[1], make_odd=True)
        # convolution -> dot product order: a0, -a_{N-1}, ..., -a_1
        a_rlwe = np.zeros(params_lwe.n, dtype=np.int64)
        a_rlwe[0] = a2n[0]
        for j in range(1, params_lwe.n):
            a_rlwe[j] = (-a2n[params_lwe.n - j]) & mask
        b2n = self._mod_switch_to_2n(ct.level, vals[0], make_odd=False)

        md = MetaData(is_ntt=True)
        res = {}
        prev = 0
        a_cur = a_rlwe.copy()
        for index in sorted(test_polys.keys()):
            test_poly = test_polys[index]
            # multiply a by X^{index-prev} mod 2N (utils.go:11-20)
            sh = index - prev
            if sh:
                a_cur = np.concatenate([a_cur[-sh:], a_cur[:-sh]])
                a_cur[:sh] = (-a_cur[:sh]) & mask
            prev = index
            b = int(b2n[index])

            # Acc = (f(X^{-g}) * X^{-g b}, 0): line 2 of Algorithm 7
            xb = np.zeros((len(params_br.q), params_br.n), dtype=np.uint64)
            kk, sign = b % params_br.n, (b // params_br.n) & 1
            for j, q in enumerate(params_br.q):
                xb[j, kk] = q - 1 if sign else 1
            xb_ntt = rq_br.mform(rq_br.ntt(jnp.asarray(xb)))
            fb = rq_br.mul_coeffs_montgomery(test_poly, xb_ntt)
            c0 = am.automorphism_ntt(rq_br, fb, params_br.nth_root - GALOIS_GEN)
            acc = Ciphertext(value=(c0, jnp.zeros_like(c0)), metadata=md)

            acc = self._blind_rotate_core(a_cur, acc, brk)
            res[index] = acc
        return res

    def _blind_rotate_core(self, a: np.ndarray, acc: Ciphertext,
                           brk: BlindRotationKeys) -> Ciphertext:
        """Algorithm 3 (evaluator.go:137-190)."""
        params = self.params_br
        n_half = params.n >> 1

        # map[+/-k] = [i...] (getDiscreteLogSets :258-280)
        sets: dict[int, list[int]] = {}
        for i, ai in enumerate(a):
            ai = int(ai)
            if ai == 0:
                continue  # X^{0 * s_i} = 1: nothing to multiply
            if ai & 1 != 1:
                raise ValueError("a[i] not odd")
            sets.setdefault(self._dlog[ai], []).append(i)

        def apply_auto(ct, v):
            gal = params.galois_element(v)
            return rlwe_eval.automorphism(params, ct, brk.gks[gal])

        v = 0

        def step(k, v, acc):
            if k in sets:
                if v != 0:
                    acc = apply_auto(acc, v)
                    v = 0
                for j in sets[k]:
                    acc = rgsw.external_product(params, acc, brk.brks[j])
            v += 1
            # flush pending automorphisms every window AND at the end of
            # each pass (|k| == 1).  The reference's literal condition is
            # k == 1 (evaluator.go:219) which skips the negative-pass tail;
            # the exact plaintext model of Algorithm 3 requires |k| == 1
            # (verified by simulation; see tests).
            if v == WINDOW_SIZE or abs(k) == 1:
                acc = apply_auto(acc, v)
                v = 0
            return v, acc

        for i in range(n_half - 1, 0, -1):
            v, acc = step(-i, v, acc)
        _, acc = step(2 * params.n, 0, acc)

        # acc = acc(X^{-g})
        gal = params.nth_root - GALOIS_GEN
        acc = rlwe_eval.automorphism(params, acc, brk.gks[gal])

        v = 0
        for i in range(n_half - 1, 0, -1):
            v, acc = step(i, v, acc)
        _, acc = step(0, 0, acc)
        return acc
