"""t-out-of-N threshold secret sharing over R_QP (Shamir).

Counterpart of /root/reference/multiparty/threshold.go (eprint 2022/780):

  * ``Thresholdizer``: secret Shamir polynomial with ringQP coefficients
    (constant term = the party's additive sk share), evaluated at each
    recipient's public point (:21-115).
  * ``Combiner``: Lagrange recombination producing a t-out-of-t additive
    share: sk_add = share * prod_{j != i} x_j / (x_j - x_i) (:118-180).

Public points are nonzero uint64s; scalar arithmetic is exact host-side
Python per RNS limb.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from matrix_fhe_tpu.ops import samplers as smp
from matrix_fhe_tpu.rlwe import keys as K
from matrix_fhe_tpu.rlwe.params import Parameters


def _moduli(params: Parameters) -> list[int]:
    return list(params.q) + list(params.p)


def _qp_concat(poly: K.QPPoly) -> jnp.ndarray:
    if poly.p is None:
        return poly.q
    return jnp.concatenate([poly.q, poly.p], axis=-2)


def _qp_split(params: Parameters, arr: jnp.ndarray) -> K.QPPoly:
    lq = len(params.q)
    if len(params.p) == 0:
        return K.QPPoly(q=arr, p=None)
    return K.QPPoly(q=arr[..., :lq, :], p=arr[..., lq:, :])


class Thresholdizer:
    @staticmethod
    def gen_shamir_polynomial(key: jax.Array, params: Parameters,
                              threshold: int, secret: K.SecretKey) -> list[K.QPPoly]:
        """threshold.go:82-96: degree threshold-1, constant term = secret."""
        if threshold < 1:
            raise ValueError("threshold must be >= 1")
        coeffs = [secret.value]
        for _ in range(threshold - 1):
            key, sub = jax.random.split(key)
            kq, kp = jax.random.split(sub)
            coeffs.append(K.QPPoly(
                q=smp.uniform_poly(kq, params.ring_q),
                p=None if params.ring_p is None else
                smp.uniform_poly(kp, params.ring_p)))
        return coeffs

    @staticmethod
    def gen_shamir_secret_share(params: Parameters, recipient: int,
                                shamir_poly: list[K.QPPoly]) -> K.QPPoly:
        """Horner evaluation at the public point (EvalPolyScalar)."""
        moduli = _moduli(params)
        xs = jnp.array([recipient % q for q in moduli], dtype=jnp.uint64)[:, None]
        arrs = [_qp_concat(c) for c in shamir_poly]
        from matrix_fhe_tpu.ops import modmath as mm
        q = jnp.array(moduli, dtype=jnp.uint64)[:, None]
        bhi = jnp.concatenate([params.ring_q.bhi,
                               params.ring_p.bhi] if params.ring_p is not None
                              else [params.ring_q.bhi])[:, None]
        blo = jnp.concatenate([params.ring_q.blo,
                               params.ring_p.blo] if params.ring_p is not None
                              else [params.ring_q.blo])[:, None]
        acc = arrs[-1]
        for c in reversed(arrs[:-1]):
            acc = mm.cred(mm.bred(acc, xs, q, bhi, blo) + c, q)
        return _qp_split(params, acc)

    @staticmethod
    def aggregate(params: Parameters, s1: K.QPPoly, s2: K.QPPoly) -> K.QPPoly:
        rq, rp = params.ring_q, params.ring_p
        return K.QPPoly(q=rq.add(s1.q, s2.q),
                        p=None if s1.p is None else rp.add(s1.p, s2.p))


class Combiner:
    """threshold.go:118-180."""

    def __init__(self, params: Parameters, own: int, others: list[int],
                 threshold: int):
        self.params = params
        self.threshold = threshold
        self.own = own
        self.moduli = _moduli(params)
        # lagrangeCoeff(own, that) = that / (that - own) per limb
        self._lagrange = {}
        for that in others:
            if that != own:
                self._lagrange[that] = [
                    that * pow((that - own) % q, q - 2, q) % q
                    for q in self.moduli]

    def gen_additive_share(self, actives: list[int],
                           own_share: K.QPPoly) -> K.SecretKey:
        if len(actives) < self.threshold:
            raise ValueError("not enough active players")
        prod = [1] * len(self.moduli)
        for active in actives[: self.threshold]:
            if active != self.own:
                lc = self._lagrange[active]
                prod = [p * c % q for p, c, q in zip(prod, lc, self.moduli)]
        # multiply the (NTT+MForm) share by the scalar, staying in MForm:
        # scalar in MForm, Montgomery-mul keeps the domain
        from matrix_fhe_tpu.ops import modmath as mm
        arr = _qp_concat(own_share)
        sc = jnp.array([(p << 64) % q for p, q in zip(prod, self.moduli)],
                       dtype=jnp.uint64)[:, None]
        q = jnp.array(self.moduli, dtype=jnp.uint64)[:, None]
        qinv = jnp.concatenate(
            [self.params.ring_q.qinv, self.params.ring_p.qinv]
            if self.params.ring_p is not None else [self.params.ring_q.qinv])[:, None]
        out = mm.mred(arr, sc, q, qinv)
        return K.SecretKey(value=_qp_split(self.params, out))
