"""FastEvaluator: the full CKKS evaluator API on the int32 fast path.

Drop-in subclass of ``schemes.ckks.Evaluator`` whose ciphertexts hold int32
``[L, N]`` limbs (canonical in [0, q), q < 2^23) instead of uint64, backed by
a :class:`fast.fckks.FastCKKSContext` (f32-Shoup arithmetic + fused Pallas
NTT).  Because every circuit (polynomial P-S, mod1, homomorphic DFT,
bootstrapping) programs against the evaluator interface, the entire circuit
layer — including the full bootstrap pipeline — runs unchanged on this
backend; only the numeric kernels differ.  Counterpart of the reference's
single evaluator (schemes/ckks/evaluator.go) whose single u64 backend plays
both roles.

Bit-exactness: every overridden op reduces to the fast kernels that are
pinned bit-exact against the u64 parity path (tests/test_fckks.py,
test_fdft.py, test_flintrans.py); composed circuits therefore match the u64
circuits limb-for-limb on the same moduli/keys (tests/test_feval.py,
test_fboot.py).
"""

from __future__ import annotations

from fractions import Fraction

import jax.numpy as jnp
import numpy as np

from matrix_fhe_tpu.fast import fckks, flintrans, fring, frns
from matrix_fhe_tpu.fast.fckks import FastCKKSContext
from matrix_fhe_tpu.rlwe.elements import Ciphertext, Plaintext
from matrix_fhe_tpu.schemes import ckks


def to_int32(v: jnp.ndarray) -> jnp.ndarray:
    """u64-path canonical limbs (< 2^23) -> int32 fast-path limbs."""
    return jnp.asarray(v).astype(jnp.int64).astype(jnp.int32)


def to_uint64(v: jnp.ndarray) -> jnp.ndarray:
    """int32 fast-path canonical limbs -> u64-path limbs."""
    return jnp.asarray(v).astype(jnp.int64).astype(jnp.uint64)


def ct_to_fast(ct: Ciphertext) -> Ciphertext:
    return ct.with_value(tuple(to_int32(v) for v in ct.value))


def ct_to_u64(ct: Ciphertext) -> Ciphertext:
    return ct.with_value(tuple(to_uint64(v) for v in ct.value))


class FastEncoder:
    """Encoder adapter: the host-side canonical embedding is shared with the
    u64 path (schemes/ckks/encoder.py); plaintext limbs are cast to int32."""

    def __init__(self, params):
        self.params = params
        self._u64 = ckks.Encoder(params)

    def encode(self, values, level=None, scale=None, is_ntt=True) -> Plaintext:
        pt = self._u64.encode(values, level=level, scale=scale, is_ntt=is_ntt)
        return Plaintext(value=to_int32(pt.value), metadata=pt.metadata)

    def decode(self, pt: Plaintext) -> np.ndarray:
        return self._u64.decode(
            Plaintext(value=to_uint64(pt.value), metadata=pt.metadata))


class FastEvaluator(ckks.Evaluator):
    """ckks.Evaluator over int32 ciphertexts.

    Inherits all scale/level bookkeeping and linear ops (FastRing duck-types
    the Ring surface, fast/fring.py); overrides only the kernels that differ:
    integer/double-RNS scalars (plain domain instead of Montgomery), rescale,
    relinearization, automorphisms and the lintrans/trace/mod-raise
    composites.
    """

    def __init__(self, params, ctx: FastCKKSContext):
        super().__init__(params, rlk=None, galois_keys=None)
        if ctx.level != params.max_level:
            raise ValueError("fast context must be built at the top level")
        self._ctx_cache: dict[int, FastCKKSContext] = {ctx.level: ctx}
        self._flt_cache: dict[int, flintrans.FastLinearTransformation] = {}
        self._evk_cache: dict[int, tuple] = {}

    # -- context ladder (one decomposer/ModDown table set per level) --------
    def _ctx(self, level: int) -> FastCKKSContext:
        c = self._ctx_cache.get(level)
        if c is None:
            c = self._ctx_cache[max(self._ctx_cache)].at_level(level)
            self._ctx_cache[level] = c
        return c

    def _ring(self, level: int):
        return self._ctx(level).ring_q

    # -- scalar ops ----------------------------------------------------------
    def _mul_integer(self, ct: Ciphertext, c: int) -> Ciphertext:
        ring = self._ring(ct.level)
        sc = jnp.array([c % q for q in ring.moduli_tuple], dtype=jnp.int32)
        return ct.with_value(tuple(ring.mul_scalar_montgomery(v, sc)
                                   for v in ct.value))

    def _double_rns_scalars(self, level: int, c: complex, scale) -> tuple:
        s0, s1 = self._double_rns_scalar_ints(level, c, scale)
        return (jnp.array(s0, dtype=jnp.int32)[:, None],
                jnp.array(s1, dtype=jnp.int32)[:, None])

    # -- rescale -------------------------------------------------------------
    def rescale(self, a: Ciphertext) -> Ciphertext:
        level = a.level
        if level == 0:
            raise ValueError("cannot rescale: level 0")
        ring = self._ring(level)
        if a.metadata.is_ntt:
            out = tuple(frns.div_round_by_last_modulus_many_ntt(ring, v, 1)
                        for v in a.value)
        else:
            out = tuple(frns.div_round_by_last_modulus(ring, v)
                        for v in a.value)
        scale = a.scale / Fraction(self.params.q[level])
        return a.with_value(out).with_metadata(scale=scale)

    # -- key switching -------------------------------------------------------
    def relinearize(self, ct: Ciphertext) -> Ciphertext:
        if ct.degree != 2:
            raise ValueError("relinearize expects a degree-2 ciphertext")
        ctx = self._ctx(ct.level)
        r0, r1 = fckks.gadget_product(ctx, ct.value[2])
        rq = ctx.ring_q
        return ct.with_value((rq.add(ct.value[0], r0),
                              rq.add(ct.value[1], r1)))

    def _evk32(self, evk, level: int):
        """Convert (and per-level slice) a u64 EvaluationKey's gadget to
        int32 stacks, cached by key identity."""
        kq, kp = self._evk_cache.get(id(evk), (None, None))
        if kq is None:
            q32, p32 = fckks._convert_gadget(self.params, evk.gadget)
            kq, kp = jnp.asarray(q32), jnp.asarray(p32)
            self._evk_cache[id(evk)] = (kq, kp)
        D = self._ctx(level).dec.num_digits
        return kq[:D, :, : level + 1, :], kp[:D]

    def apply_evaluation_key(self, ct: Ciphertext, evk) -> Ciphertext:
        ctx = self._ctx(ct.level)
        kq, kp = self._evk32(evk, ct.level)
        d0, d1 = fckks.gadget_product_core(ctx, kq, kp, ct.value[1])
        rq = ctx.ring_q
        return ct.with_value((rq.add(d0, ct.value[0]), d1))

    # -- automorphisms -------------------------------------------------------
    def _automorphism(self, a: Ciphertext, gal_el: int) -> Ciphertext:
        if gal_el == 1:
            return a
        ctx = self._ctx(a.level)
        d0, d1 = fckks.automorphism(ctx, a.value[0], a.value[1], gal_el)
        return a.with_value((d0, d1))

    def rotate_hoisted(self, a: Ciphertext, ks: list[int]) -> dict[int, Ciphertext]:
        ctx = self._ctx(a.level)
        gal = {k: self.params.galois_element(k) for k in ks}
        els = sorted({g for g in gal.values() if g != 1})
        res = fckks.rotations_hoisted(ctx, a.value[0], a.value[1], els) \
            if els else {}
        return {k: (a if g == 1 else a.with_value(res[g]))
                for k, g in gal.items()}

    # -- composites ----------------------------------------------------------
    def evaluate_lintrans(self, ct: Ciphertext, lt_obj, gks=None) -> Ciphertext:
        """BSGS diagonal-matrix multiply on the int32 path
        (fast/flintrans.py); the u64 ``lt_obj`` plaintexts are converted to
        plain-domain int32 once and cached."""
        flt = self._flt_cache.get(id(lt_obj))
        if flt is None:
            flt = flintrans.convert_lintrans(self.params, lt_obj)
            self._flt_cache[id(lt_obj)] = flt
        level = min(ct.level, lt_obj.level_q)
        ct = self._drop_level(ct, level)
        ctx = self._ctx(level)
        matvec = (flintrans.matvec_naive if lt_obj.n1 == 0
                  else flintrans.matvec_bsgs)
        out0, out1 = matvec(ctx, flt, ct.value[0], ct.value[1],
                            self.params.galois_element)
        return ct.with_value((out0, out1)).with_metadata(
            scale=ct.scale * lt_obj.scale)

    def trace_log_n(self, ct: Ciphertext, log_n: int) -> Ciphertext:
        """Fast mirror of rlwe_eval.trace (core/rlwe/inner_sum.go:36-124);
        NTT-domain only (the fast path never leaves the NTT domain)."""
        if ct.degree != 1:
            raise ValueError("trace expects a degree-1 ciphertext")
        if not ct.metadata.is_ntt:
            raise ValueError("fast trace expects an NTT-domain ciphertext")
        params = self.params
        level = ct.level
        ring = self._ring(level)
        gap = 1 << (params.log_n - log_n - 1)
        if log_n == 0:
            gap <<= 1
        if gap <= 1:
            return ct
        sc = jnp.array([pow(gap, -1, q) for q in ring.moduli_tuple],
                       dtype=jnp.int32)
        out = ct.with_value(tuple(ring.mul_scalar_montgomery(v, sc)
                                  for v in ct.value))
        for i in range(log_n, params.log_n - 1):
            rot = self._automorphism(out, params.galois_element(1 << i))
            out = out.with_value((ring.add(out.value[0], rot.value[0]),
                                  ring.add(out.value[1], rot.value[1])))
        if log_n == 0 and params.ring_type == "standard":
            rot = self._automorphism(out, params.nth_root - 1)
            out = out.with_value((ring.add(out.value[0], rot.value[0]),
                                  ring.add(out.value[1], rot.value[1])))
        return out

    def mod_raise(self, ct: Ciphertext) -> Ciphertext:
        """Centered lift q0 -> Q (bootstrap ModUp), int32: q0 is a single
        fast prime so the lift is an exact sign-extended reduction per
        destination limb — same math as the u64 mod_raise, bit-exact."""
        params = self.params
        q0 = params.q[0]
        rq0 = self._ring(0)
        rq = self._ring(params.max_level)
        qq = rq.moduli[:, None]

        def centered_lift(coeff):
            neg = coeff >= jnp.int32(q0 >> 1)
            mag = jnp.where(neg, jnp.int32(q0) - coeff, coeff)
            t = fring.canon(fring.reduce_once(
                mag[None, :], qq, rq.qinv_f[:, None]), qq)
            return jnp.where(neg[None, :],
                             jnp.where(t == 0, jnp.int32(0), qq - t), t)

        vals = []
        for v in ct.value:
            coeff = rq0.intt(v)[..., 0, :]  # [N] int32 mod q0
            vals.append(rq.ntt(centered_lift(coeff)))
        return ct.with_value(tuple(vals))


def make_fast_evaluator(params, rlk, gks, rescale_limbs: int = 1
                        ) -> FastEvaluator:
    """Build a FastEvaluator from u64-path keys (converted once)."""
    ctx = fckks.make_context(params, rlk, gks, rescale_limbs=rescale_limbs)
    return FastEvaluator(params, ctx)
