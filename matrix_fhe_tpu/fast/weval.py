"""WideEvaluator: the full CKKS evaluator API on the wide (45-55-bit) path.

Drop-in subclass of ``schemes.ckks.Evaluator`` whose ciphertexts hold wide
pair limbs (int32 [2, L, N], ops/wide.py) instead of uint64, backed by a
:class:`fast.wckks.WideCKKSContext`.  The counterpart of fast/feval.py for
the reference's production prime widths: because every circuit (polynomial
P-S, mod1, homomorphic DFT, bootstrapping) programs against the evaluator
interface, the entire circuit layer — including the full bootstrap
pipeline — runs unchanged on this backend at reference-grade scales
(default_parameters.go 45-bit scale chains).

Bit-exactness: every overridden op reduces to the wide kernels pinned
bit-exact against the u64 parity path (tests/test_wring.py); composed
circuits therefore match the u64 circuits limb-for-limb on the same
moduli/keys (tests/test_weval.py, test_wboot.py).
"""

from __future__ import annotations

from fractions import Fraction

import jax.numpy as jnp
import numpy as np

from matrix_fhe_tpu.ops import wide
from matrix_fhe_tpu.fast import wckks, wlintrans, wrns
from matrix_fhe_tpu.fast.wckks import WideCKKSContext
from matrix_fhe_tpu.rlwe.elements import Ciphertext, Plaintext
from matrix_fhe_tpu.schemes import ckks


def _pair31(params) -> bool:
    """The context mode rule over the FULL modulus set (q and p)."""
    return wide.use_pair31(list(params.q) + list(params.p or ()))


def ct_to_wide(ct: Ciphertext, params) -> Ciphertext:
    lq = ct.value[0].shape[-2]
    m = _pair31(params)
    return ct.with_value(tuple(
        jnp.asarray(wide.pack_pair(np.asarray(v), params.q[:lq], m))
        for v in ct.value))


def ct_to_u64(ct: Ciphertext, params) -> Ciphertext:
    lq = ct.value[0].shape[-2]
    m = _pair31(params)
    return ct.with_value(tuple(
        jnp.asarray(wide.unpack_pair(np.asarray(v), params.q[:lq], m))
        for v in ct.value))


class WideEncoder:
    """Encoder adapter: the host-side canonical embedding is shared with the
    u64 path; plaintext limbs are packed into wide pairs."""

    def __init__(self, params):
        self.params = params
        self._u64 = ckks.Encoder(params)

    def encode(self, values, level=None, scale=None, is_ntt=True) -> Plaintext:
        pt = self._u64.encode(values, level=level, scale=scale, is_ntt=is_ntt)
        lq = pt.value.shape[-2]
        return Plaintext(
            value=jnp.asarray(wide.pack_pair(np.asarray(pt.value),
                                             self.params.q[:lq],
                                             _pair31(self.params))),
            metadata=pt.metadata)

    def decode(self, pt: Plaintext) -> np.ndarray:
        v = np.asarray(pt.value)
        if v.dtype != np.int32:
            # already a u64 plaintext (e.g. decrypted from a ct_to_u64'd
            # ciphertext): decode directly — unpacking it as wide pairs
            # would shred it
            return self._u64.decode(pt)
        lq = v.shape[-2]
        return self._u64.decode(Plaintext(
            value=jnp.asarray(wide.unpack_pair(v, self.params.q[:lq],
                                               _pair31(self.params))),
            metadata=pt.metadata))

    def embed_qp(self, values, level_q, level_p=None, scale=None):
        """u64 QP embedding for DFT-matrix generation (diagonals stay in
        u64 LinearTransformation form; converted lazily by
        WideEvaluator.evaluate_lintrans)."""
        return self._u64.embed_qp(values, level_q, level_p, scale)


class WideEvaluator(ckks.Evaluator):
    """ckks.Evaluator over wide pair ciphertexts.

    Inherits all scale/level bookkeeping and linear ops (WideRing
    duck-types the Ring surface); overrides the kernels that differ:
    scalar ops (plain domain), rescale, relinearization, automorphisms and
    the lintrans/trace/mod-raise composites.
    """

    def __init__(self, params, ctx: WideCKKSContext):
        super().__init__(params, rlk=None, galois_keys=None)
        if ctx.level != params.max_level:
            raise ValueError("wide context must be built at the top level")
        self._ctx_cache: dict[int, WideCKKSContext] = {ctx.level: ctx}
        self._wlt_cache: dict[int, wlintrans.WideLinearTransformation] = {}
        self._evk_cache: dict[int, tuple] = {}

    # -- context ladder ------------------------------------------------------
    def _ctx(self, level: int) -> WideCKKSContext:
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
        sc = [c % q for q in ring.moduli_tuple]
        return ct.with_value(tuple(ring.mul_scalar_montgomery(v, sc)
                                   for v in ct.value))

    def _double_rns_scalars(self, level: int, c: complex, scale) -> tuple:
        s0, s1 = self._double_rns_scalar_ints(level, c, scale)
        qs = self.params.q[: level + 1]
        a0 = np.array(s0, dtype=np.uint64)[:, None]
        a1 = np.array(s1, dtype=np.uint64)[:, None]
        m = _pair31(self.params)
        return (jnp.asarray(wide.pack_pair(a0, qs, m)),
                jnp.asarray(wide.pack_pair(a1, qs, m)))

    # -- rescale -------------------------------------------------------------
    def rescale(self, a: Ciphertext) -> Ciphertext:
        level = a.level
        if level == 0:
            raise ValueError("cannot rescale: level 0")
        ring = self._ring(level)
        if a.metadata.is_ntt:
            out = tuple(wrns.div_round_by_last_modulus_many_ntt(ring, v, 1)
                        for v in a.value)
        else:
            out = tuple(wrns.div_round_by_last_modulus(ring, v)
                        for v in a.value)
        scale = a.scale / Fraction(self.params.q[level])
        return a.with_value(out).with_metadata(scale=scale)

    # -- key switching -------------------------------------------------------
    def relinearize(self, ct: Ciphertext) -> Ciphertext:
        if ct.degree != 2:
            raise ValueError("relinearize expects a degree-2 ciphertext")
        ctx = self._ctx(ct.level)
        r0, r1 = wckks.gadget_product(ctx, ct.value[2])
        rq = ctx.ring_q
        return ct.with_value((rq.add(ct.value[0], r0),
                              rq.add(ct.value[1], r1)))

    def _evk_wide(self, evk, level: int):
        kq, kp = self._evk_cache.get(id(evk), (None, None))
        if kq is None:
            q_pair, p_pair = wckks._convert_gadget(self.params, evk.gadget)
            kq, kp = jnp.asarray(q_pair), jnp.asarray(p_pair)
            self._evk_cache[id(evk)] = (kq, kp)
        D = self._ctx(level).dec.num_digits
        return kq[:D, :, :, : level + 1, :], kp[:D]

    def apply_evaluation_key(self, ct: Ciphertext, evk) -> Ciphertext:
        ctx = self._ctx(ct.level)
        kq, kp = self._evk_wide(evk, ct.level)
        d0, d1 = wckks.gadget_product_core(ctx, kq, kp, ct.value[1])
        rq = ctx.ring_q
        return ct.with_value((rq.add(d0, ct.value[0]), d1))

    # -- automorphisms -------------------------------------------------------
    def _automorphism(self, a: Ciphertext, gal_el: int) -> Ciphertext:
        if gal_el == 1:
            return a
        ctx = self._ctx(a.level)
        d0, d1 = wckks.automorphism(ctx, a.value[0], a.value[1], gal_el)
        return a.with_value((d0, d1))

    def rotate_hoisted(self, a: Ciphertext, ks: list[int]) -> dict[int, Ciphertext]:
        ctx = self._ctx(a.level)
        gal = {k: self.params.galois_element(k) for k in ks}
        els = sorted({g for g in gal.values() if g != 1})
        res = wckks.rotations_hoisted(ctx, a.value[0], a.value[1], els) \
            if els else {}
        return {k: (a if g == 1 else a.with_value(res[g]))
                for k, g in gal.items()}

    # -- composites ----------------------------------------------------------
    def evaluate_lintrans(self, ct: Ciphertext, lt_obj, gks=None) -> Ciphertext:
        wlt = self._wlt_cache.get(id(lt_obj))
        if wlt is None:
            wlt = wlintrans.convert_lintrans(self.params, lt_obj)
            self._wlt_cache[id(lt_obj)] = wlt
        level = min(ct.level, lt_obj.level_q)
        ct = self._drop_level(ct, level)
        ctx = self._ctx(level)
        matvec = (wlintrans.matvec_naive if lt_obj.n1 == 0
                  else wlintrans.matvec_bsgs)
        out0, out1 = matvec(ctx, wlt, ct.value[0], ct.value[1],
                            self.params.galois_element)
        return ct.with_value((out0, out1)).with_metadata(
            scale=ct.scale * lt_obj.scale)

    def trace_log_n(self, ct: Ciphertext, log_n: int) -> Ciphertext:
        """Wide mirror of rlwe_eval.trace (core/rlwe/inner_sum.go:36-124);
        NTT-domain only."""
        if ct.degree != 1:
            raise ValueError("trace expects a degree-1 ciphertext")
        if not ct.metadata.is_ntt:
            raise ValueError("wide trace expects an NTT-domain ciphertext")
        params = self.params
        level = ct.level
        ring = self._ring(level)
        gap = 1 << (params.log_n - log_n - 1)
        if log_n == 0:
            gap <<= 1
        if gap <= 1:
            return ct
        sc = [pow(gap, -1, q) for q in ring.moduli_tuple]
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
        """Centered lift q0 -> Q (bootstrap ModUp): the coefficient-domain
        centered pair value spreads to every destination limb via its
        modulus-independent digit planes — same math as the u64 mod_raise,
        bit-exact."""
        params = self.params
        rq0 = self._ring(0)
        rq = self._ring(params.max_level)

        vals = []
        for v in ct.value:
            coeff = rq0.intt(v)  # [.., 2, 1, N] pair mod q0, centered
            lo, hi = wide.center_lift(rq0.tabs, coeff[..., 0, 0, :],
                                      coeff[..., 1, 0, :])
            lifted = wrns.spread_value(lo, hi, rq.tabs, rq0.tabs)
            vals.append(rq.ntt(lifted))
        return ct.with_value(tuple(vals))


def make_wide_evaluator(params, rlk, gks, rescale_limbs: int = 1
                        ) -> WideEvaluator:
    """Build a WideEvaluator from u64-path keys (converted once)."""
    ctx = wckks.make_context(params, rlk, gks, rescale_limbs=rescale_limbs)
    return WideEvaluator(params, ctx)
