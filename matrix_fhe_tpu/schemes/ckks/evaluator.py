"""CKKS evaluator.

Counterpart of /root/reference/schemes/ckks/evaluator.go:

  * add/sub with scale matching (:66-245 matchScaleThenEvaluateInPlace —
    when scales differ by an integer ratio, the lower-scale operand is
    multiplied by it first)
  * mul / mul_relin: ciphertext tensor in the NTT domain (:764-918)
  * rescale: DivRoundByLastModulusManyNTT, scale /= q_l (:500-542)
  * rotate / conjugate via Galois automorphisms (:1195-1232)
  * mul_plain / add_plain, scalar ops, inner_sum (:1284-1321)
"""

from __future__ import annotations

from fractions import Fraction

import jax.numpy as jnp

from matrix_fhe_tpu.ops import rns_tools as rt
from matrix_fhe_tpu.rlwe import evaluator as rlwe_eval
from matrix_fhe_tpu.rlwe.elements import Ciphertext, Plaintext
from matrix_fhe_tpu.rlwe.keys import GaloisKey, RelinearizationKey
from matrix_fhe_tpu.schemes.ckks.params import CKKSParameters


class Evaluator:
    """Stateless; holds parameters and the key set (relin + galois keys)."""

    def __init__(self, params: CKKSParameters,
                 rlk: RelinearizationKey | None = None,
                 galois_keys: dict[int, GaloisKey] | None = None):
        self.params = params
        self.rlk = rlk
        self.gks = galois_keys or {}

    # -- helpers -------------------------------------------------------------
    def _ring(self, level: int):
        return self.params.ring_q.at_level(level)

    def _match(self, a: Ciphertext, b: Ciphertext):
        """Level + scale alignment (evaluator.go:250-340 evaluateInPlace):
        the lower-scale operand is multiplied by floor(ratio) (when >= 1) and
        both are treated as being at the higher scale — the fractional
        remainder is part of the CKKS approximation error, exactly like the
        reference's ratioFlo.Int(nil) flooring."""
        level = min(a.level, b.level)
        a, b = self._drop_level(a, level), self._drop_level(b, level)
        if a.scale == b.scale:
            return a, b, a.scale
        lo, hi = (a, b) if a.scale < b.scale else (b, a)
        ratio = int(hi.scale / lo.scale)  # floor
        if ratio >= 1:
            lo = self._mul_integer(lo, ratio)
        lo = lo.with_metadata(scale=hi.scale)
        return (lo, hi, hi.scale) if a.scale < b.scale else (hi, lo, hi.scale)

    def _drop_level(self, ct: Ciphertext, level: int) -> Ciphertext:
        if ct.level == level:
            return ct
        return ct.with_value(tuple(v[..., : level + 1, :] for v in ct.value))

    def _mul_integer(self, ct: Ciphertext, c: int) -> Ciphertext:
        ring = self._ring(ct.level)
        sc = jnp.array([(c % q) * (1 << 64) % q for q in ring.moduli_tuple],
                       dtype=jnp.uint64)  # MForm(c) per limb
        return ct.with_value(tuple(ring.mul_scalar_montgomery(v, sc)
                                   for v in ct.value))

    # -- linear ops ------------------------------------------------------------
    def add(self, a: Ciphertext, b) -> Ciphertext:
        if isinstance(b, Plaintext):
            return self.add_plain(a, b)
        a, b, scale = self._match(a, b)
        ring = self._ring(a.level)
        d = max(a.degree, b.degree)
        va = list(a.value) + [None] * (d - a.degree)
        vb = list(b.value) + [None] * (d - b.degree)
        out = tuple(x if y is None else (y if x is None else ring.add(x, y))
                    for x, y in zip(va, vb))
        return a.with_value(out).with_metadata(scale=scale)

    def sub(self, a: Ciphertext, b) -> Ciphertext:
        if isinstance(b, Plaintext):
            return self.add_plain(a, Plaintext(value=self._ring(b.level).neg(b.value),
                                               metadata=b.metadata))
        a, b, scale = self._match(a, b)
        ring = self._ring(a.level)
        d = max(a.degree, b.degree)
        va = list(a.value) + [None] * (d - a.degree)
        vb = list(b.value) + [None] * (d - b.degree)
        out = tuple((ring.neg(y) if x is None else
                     (x if y is None else ring.sub(x, y)))
                    for x, y in zip(va, vb))
        return a.with_value(out).with_metadata(scale=scale)

    def neg(self, a: Ciphertext) -> Ciphertext:
        ring = self._ring(a.level)
        return a.with_value(tuple(ring.neg(v) for v in a.value))

    def add_plain(self, a: Ciphertext, pt: Plaintext) -> Ciphertext:
        level = min(a.level, pt.level)
        a = self._drop_level(a, level)
        ring = self._ring(level)
        ptv = pt.value[..., : level + 1, :]
        if pt.scale != a.scale:
            ratio = a.scale / pt.scale
            if ratio.denominator != 1:
                raise ValueError("plaintext scale incompatible")
            sc = ring.mform(ring._scalar_limbs(int(ratio)))
            ptv = ring.mul_scalar_montgomery(ptv, sc)
        return a.with_value((ring.add(a.value[0], ptv),) + a.value[1:])

    # -- multiplication ---------------------------------------------------------
    def mul(self, a: Ciphertext, b) -> Ciphertext:
        """Tensor without relinearization -> degree-2 ct (evaluator.go:630)."""
        if isinstance(b, Plaintext):
            return self.mul_plain(a, b)
        a, b = self._drop_level(a, min(a.level, b.level)), None if b is None else b
        return self._tensor(a, b, relin=False)

    def mul_relin(self, a: Ciphertext, b) -> Ciphertext:
        if isinstance(b, Plaintext):
            return self.mul_plain(a, b)
        return self._tensor(a, b, relin=True)

    def _tensor(self, a: Ciphertext, b: Ciphertext, relin: bool) -> Ciphertext:
        """mulRelin (evaluator.go:786-918): NTT-domain tensor product."""
        level = min(a.level, b.level)
        a, b = self._drop_level(a, level), self._drop_level(b, level)
        if a.degree != 1 or b.degree != 1:
            raise ValueError("tensor expects degree-1 inputs")
        ring = self._ring(level)
        a0 = ring.mform(a.value[0])
        a1 = ring.mform(a.value[1])
        c0 = ring.mul_coeffs_montgomery(a0, b.value[0])
        c1 = ring.add(ring.mul_coeffs_montgomery(a0, b.value[1]),
                      ring.mul_coeffs_montgomery(a1, b.value[0]))
        c2 = ring.mul_coeffs_montgomery(a1, b.value[1])
        scale = a.scale * b.scale
        ct = Ciphertext(value=(c0, c1, c2),
                        metadata=a.metadata).with_metadata(scale=scale)
        if relin:
            ct = self.relinearize(ct)
        return ct

    # -- key-switching indirection ------------------------------------------
    # Circuits (polynomial, mod1, dft, bootstrapping) call these methods so a
    # drop-in evaluator over a different numeric backend (fast/feval.py int32
    # path) only overrides them, not the circuit code.

    def relinearize(self, ct: Ciphertext) -> Ciphertext:
        if self.rlk is None:
            raise ValueError("no relinearization key")
        return rlwe_eval.relinearize(self.params, ct, self.rlk)

    def apply_evaluation_key(self, ct: Ciphertext, evk) -> Ciphertext:
        return rlwe_eval.apply_evaluation_key(self.params, ct, evk)

    def evaluate_lintrans(self, ct: Ciphertext, lt_obj, gks=None) -> Ciphertext:
        """One diagonal-form linear transformation (BSGS double-hoisted)."""
        from matrix_fhe_tpu.circuits import lintrans as lt
        return lt.evaluate(self.params, ct, lt_obj,
                           self.gks if gks is None else gks)

    def trace_log_n(self, ct: Ciphertext, log_n: int) -> Ciphertext:
        """rlwe trace with an explicit subring degree (inner_sum.go:36)."""
        return rlwe_eval.trace(self.params, ct, log_n, self.gks)

    def mod_raise(self, ct: Ciphertext) -> Ciphertext:
        """Bootstrap ModUp raise (bootstrapping/evaluator.go:683-700): the
        level-0 ciphertext's coefficients are lifted centered from q0 to the
        full chain Q with full Barrett reduction per destination limb
        (magnitudes up to q0/2 can exceed the smaller destination primes)."""
        from matrix_fhe_tpu.ops import modmath as mm
        params = self.params
        q0 = params.q[0]
        rq0 = params.ring_q.at_level(0)
        rq = params.ring_q

        def centered_lift(coeff):
            neg = coeff >= jnp.uint64(q0 >> 1)
            mag = jnp.where(neg, jnp.uint64(q0) - coeff, coeff)
            t = mm.bred_add(mag[None, :], rq.moduli[:, None], rq.bhi[:, None])
            return jnp.where(neg[None, :],
                             jnp.where(t == 0, jnp.uint64(0),
                                       rq.moduli[:, None] - t),
                             t)

        vals = []
        for v in ct.value:
            coeff = rq0.intt(v)[..., 0, :]  # [N] mod q0
            vals.append(rq.ntt(centered_lift(coeff)))
        return ct.with_value(tuple(vals))

    def mul_plain(self, a: Ciphertext, pt: Plaintext) -> Ciphertext:
        level = min(a.level, pt.level)
        a = self._drop_level(a, level)
        ring = self._ring(level)
        ptm = ring.mform(pt.value[..., : level + 1, :])
        out = tuple(ring.mul_coeffs_montgomery(v, ptm) for v in a.value)
        return a.with_value(out).with_metadata(scale=a.scale * pt.scale)

    def mul_const(self, a: Ciphertext, c) -> Ciphertext:
        """Multiply by a real scalar encoded at scale q[level], so the
        following rescale cancels the scale exactly (the reference's
        scalar-Mul convention, evaluator.go:433 + scaling.go:10)."""
        if isinstance(c, int):
            return self._mul_integer(a, c)
        scale = Fraction(self.params.q[a.level])
        ci = round(float(c) * float(scale))
        out = self._mul_integer(a, ci)
        return out.with_metadata(scale=a.scale * scale)

    def scale_up(self, a: Ciphertext, factor: int) -> Ciphertext:
        """Multiply by an integer and track it in the scale
        (ScaleUp, evaluator.go:449-462)."""
        return self._mul_integer(a, factor).with_metadata(
            scale=a.scale * Fraction(factor))

    def drop_level(self, a: Ciphertext, n: int = 1) -> Ciphertext:
        return self._drop_level(a, a.level - n)

    def set_scale(self, a: Ciphertext, target) -> Ciphertext:
        """SetScale (evaluator.go SetScale): consume one level to bring the
        ciphertext to exactly ``target`` scale."""
        target = Fraction(target)
        ratio = target / a.scale
        out = self.rescale(self.mul_const(a, float(ratio)))
        return out.with_metadata(scale=target)

    # -- scalar (double-RNS) operations ------------------------------------------
    # evaluateWithScalar (evaluator.go:433-447): a complex constant a+bi is,
    # in the NTT domain, the vector [a + b*i_q]*N/2 || [a - b*i_q]*N/2 with
    # i_q = psi^{N/2} = g^{(q-1)/4} a principal 4th root of unity mod q.

    def _double_rns_scalar_ints(self, level: int, c: complex, scale
                                ) -> tuple[list[int], list[int]]:
        """Host-side per-limb integer scalars of a complex constant (pure
        Python — safe to call at trace time; backends turn the lists into
        their own array forms)."""
        from matrix_fhe_tpu.utils import primes as pr
        moduli = self.params.q[: level + 1]

        def round_half(x: float) -> int:
            # bigComplexToRNSScalar (scaling.go:10-44): add +-0.5, truncate
            from math import floor, ceil
            return floor(x + 0.5) if x > 0 else (ceil(x - 0.5) if x < 0 else 0)

        sf = float(scale)
        a = round_half(c.real * sf)
        b = round_half(c.imag * sf)
        if self.params.ring_type == "conjugate_invariant":
            if b:
                raise ValueError("complex constant undefined on the CI ring")
            s = [a % q for q in moduli]
            return s, s
        s0, s1 = [], []
        for q in moduli:
            g, _ = pr.primitive_root(q)
            iq = pow(g, (q - 1) // 4, q)
            # match the NTT tables: psi = g^((q-1)/nth_root), i_q = psi^{N/2}
            s0.append((a + b * iq) % q)
            s1.append((a - b * iq) % q)
        return s0, s1

    def _double_rns_scalars(self, level: int, c: complex, scale) -> tuple:
        s0, s1 = self._double_rns_scalar_ints(level, c, scale)
        return (jnp.array(s0, dtype=jnp.uint64)[:, None],
                jnp.array(s1, dtype=jnp.uint64)[:, None])

    def _apply_double_rns(self, ct: Ciphertext, s0, s1, op: str,
                          mul_scale=None) -> Ciphertext:
        ring = self._ring(ct.level)
        n = self.params.n
        h = n // 2

        def run(v, first_only=False):
            lo, hi = v[..., :h], v[..., h:]
            if op == "add":
                return jnp.concatenate([ring.add(lo, jnp.broadcast_to(s0, lo.shape)),
                                        ring.add(hi, jnp.broadcast_to(s1, hi.shape))], axis=-1)
            if op == "sub":
                return jnp.concatenate([ring.sub(lo, jnp.broadcast_to(s0, lo.shape)),
                                        ring.sub(hi, jnp.broadcast_to(s1, hi.shape))], axis=-1)
            # mul: Barrett per half
            return jnp.concatenate([ring.mul_coeffs_barrett(lo, jnp.broadcast_to(s0, lo.shape)),
                                    ring.mul_coeffs_barrett(hi, jnp.broadcast_to(s1, hi.shape))], axis=-1)

        if op in ("add", "sub"):
            out = (run(ct.value[0]),) + ct.value[1:]
            return ct.with_value(out)
        out = tuple(run(v) for v in ct.value)
        return ct.with_value(out).with_metadata(scale=ct.scale * mul_scale)

    def add_const(self, ct: Ciphertext, c) -> Ciphertext:
        """ct + constant (complex), encoded at ct.scale (evaluator.go:82-101)."""
        s0, s1 = self._double_rns_scalars(ct.level, complex(c), ct.scale)
        return self._apply_double_rns(ct, s0, s1, "add")

    def sub_const(self, ct: Ciphertext, c) -> Ciphertext:
        s0, s1 = self._double_rns_scalars(ct.level, complex(c), ct.scale)
        return self._apply_double_rns(ct, s0, s1, "sub")

    def mul_const_complex(self, ct: Ciphertext, c, scale=None) -> Ciphertext:
        """ct * constant (complex) encoded at ``scale`` (default q[level],
        cancelled exactly by the next rescale)."""
        scale = Fraction(self.params.q[ct.level] if scale is None else scale)
        s0, s1 = self._double_rns_scalars(ct.level, complex(c), scale)
        return self._apply_double_rns(ct, s0, s1, "mul", mul_scale=scale)

    def mul_const_then_add(self, x: Ciphertext, c, res: Ciphertext) -> Ciphertext:
        """res += x * const with the const encoded at res.scale/x.scale
        (MulThenAdd scalar path, evaluator.go:918-1010)."""
        pt_scale = res.scale / x.scale
        prod = self.mul_const_complex(self._drop_level(x, res.level), c, pt_scale)
        return self.add(res, prod)

    def _add_raw(self, res: Ciphertext, prod: Ciphertext) -> Ciphertext:
        """Limb-wise accumulate ``prod`` into ``res`` at res's declared
        scale (the MulThenAdd accumulation step: no scale re-matching)."""
        ring = self._ring(res.level)
        d = max(res.degree, prod.degree)
        va = list(res.value) + [None] * (d - res.degree)
        vb = list(prod.value) + [None] * (d - prod.degree)
        out = tuple(x if y is None else (y if x is None else ring.add(x, y))
                    for x, y in zip(va, vb))
        return res.with_value(out)

    def mul_then_add(self, a: Ciphertext, b, res: Ciphertext) -> Ciphertext:
        """res += a * b WITHOUT relinearization (MulThenAdd,
        evaluator.go:918-1046): ct x ct accumulates a degree-2 result;
        ct x pt keeps the degree.  If res.scale < a.scale * b.scale (by a
        ratio >= 2), res is first multiplied up to the product scale —
        mulRelinThenAdd's noiseless-accumulation rule (:1100-1112)."""
        return self._mul_then_add(a, b, res, relin=False)

    def mul_relin_then_add(self, a: Ciphertext, b, res: Ciphertext) -> Ciphertext:
        """res += relin(a * b) (MulRelinThenAdd, evaluator.go:1065-1094)."""
        return self._mul_then_add(a, b, res, relin=True)

    def _mul_then_add(self, a: Ciphertext, b, res: Ciphertext,
                      relin: bool) -> Ciphertext:
        if isinstance(b, Plaintext):
            level = min(a.level, b.level, res.level)
            prod = self.mul_plain(self._drop_level(a, level), b)
        else:
            level = min(a.level, b.level, res.level)
            prod = self._tensor(self._drop_level(a, level),
                                self._drop_level(b, level), relin=False)
            if relin:
                prod = self.relinearize(prod)
        res = self._drop_level(res, level)
        res_scale = prod.scale
        if res.scale < res_scale:
            ratio = res_scale / res.scale
            # only scale up when int(ratio) >= 2, truncated like the
            # reference's ratio.Value.Int (evaluator.go:1104-1110)
            if int(ratio) >= 2:
                res = self._mul_integer(res, int(ratio)).with_metadata(
                    scale=res_scale)
        elif res.scale > res_scale:
            raise ValueError(
                "mul_then_add: res.scale > a.scale * b.scale is unsupported "
                "(evaluator.go:1103)")
        return self._add_raw(res, prod)

    # -- rescaling ---------------------------------------------------------------
    def rescale(self, a: Ciphertext) -> Ciphertext:
        """Divide by the last modulus (evaluator.go:500-542)."""
        level = a.level
        if level == 0:
            raise ValueError("cannot rescale: level 0")
        ring = self._ring(level)
        out = tuple(rt.div_round_by_last_modulus_ntt(ring, v) if a.metadata.is_ntt
                    else rt.div_round_by_last_modulus(ring, v) for v in a.value)
        scale = a.scale / Fraction(self.params.q[level])
        return a.with_value(out).with_metadata(scale=scale)

    def rescale_to_default(self, a: Ciphertext) -> Ciphertext:
        """RescaleTo(default/2 bound) (evaluator.go:543-612): rescale while
        scale >= minScale * q_l."""
        min_scale = self.params.default_scale / 2
        ct = a
        while ct.level > 0 and ct.scale / Fraction(self.params.q[ct.level]) >= min_scale:
            ct = self.rescale(ct)
        return ct

    # -- rotations ------------------------------------------------------------------
    def rotate(self, a: Ciphertext, k: int) -> Ciphertext:
        """Rotate slots left by k (evaluator.go:1202)."""
        gal_el = self.params.galois_element(k)
        return self._automorphism(a, gal_el)

    def conjugate(self, a: Ciphertext) -> Ciphertext:
        if self.params.ring_type == "conjugate_invariant":
            raise ValueError("undefined on the conjugate-invariant ring")
        return self._automorphism(a, self.params.galois_element_inverse())

    def _automorphism(self, a: Ciphertext, gal_el: int) -> Ciphertext:
        if gal_el == 1:
            return a
        gk = self.gks.get(gal_el)
        if gk is None:
            raise ValueError(f"missing Galois key for element {gal_el}")
        return rlwe_eval.automorphism(self.params, a, gk)

    def rotate_hoisted(self, a: Ciphertext, ks: list[int]) -> dict[int, Ciphertext]:
        """RotateHoisted (evaluator.go:1245): one decomposition, many rotations."""
        digits = rlwe_eval.decompose_ntt(self.params, a.level, a.value[1])
        out = {}
        for k in ks:
            gal_el = self.params.galois_element(k)
            if gal_el == 1:
                out[k] = a
                continue
            gk = self.gks.get(gal_el)
            if gk is None:
                raise ValueError(f"missing Galois key for rotation {k}")
            out[k] = rlwe_eval.automorphism_hoisted(self.params, a, digits, gk)
        return out

    def inner_function(self, a: Ciphertext, batch: int, n: int,
                       fn) -> Ciphertext:
        """InnerFunction (core/rlwe/inner_sum.go:316): generic log-step
        folding of slots (i + batch*j) for j < n with an arbitrary
        associative binary op ``fn(ct, ct) -> ct`` — e.g. add for InnerSum,
        a homomorphic max composite for tournament reductions."""
        if n < 1:
            raise ValueError("n must be >= 1")
        result = None   # partial fold of m terms
        m = 0
        for bit in reversed(range(n.bit_length())):
            if result is not None:
                result = fn(result, self.rotate(result, batch * m))
                m *= 2
            if (n >> bit) & 1:
                result = a if result is None else fn(a, self.rotate(result, batch))
                m += 1
        return result

    def inner_sum(self, a: Ciphertext, batch: int, n: int) -> Ciphertext:
        """InnerSum (inner_sum.go:361): out slot i = sum_{j<n} in slot
        (i + batch*j) — InnerFunction specialized to addition."""
        return self.inner_function(a, batch, n, self.add)

    def replicate(self, a: Ciphertext, batch: int, n: int) -> Ciphertext:
        """Replicate (core/rlwe/inner_sum.go:477): inner sum with a negative
        shift, replicating each slot n times."""
        return self.inner_sum(a, -batch, n)

    def trace(self, a: Ciphertext, log_slots: int) -> Ciphertext:
        """Project onto 2^log_slots slots (evaluator-level binding of
        rlwe trace; inner_sum.go:36)."""
        return self.trace_log_n(a, log_slots + 1)

    def galois_elements_for_inner_sum(self, batch: int, n: int) -> list[int]:
        els = set()
        result_m = 0
        for bit in reversed(range(n.bit_length())):
            if result_m:
                els.add(self.params.galois_element(batch * result_m))
                result_m *= 2
            if (n >> bit) & 1:
                if result_m:
                    els.add(self.params.galois_element(batch))
                result_m += 1
        els.discard(1)
        return sorted(els)
