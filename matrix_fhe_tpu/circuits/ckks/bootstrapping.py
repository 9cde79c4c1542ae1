"""CKKS bootstrapping: ScaleDown -> ModUp -> CoeffsToSlots -> EvalMod ->
SlotsToCoeffs.

Counterpart of /root/reference/circuits/ckks/bootstrapping/ (evaluator.go
:548-795 bootstrap pipeline, :100-246 matrix/scaling initialization;
parameters.go chain layout).  v1 supports the dense-secret path (no
sparse-secret encapsulation keys EvkDenseToSparse/EvkSparseToDense yet) for
both dense (log_slots = logN-1) and sparse (repack) packings.

The modulus chain is laid out bottom-up as
  [q0 | residual levels | S2C levels | Mod1 levels | C2S levels]
so the pipeline consumes C2S at the top and lands back on the residual
levels (parameters_literal.go modulus budgeting, compacted: one modulus per
DFT matrix, PREC64).
"""

from __future__ import annotations

import dataclasses
import math
from fractions import Fraction

import jax
import numpy as np

from matrix_fhe_tpu.circuits.ckks import dft, mod1
from matrix_fhe_tpu.rlwe import evaluator as rlwe_eval, keys as K
from matrix_fhe_tpu.rlwe.elements import Ciphertext
from matrix_fhe_tpu.schemes import ckks


@dataclasses.dataclass
class ParametersLiteral:
    """Compact analogue of bootstrapping.ParametersLiteral
    (parameters_literal.go): per-step modulus sizes + mod1 knobs."""
    log_n: int
    residual_log_q: tuple[int, ...]      # q0 + usable residual levels
    log_p: tuple[int, ...] = (61, 61)
    log_slots: int | None = None         # default: logN - 1 (dense)
    c2s_log_q: tuple[int, ...] = (56, 56, 56)
    s2c_log_q: tuple[int, ...] = (45, 45, 45)
    mod1_log_q: int = 60
    mod1_type: str = mod1.COS_DISCRETE
    mod1_k: int = 12
    mod1_degree: int = 30
    mod1_double_angle: int = 3
    mod1_inv_degree: int = 0
    log_message_ratio: int = 8
    log_default_scale: int = 45


class Parameters:
    """Assembled bootstrapping parameters: the extended-chain CKKS params
    plus the three sub-circuit literals with budgeted levels."""

    def __init__(self, lit: ParametersLiteral):
        self.lit = lit
        log_slots = lit.log_n - 1 if lit.log_slots is None else lit.log_slots
        self.log_slots = log_slots

        m1_depth = mod1.ParametersLiteral(
            level_q=0, log_scale=lit.mod1_log_q, mod1_type=lit.mod1_type,
            k=lit.mod1_k, mod1_degree=lit.mod1_degree,
            double_angle=lit.mod1_double_angle,
            mod1_inv_degree=lit.mod1_inv_degree).depth()

        logq = (tuple(lit.residual_log_q) + tuple(lit.s2c_log_q)
                + (lit.mod1_log_q,) * m1_depth + tuple(lit.c2s_log_q))
        self.params = ckks.new_parameters(ckks.CKKSParametersLiteral(
            logn=lit.log_n, logq=logq, logp=lit.log_p,
            log_default_scale=lit.log_default_scale))

        L = self.params.max_level
        d_c2s = len(lit.c2s_log_q)
        d_s2c = len(lit.s2c_log_q)
        self.residual_level = len(lit.residual_log_q) - 1

        fmt = dft.SPLIT_REAL_AND_IMAG if log_slots == lit.log_n - 1 \
            else dft.REPACK_IMAG_AS_REAL
        self.c2s_lit = dft.MatrixLiteral(
            type=dft.HOMOMORPHIC_ENCODE, log_slots=log_slots, level_q=L,
            level_p=self.params.max_level_p, levels=[1] * d_c2s, format=fmt)
        self.mod1_lit = mod1.ParametersLiteral(
            level_q=L - d_c2s, log_scale=lit.mod1_log_q,
            mod1_type=lit.mod1_type, log_message_ratio=lit.log_message_ratio,
            k=lit.mod1_k, mod1_degree=lit.mod1_degree,
            double_angle=lit.mod1_double_angle,
            mod1_inv_degree=lit.mod1_inv_degree)
        self.s2c_lit = dft.MatrixLiteral(
            type=dft.HOMOMORPHIC_DECODE, log_slots=log_slots,
            level_q=L - d_c2s - m1_depth, level_p=self.params.max_level_p,
            levels=[1] * d_s2c, format=fmt)
        assert self.s2c_lit.level_q - d_s2c == self.residual_level, \
            (self.s2c_lit.level_q, d_s2c, self.residual_level)

    def galois_elements(self) -> list[int]:
        els = set(dft.galois_elements(self.params, self.c2s_lit))
        els |= set(dft.galois_elements(self.params, self.s2c_lit))
        els |= set(rlwe_eval.galois_elements_for_trace(self.params, self.log_slots))
        els.discard(1)
        return sorted(els)


@dataclasses.dataclass
class EvaluationKeys:
    rlk: K.RelinearizationKey
    gks: dict[int, K.GaloisKey]


def gen_evaluation_keys(key: jax.Array, p: Parameters,
                        sk: K.SecretKey) -> EvaluationKeys:
    k1, k2 = jax.random.split(key)
    rlk = K.gen_relinearization_key(k1, p.params, sk)
    gks = K.gen_galois_keys(k2, p.params, sk, p.galois_elements())
    return EvaluationKeys(rlk=rlk, gks=gks)


class Evaluator:
    """bootstrapping.Evaluator (evaluator.go:100-246 init, :548 bootstrap)."""

    def __init__(self, p: Parameters, evk: EvaluationKeys):
        self.p = p
        params = p.params
        self.ev = ckks.Evaluator(params, rlk=evk.rlk, galois_keys=evk.gks)
        self.enc = ckks.Encoder(params)
        self.gks = evk.gks

        self.mod1_params = mod1.new_parameters_from_literal(params, p.mod1_lit)
        m1 = self.mod1_params

        # Scaling constants (evaluator.go:197-233)
        q_div = float(m1.scaling_factor) / math.exp2(round(math.log2(params.q[0])))
        q_div = min(q_div, 1.0)
        c2s_scaling = q_div / (m1.k * m1.q_diff)
        offset = float(m1.scaling_factor) / m1.message_ratio
        s2c_scaling = float(params.default_scale) / offset

        c2s_lit = dataclasses.replace(p.c2s_lit, scaling=c2s_scaling)
        s2c_lit = dataclasses.replace(p.s2c_lit, scaling=s2c_scaling)
        self.c2s_matrix = dft.new_matrix_from_literal(params, c2s_lit, self.enc)
        self.s2c_matrix = dft.new_matrix_from_literal(params, s2c_lit, self.enc)
        self.mod1_eval = mod1.Evaluator(self.ev, self.enc, self.mod1_params)

    # -- pipeline steps ----------------------------------------------------
    def scale_down(self, ct: Ciphertext) -> Ciphertext:
        """evaluator.go:598-645 ScaleDown: to level 0, scale q0/msgRatio."""
        params = self.p.params
        msg_ratio = self.mod1_params.message_ratio

        def ratio_ok(c):
            cur = Fraction(params.ring_q.modulus_at_level(c.level)) / c.scale
            return cur >= Fraction(params.q[c.level]) * Fraction(msg_ratio)

        while ct.level != 0 and ratio_ok(ct):
            ct = self.ev.drop_level(ct, 1)

        current = Fraction(params.ring_q.modulus_at_level(ct.level)) / ct.scale
        scale_up = current / Fraction(msg_ratio)
        if scale_up < Fraction(1, 2):
            raise ValueError("initial Q/scale < 0.5 * q0/msgRatio")
        factor = round(scale_up)
        if factor >= 1:
            ct = self.ev.scale_up(ct, factor)

        while ct.level != 0:
            ct = self.ev.rescale(ct)
        return ct

    def mod_up(self, ct: Ciphertext) -> Ciphertext:
        """evaluator.go:646-795 ModUp (dense-key path): centered lift
        q0 -> Q, NTT, message scale-up, Trace (SubSum)."""
        import jax.numpy as jnp
        params = self.p.params
        q0 = params.q[0]
        rq0 = params.ring_q.at_level(0)
        rq = params.ring_q

        from matrix_fhe_tpu.ops import modmath as mm

        def centered_lift(coeff):
            """Signed lift of values mod q0 to every Qi with full Barrett
            reduction (evaluator.go:683-700: BRedAdd per limb) — unlike the
            small-norm lift, magnitudes here are up to q0/2 and must be
            reduced mod the (possibly smaller) destination primes."""
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
        out = ct.with_value(tuple(vals))

        m1 = self.mod1_params
        scale = (float(m1.scaling_factor) / m1.message_ratio) / float(ct.scale)
        if scale > 1:
            factor = round(scale)
            out = self.ev.scale_up(out, factor)

        return rlwe_eval.trace(params, out, self.p.log_slots, self.gks)

    def coeffs_to_slots(self, ct: Ciphertext):
        return dft.coeffs_to_slots(self.p.params, self.ev, ct,
                                   self.c2s_matrix, self.gks)

    def eval_mod(self, ct: Ciphertext) -> Ciphertext:
        out = self.mod1_eval.evaluate(ct)
        return out.with_metadata(scale=self.p.params.default_scale)

    def slots_to_coeffs(self, ct_real, ct_imag) -> Ciphertext:
        return dft.slots_to_coeffs(self.p.params, self.ev, ct_real, ct_imag,
                                   self.s2c_matrix, self.gks)

    # -- full pipeline -----------------------------------------------------
    def bootstrap(self, ct: Ciphertext) -> Ciphertext:
        """evaluator.go:548-588: refresh ct to the top residual level."""
        ct = self.scale_down(ct)
        ct = self.mod_up(ct)
        ct_real, ct_imag = self.coeffs_to_slots(ct)
        ct_real = self.eval_mod(ct_real)
        if ct_imag is not None:
            ct_imag = self.eval_mod(ct_imag)
        return self.slots_to_coeffs(ct_real, ct_imag)
