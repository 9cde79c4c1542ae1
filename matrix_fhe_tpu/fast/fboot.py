"""Fast-path CKKS bootstrapping: the full pipeline on int32 kernels.

The bootstrap circuit (circuits/ckks/bootstrapping.py, counterpart of
/root/reference/circuits/ckks/bootstrapping/evaluator.go:548-795) programs
against the evaluator interface, so the whole pipeline — ScaleDown, ModUp,
CoeffsToSlots, EvalMod, SlotsToCoeffs, META-BTS — runs on the int32 fast
path by injecting a :class:`fast.feval.FastEvaluator`.

Word-size-reduced chains (SURVEY.md §7.1): every modulus is a <2^23
NTT-friendly prime, so q0 (the bootstrap base modulus) is itself small and
the base precision is bounded by log2(q0 / messageRatio) minus evaluation
noise.  The intended production use is therefore META-BTS iteration
(``Evaluator.evaluate(ct, iterations=k)``, eprint 2022/1167): each cheap
fast-path pass adds ~``reserved_bits`` bits, recovering the precision the
reference gets from a single 60-bit-q0 pass (default_parameters.go:25-40)
at a fraction of the per-pass cost on 32-bit hardware.
"""

from __future__ import annotations

from matrix_fhe_tpu.circuits.ckks import bootstrapping as btp
from matrix_fhe_tpu.fast import feval, fring

# re-exported conversion helpers (u64 <-> int32 ciphertexts)
ct_to_fast = feval.ct_to_fast
ct_to_u64 = feval.ct_to_u64


class FastBootstrapEncoder(feval.FastEncoder):
    """FastEncoder + the (u64) embed_qp used for DFT-matrix generation: the
    diagonal plaintexts stay in u64 LinearTransformation form and are
    converted to int32 lazily by FastEvaluator.evaluate_lintrans."""

    def embed_qp(self, values, level_q, level_p=None, scale=None):
        return self._u64.embed_qp(values, level_q, level_p, scale)


def check_fast_chain(params) -> None:
    for q in list(params.q) + list(params.p or ()):
        if q >= fring.MAX_FAST_MODULUS:
            raise ValueError(
                f"modulus {q} >= 2^23: chain is not fast-path compatible "
                f"(use a fast_parameters_literal preset)")


def make_fast_bootstrapper(p: btp.Parameters,
                           evk: btp.EvaluationKeys) -> btp.Evaluator:
    """Bootstrapping evaluator whose pipeline runs on the int32 fast path.

    ``p`` must be built from a fast (all-moduli < 2^23) literal; ``evk`` are
    ordinary u64-path keys (converted once at context build).  Ciphertexts
    in/out are int32 fast-path ciphertexts (convert with ct_to_fast /
    ct_to_u64).
    """
    params = p.params
    check_fast_chain(params)
    fev = feval.make_fast_evaluator(params, evk.rlk, evk.gks)
    fenc = FastBootstrapEncoder(params)
    return btp.Evaluator(p, evk, ev=fev, enc=fenc)


# -- word-size-reduced presets ------------------------------------------------
# Chain layouts mirroring the reference's default sets' *shape*
# (default_parameters.go) under the <2^23 constraint: every logical level is
# one ~22-bit prime; precision is recovered via META-BTS iterations.

def fast_parameters_literal(log_n: int, residual_levels: int = 3,
                            sparse_weight: int = 32) -> btp.ParametersLiteral:
    """A fast-path bootstrapping literal for degree 2^log_n.

    q0 ~ 2^22, message ratio 2^7 (bottom scale ~2^15), default scale 2^15,
    CosDiscrete degree 30 / K=16 with 3 double-angle rounds over a
    sparse-encapsulated secret of weight ``sparse_weight`` (keys.go:400);
    pass sparse_weight=0 for the dense-key path (toy/test sizes only — the
    dense secret's larger ||I(X)|| needs K beyond this preset's budget at
    production degrees)."""
    return btp.ParametersLiteral(
        log_n=log_n,
        residual_log_q=(22,) * residual_levels,
        log_p=(22, 22, 22),
        log_slots=None,
        c2s_log_q=(22, 22, 22),
        s2c_log_q=(22, 22, 22),
        mod1_log_q=22,
        mod1_type="cos_discrete",
        mod1_k=16,
        mod1_degree=30,
        mod1_double_angle=3,
        log_message_ratio=7,
        log_default_scale=15,
        ephemeral_secret_weight=sparse_weight,
    )


FAST_N14 = fast_parameters_literal(14)
FAST_N15 = fast_parameters_literal(15)
