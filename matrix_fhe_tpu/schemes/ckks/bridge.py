"""Domain switcher: standard CKKS <-> conjugate-invariant CKKS.

Counterpart of /root/reference/schemes/ckks/bridge.go and
ring/conjugate_invariant.go: the standard ring Z[X]/(X^N+1) (complex
vectors, N/2 slots) and the conjugate-invariant ring Z[X+X^-1] of degree
N/2 (real vectors, N/2 slots) exchange ciphertexts through a key switch to
the "folded" key followed by an NTT-domain fold/unfold:

  * complex_to_real: ct_std -> ct_ci with ct_ci = fold(ks(ct_std)),
    fold(p)[j] = p[j] + p[conj_idx[j]] for j < N/2; output scale doubles.
  * real_to_complex: unfold (mirror the N/2 CI NTT slots into conjugate
    pairs) then key-switch to the standard key.

Keys via gen_ring_swap_keys_ci (keygenerator.go:207-228
GenEvaluationKeysForRingSwapNew).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from matrix_fhe_tpu.ops import automorphism as am
from matrix_fhe_tpu.rlwe import evaluator as rlwe_eval, keys as K
from matrix_fhe_tpu.rlwe.elements import Ciphertext
from matrix_fhe_tpu.rlwe.params import Parameters


def _fold_idx(params_std: Parameters):
    """NTT permutation of the conjugation X -> X^{2N-1} on the std ring."""
    return jnp.asarray(am.automorphism_ntt_index(
        params_std.n, params_std.nth_root, params_std.nth_root - 1))


def fold_std_to_ci(params_std: Parameters, rq_std, p: jnp.ndarray) -> jnp.ndarray:
    """FoldStandardToConjugateInvariant (ring/conjugate_invariant.go:27-45):
    NTT domain, [., L, N] -> [., L, N/2]."""
    idx = _fold_idx(params_std)
    half = params_std.n // 2
    conj = p[..., idx]
    return rq_std.add(p[..., :half], conj[..., :half])


def unfold_ci_to_std(params_std: Parameters, p: jnp.ndarray) -> jnp.ndarray:
    """UnfoldConjugateInvariantToStandard (:7-23): NTT domain,
    [., L, N/2] -> [., L, N] (mirror the conjugate pairs)."""
    return jnp.concatenate([p, p[..., ::-1]], axis=-1)


def gen_ring_swap_keys_ci(key: jax.Array, params_std: Parameters,
                          sk_std: K.SecretKey, sk_ci: K.SecretKey):
    """(std_to_ci, ci_to_std) evaluation keys, both in the standard ring
    (keygenerator.go:207-228)."""
    rq, rp = params_std.ring_q, params_std.ring_p
    mapped_q = unfold_ci_to_std(params_std, sk_ci.value.q)
    mapped_p = None
    if rp is not None:
        small = rq.intt(rq.imform(mapped_q))
        lifted = K.extend_basis_small_norm(params_std.q[0], rp.moduli, small[0])
        mapped_p = rp.mform(rp.ntt(lifted))
    sk_mapped = K.SecretKey(value=K.QPPoly(q=mapped_q, p=mapped_p))
    k1, k2 = jax.random.split(key)
    std_to_ci = K.gen_evaluation_key(k1, params_std, sk_std.value.q, sk_mapped)
    ci_to_std = K.gen_evaluation_key(k2, params_std, sk_mapped.value.q, sk_std)
    return std_to_ci, ci_to_std


def complex_to_real(params_std: Parameters, ct: Ciphertext,
                    std_to_ci: K.EvaluationKey) -> Ciphertext:
    """bridge.go:57-90: returns the CI-ring ciphertext (half degree), with
    doubled scale (real part extraction)."""
    level = ct.level
    rq = params_std.ring_q.at_level(level)
    d0, d1 = rlwe_eval.gadget_product(params_std, level, ct.value[1],
                                      std_to_ci.gadget)
    d0 = rq.add(d0, ct.value[0])
    out0 = fold_std_to_ci(params_std, rq, d0)
    out1 = fold_std_to_ci(params_std, rq, d1)
    return ct.with_value((out0, out1)).with_metadata(scale=ct.scale * 2)


def real_to_complex(params_std: Parameters, ct: Ciphertext,
                    ci_to_std: K.EvaluationKey) -> Ciphertext:
    """bridge.go:92-130: CI-ring ciphertext -> standard ring."""
    level = ct.level
    rq = params_std.ring_q.at_level(level)
    c0 = unfold_ci_to_std(params_std, ct.value[0])
    c1 = unfold_ci_to_std(params_std, ct.value[1])
    d0, d1 = rlwe_eval.gadget_product(params_std, level, c1, ci_to_std.gadget)
    return ct.with_value((rq.add(c0, d0), d1))
