"""Keys and key generation.

Counterpart of /root/reference/core/rlwe/keys.go and keygenerator.go:

  * SecretKey: ternary/Gaussian secret in NTT + Montgomery form over (Q, P)
    (keygenerator.go:61-73).
  * PublicKey: (b, a) = (-a s + e, a), NTT + Montgomery (keygenerator.go:82).
  * EvaluationKey skIn -> skOut: gadget ciphertext with rows
    evk[i] = (-a_i s_out + w_i P skIn + e_i, a_i) where w_i selects RNS digit
    i (gadgetciphertext.go:169-242 AddPolyTimesGadgetVectorToGadgetCiphertext).
  * RelinearizationKey: evk for skIn = s^2 (keygenerator.go:116-120).
  * GaloisKey: evk for skIn = s(X^{galEl}) — NTT-domain automorphism of s
    (keygenerator.go:140-174).

A gadget ciphertext is stored densely: q-part uint64[digits, 2, LQ, N] and
p-part uint64[digits, 2, LP, N] (base-two decomposition unsupported for
multi-P keys, as in the reference's main path).
"""

from __future__ import annotations

import collections
import dataclasses
import functools

import jax
import jax.numpy as jnp

from matrix_fhe_tpu.ops import automorphism as am
from matrix_fhe_tpu.ops import modmath as mm
from matrix_fhe_tpu.ops import samplers as smp
from matrix_fhe_tpu.rlwe.params import Parameters


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=["q", "p"], meta_fields=[])
@dataclasses.dataclass(frozen=True)
class QPPoly:
    """A polynomial over the extended basis (Q, P) (ring/ringqp/poly.go:17)."""
    q: jnp.ndarray          # uint64[LQ, N]
    p: jnp.ndarray | None   # uint64[LP, N] or None when P is empty


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=["value"], meta_fields=[])
@dataclasses.dataclass(frozen=True)
class SecretKey:
    value: QPPoly  # NTT + Montgomery form


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=["value"], meta_fields=[])
@dataclasses.dataclass(frozen=True)
class PublicKey:
    value: tuple[QPPoly, QPPoly]  # (b, a), NTT + Montgomery form


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=["q", "p"], meta_fields=["base_two"])
@dataclasses.dataclass(frozen=True)
class GadgetCiphertext:
    """core/rlwe/gadgetciphertext.go:19: dense digit-major storage.
    q: [digits, 2, LQ, N]; p: [digits, 2, LP, N] (NTT + Montgomery form).

    ``base_two`` > 0 selects the single-P/bit-decomposition gadget
    (keys.go:298 EvaluationKeyParameters.BaseTwoDecomposition): rows are
    (RNS limb i)-major x (base-2^B digit j), j < ceil(log2 q_i / B), and the
    p part holds at most ONE auxiliary prime (or none)."""
    q: jnp.ndarray
    p: jnp.ndarray | None
    base_two: int = 0

    @property
    def num_digits(self) -> int:
        return int(self.q.shape[0])

    @property
    def level_p(self) -> int:
        return -1 if self.p is None else int(self.p.shape[-2]) - 1


@dataclasses.dataclass(frozen=True)
class EvaluationKeyParameters:
    """core/rlwe/keys.go:293-298 EvaluationKeyParameters: per-key auxiliary
    level and base-2^B decomposition.  ``base_two_decomposition`` > 0 is only
    meaningful with level_p <= 0 (the reference collapses the base-2 count to
    1 when LevelP > 0, params.go:615-633)."""
    level_p: int | None = None           # -1 = no auxiliary primes
    base_two_decomposition: int = 0


def base_two_counts(moduli, base_two: int) -> list[int]:
    """BaseTwoDecompositionVectorSize (params.go:615-633): digits per limb."""
    return [(int(q).bit_length() + base_two - 1) // base_two for q in moduli]


def _key_params_view(params: Parameters, level_p: int) -> Parameters:
    """Parameters with the auxiliary basis truncated to P[:level_p+1]
    (level_p = -1 drops P entirely) — the key's (Q, P') basis."""
    if level_p == params.max_level_p:
        return params
    return Parameters(n=params.n, nth_root=params.nth_root, q=params.q,
                      p=params.p[: level_p + 1], xe=params.xe, xs=params.xs,
                      ring_type=params.ring_type, ntt_flag=params.ntt_flag,
                      default_scale=params.default_scale)


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=["gadget"], meta_fields=[])
@dataclasses.dataclass(frozen=True)
class EvaluationKey:
    gadget: GadgetCiphertext


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=["gadget"], meta_fields=["gal_el"])
@dataclasses.dataclass(frozen=True)
class GaloisKey:
    gadget: GadgetCiphertext
    gal_el: int


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=["gadget"], meta_fields=[])
@dataclasses.dataclass(frozen=True)
class RelinearizationKey:
    gadget: GadgetCiphertext


# ---------------------------------------------------------------------------
# Small-norm basis extension (core/rlwe/ringqp ExtendBasisSmallNormAndCenter):
# lift a small centered polynomial known mod q0 to additional moduli.
# ---------------------------------------------------------------------------

def extend_basis_small_norm(src_q0: int, dst_moduli: jnp.ndarray,
                            coeffs_q0: jnp.ndarray) -> jnp.ndarray:
    """coeffs_q0: [N] values mod q0 of a small centered poly; returns
    [LDst, N] its value mod each dst modulus (sign-extended)."""
    q_half = src_q0 >> 1
    neg = coeffs_q0 > jnp.uint64(q_half)
    mag = jnp.where(neg, jnp.uint64(src_q0) - coeffs_q0, coeffs_q0)
    dst = dst_moduli[:, None]
    return jnp.where(neg[None, :], dst - mag[None, :], mag[None, :])


def _to_qp_small(params: Parameters, small: jnp.ndarray) -> QPPoly:
    """Lift a small centered coeff-domain poly [LQ, N] (consistent limbs) to
    (Q, P), then NTT + MForm both parts."""
    rq, rp = params.ring_q, params.ring_p
    pq = rq.mform(rq.ntt(small))
    pp = None
    if rp is not None:
        lifted = extend_basis_small_norm(params.q[0], rp.moduli, small[0])
        pp = rp.mform(rp.ntt(lifted))
    return QPPoly(q=pq, p=pp)


# ---------------------------------------------------------------------------
# Key generation (pure functions of a PRNG key).
# ---------------------------------------------------------------------------

def gen_secret_key(key: jax.Array, params: Parameters) -> SecretKey:
    """keygenerator.go:61-73: sample Xs, extend to P, NTT + MForm."""
    small = smp.sample(key, params.ring_q, params.xs)  # [LQ, N] coeff domain
    return SecretKey(value=_to_qp_small(params, small))


def encrypt_zero_qp(key: jax.Array, params: Parameters, sk: SecretKey,
                    c1: QPPoly | None = None) -> tuple[QPPoly, QPPoly]:
    """(b, a) = (-a s + e, a) over (Q, P), NTT + Montgomery
    (core/rlwe/encryptor.go:429-460 encryptZeroSkFromC1QP)."""
    rq, rp = params.ring_q, params.ring_p
    k_a, k_e = jax.random.split(key)
    if c1 is None:
        kq, kp = jax.random.split(k_a)
        c1 = QPPoly(q=smp.uniform_poly(kq, rq),
                    p=None if rp is None else smp.uniform_poly(kp, rp))
    e = smp.sample(k_e, rq, params.xe)  # small, coeff domain, [LQ, N]
    c0q = rq.mform(rq.ntt(e))
    c0q = rq.sub(c0q, rq.mul_coeffs_montgomery(c1.q, sk.value.q))
    c0p = None
    if rp is not None:
        ep = extend_basis_small_norm(params.q[0], rp.moduli, e[0])
        c0p = rp.mform(rp.ntt(ep))
        c0p = rp.sub(c0p, rp.mul_coeffs_montgomery(c1.p, sk.value.p))
    return QPPoly(q=c0q, p=c0p), c1


def gen_public_key(key: jax.Array, params: Parameters, sk: SecretKey) -> PublicKey:
    return PublicKey(value=encrypt_zero_qp(key, params, sk))


def _add_poly_times_gadget(params: Parameters, pt_q: jnp.ndarray,
                           gct_q: jnp.ndarray) -> jnp.ndarray:
    """AddPolyTimesGadgetVectorToGadgetCiphertext (gadgetciphertext.go:169):
    adds P * pt * (RNS digit selector w_i) to row i, component 0.
    pt_q: [LQ, N] NTT(+MForm) domain; gct_q: [digits, 2, LQ, N]."""
    rq = params.ring_q
    big_p = params.big_p()
    scaled = rq.mul_scalar_montgomery(
        pt_q, jnp.array([(big_p << 64) % q for q in params.q], dtype=jnp.uint64))
    digits = gct_q.shape[0]
    alpha = len(params.p) if params.p else 1
    rows = []
    for i in range(digits):
        start, end = i * alpha, min((i + 1) * alpha, len(params.q))
        mask = jnp.zeros((len(params.q), 1), dtype=jnp.uint64)
        mask = mask.at[start:end].set(1)
        row0 = mm.cred(gct_q[i, 0] + scaled * mask, rq.moduli[:, None])
        rows.append(jnp.stack([row0, gct_q[i, 1]]))
    return jnp.stack(rows)


def _gen_evaluation_key_arrays(key: jax.Array, params: Parameters,
                               sk_in_q: jnp.ndarray, sk_out: SecretKey):
    """Traced body of genEvaluationKey: returns the gadget arrays (gq, gp)."""
    alpha = max(len(params.p), 1)
    digits = -(-len(params.q) // alpha)
    rows_q, rows_p = [], []
    for i in range(digits):
        key, sub = jax.random.split(key)
        (c0, c1) = encrypt_zero_qp(sub, params, sk_out)
        rows_q.append(jnp.stack([c0.q, c1.q]))
        if params.ring_p is not None:
            rows_p.append(jnp.stack([c0.p, c1.p]))
    gq = jnp.stack(rows_q)  # [digits, 2, LQ, N]
    gq = _add_poly_times_gadget(params, sk_in_q, gq)
    gp = jnp.stack(rows_p) if rows_p else None
    return gq, gp


# One compiled kernel per parameter set: every relin/galois/evk generation
# shares the same shapes, so eager per-op dispatch (the dominant cost of
# generating dozens of bootstrapping galois keys) collapses into one cached
# XLA executable.  Keyed by the parameter fingerprint (incl. the noise/secret
# distributions: the jitted body samples via params.xe/xs, so two parameter
# sets differing only in distributions must not share an executable — ADVICE
# r3, medium), params closed over.  Bounded LRU: each entry pins a compiled
# executable for the process lifetime otherwise (ADVICE r3, low).
_EVK_JIT_CACHE: collections.OrderedDict = collections.OrderedDict()
_EVK_JIT_CACHE_MAX = 32


def _gen_evaluation_key_arrays_b2(key: jax.Array, kp: Parameters,
                                  sk_in_q: jnp.ndarray, sk_out: SecretKey,
                                  base_two: int):
    """Single-P/bit-decomposition gadget rows (gadgetciphertext.go:172-249
    with BaseTwoDecomposition > 0): row (i, j) encrypts
    P' * 2^{jB} * skIn * w_i, ragged-flattened (RNS limb i)-major with
    j < ceil(log2 q_i / B)."""
    rq = kp.ring_q
    big_p = kp.big_p()
    counts = base_two_counts(kp.q, base_two)
    rows_q, rows_p = [], []
    for i, qi in enumerate(kp.q):
        for j in range(counts[i]):
            key, sub = jax.random.split(key)
            c0, c1 = encrypt_zero_qp(sub, kp, sk_out)
            # MForm(P' * 2^{jB}) on limb i only
            s = (big_p << (j * base_two)) % qi
            sc = jnp.zeros((len(kp.q),), dtype=jnp.uint64)
            sc = sc.at[i].set((s << 64) % qi)
            scaled = rq.mul_scalar_montgomery(sk_in_q, sc)
            row0 = mm.cred(c0.q + scaled, rq.moduli[:, None])
            rows_q.append(jnp.stack([row0, c1.q]))
            if kp.ring_p is not None:
                rows_p.append(jnp.stack([c0.p, c1.p]))
    gq = jnp.stack(rows_q)
    gp = jnp.stack(rows_p) if rows_p else None
    return gq, gp


def gen_evaluation_key(key: jax.Array, params: Parameters, sk_in_q: jnp.ndarray,
                       sk_out: SecretKey,
                       evk_params: EvaluationKeyParameters | None = None
                       ) -> EvaluationKey:
    """genEvaluationKey (keygenerator.go:276-316): gadget rows are zero
    encryptions under sk_out plus P * skIn * digit-selectors.

    sk_in_q: [LQ, N] the input key mod Q, NTT + Montgomery form.
    ``evk_params`` selects the single-P/bit-decomposition gadget
    (keys.go:293-298); default is the multiple-P RNS-digit gadget.
    """
    if evk_params is not None and (
            evk_params.base_two_decomposition > 0
            or (evk_params.level_p is not None
                and evk_params.level_p != params.max_level_p)):
        lp = params.max_level_p if evk_params.level_p is None \
            else evk_params.level_p
        b2 = evk_params.base_two_decomposition
        if b2 > 0 and lp > 0:
            raise ValueError("base-2^B decomposition requires level_p <= 0 "
                             "(core/rlwe/params.go:615-633)")
        kp = _key_params_view(params, lp)
        sk_kp = sk_out if lp == params.max_level_p else SecretKey(
            value=QPPoly(q=sk_out.value.q,
                         p=None if lp < 0 else sk_out.value.p[: lp + 1]))
        if b2 > 0:
            gq, gp = _gen_evaluation_key_arrays_b2(key, kp, sk_in_q, sk_kp, b2)
            return EvaluationKey(gadget=GadgetCiphertext(q=gq, p=gp,
                                                         base_two=b2))
        gq, gp = _gen_evaluation_key_arrays(key, kp, sk_in_q, sk_kp)
        return EvaluationKey(gadget=GadgetCiphertext(q=gq, p=gp))

    has_p = params.ring_p is not None
    ck = (params.n, tuple(params.q), tuple(params.p or ()), params.ring_type,
          params.xe, params.xs)
    fn = _EVK_JIT_CACHE.get(ck)
    if fn is not None:
        _EVK_JIT_CACHE.move_to_end(ck)
    if fn is None:
        if has_p:
            def fn(k, s_in, so_q, so_p):
                return _gen_evaluation_key_arrays(
                    k, params, s_in, SecretKey(value=QPPoly(q=so_q, p=so_p)))
        else:
            def fn(k, s_in, so_q):
                return _gen_evaluation_key_arrays(
                    k, params, s_in,
                    SecretKey(value=QPPoly(q=so_q, p=None)))[0]
        fn = jax.jit(fn)
        _EVK_JIT_CACHE[ck] = fn
        while len(_EVK_JIT_CACHE) > _EVK_JIT_CACHE_MAX:
            _EVK_JIT_CACHE.popitem(last=False)
    if has_p:
        gq, gp = fn(key, sk_in_q, sk_out.value.q, sk_out.value.p)
    else:
        gq, gp = fn(key, sk_in_q, sk_out.value.q), None
    return EvaluationKey(gadget=GadgetCiphertext(q=gq, p=gp))


def gen_relinearization_key(key: jax.Array, params: Parameters,
                            sk: SecretKey,
                            evk_params: EvaluationKeyParameters | None = None
                            ) -> RelinearizationKey:
    """keygenerator.go:116-120: evk for s^2 -> s."""
    rq = params.ring_q
    sk2 = rq.mul_coeffs_montgomery(sk.value.q, sk.value.q)  # MForm(s^2)
    evk = gen_evaluation_key(key, params, sk2, sk, evk_params)
    return RelinearizationKey(gadget=evk.gadget)


def gen_galois_key(key: jax.Array, params: Parameters, sk: SecretKey,
                   gal_el: int,
                   evk_params: EvaluationKeyParameters | None = None
                   ) -> GaloisKey:
    """keygenerator.go:139-174: gk encrypts [-a pi_{k^-1}(sk) + w P sk, a] —
    the gadget re-encrypts from sk to pi_{k^-1}(sk); the evaluator then applies
    pi_k to the result (evaluator_automorphism.go:45-52)."""
    gal_inv = params.mod_inv_galois_element(gal_el)
    if params.ring_type == "matrix":
        idx = am.automorphism_ntt_index_3n(params.n, params.nth_root, gal_inv)
    else:
        idx = am.automorphism_ntt_index(params.n, params.nth_root, gal_inv)
    import jax.numpy as _jnp
    iidx = _jnp.asarray(idx)
    sk_out = SecretKey(value=QPPoly(
        q=sk.value.q[..., iidx],
        p=None if sk.value.p is None else sk.value.p[..., iidx]))
    evk = gen_evaluation_key(key, params, sk.value.q, sk_out, evk_params)
    return GaloisKey(gadget=evk.gadget, gal_el=gal_el)


def gen_galois_keys(key: jax.Array, params: Parameters, sk: SecretKey,
                    gal_els) -> dict[int, GaloisKey]:
    out = {}
    for g in gal_els:
        key, sub = jax.random.split(key)
        out[g] = gen_galois_key(sub, params, sk, g)
    return out
