"""Ring packing: Expand (coefficient extraction) and Pack (coefficient
repacking) via automorphism trees.

Counterpart of /root/reference/core/rlwe/ring_packing.go:

  * ``expand`` (:475-622): ct encrypting sum c_i X^i -> one ciphertext per
    (gap-strided) index i encrypting c_i in the constant coefficient, by
    logN rounds of even/odd splitting with phi_{N/n+1} and X^{-2^i}.
  * ``pack`` (:623-795): the inverse — a map of ciphertexts each holding
    values in strided coefficients is merged into one, by the tree
    a + X^t b + phi(a - X^t b).
  * ``gen_x_pow2_ntt`` (:796-834): MForm NTT monomials X^{+-2^i}.

Standard (power-of-two) rings only, like the reference.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from matrix_fhe_tpu.rlwe import evaluator as rlwe_eval
from matrix_fhe_tpu.rlwe.elements import Ciphertext
from matrix_fhe_tpu.rlwe.params import Parameters


def gen_x_pow2_ntt(params: Parameters, div: bool) -> list[jnp.ndarray]:
    """X^{2^i} (or X^{-2^i} if div) for 0 <= i < logN, NTT + MForm."""
    rq = params.ring_q
    n = params.n
    out = []
    for i in range(params.log_n):
        k = (2 * n - (1 << i)) % (2 * n) if div else (1 << i)
        arr = np.zeros((len(params.q), n), dtype=np.uint64)
        idx, sign = k % n, (k // n) & 1
        for j, q in enumerate(params.q):
            arr[j, idx] = q - 1 if sign else 1
        out.append(rq.mform(rq.ntt(jnp.asarray(arr))))
    return out


def galois_elements_for_expand(params: Parameters) -> list[int]:
    """ring_packing_keys.go:143-153."""
    return [params.nth_root // (2 << i) + 1 for i in range(params.log_n)]


def galois_elements_for_pack(params: Parameters, log_gap: int) -> list[int]:
    """ring_packing_keys.go:156-180."""
    els = [params.galois_element(1 << i) for i in range(log_gap)]
    if log_gap == params.log_n:
        els.append(params.nth_root - 1)
    return els


def _mul_scalar_big(rq, v, c: int):
    sc = jnp.array([(c % q) * (1 << 64) % q for q in rq.moduli_tuple],
                   dtype=jnp.uint64)
    return rq.mul_scalar_montgomery(v, sc)


def expand(params: Parameters, ct: Ciphertext, log_gap: int,
           gks, x_inv_pow2=None,
           num_stages: int | None = None) -> dict[int, Ciphertext]:
    """Expand (ring_packing.go:475-622): NTT-domain degree-1 input.

    ``num_stages`` < log_n stops the extraction tree early: the result is
    2^num_stages ciphertexts where ct_j (times X^{-j}) carries the
    coefficients with index ≡ j mod 2^num_stages and zeros elsewhere — the
    inverse of a 2^num_stages-way coefficient interleave (the unpack step
    of the packed batch bootstrap, evaluator.go:1003-1065)."""
    if params.ring_type != "standard":
        raise ValueError("expand requires the standard ring")
    level = ct.level
    rq = params.ring_q.at_level(level)
    log_n = params.log_n
    if num_stages is None:
        num_stages = log_n
    if x_inv_pow2 is None:
        x_inv_pow2 = gen_x_pow2_ntt(params, div=True)

    n_inv = pow(1 << num_stages, -1, rq.modulus_at_level(level))
    base = ct.with_value(tuple(_mul_scalar_big(rq, v, n_inv) for v in ct.value))

    cts: dict[int, Ciphertext] = {0: base}
    gap = 1 << log_gap
    for i in range(num_stages):
        n = 1 << i
        gal_el = params.n // n + 1
        for j in range(0, n, gap):
            c0 = cts[j]
            tmp = rlwe_eval.automorphism(params, c0, gks[gal_el])
            if j + n // gap > 0:
                c1_vals = tuple(rq.sub(a, b) for a, b in zip(c0.value, tmp.value))
                xp = x_inv_pow2[i][:level + 1]
                c1_vals = tuple(rq.mul_coeffs_montgomery(v, xp) for v in c1_vals)
                cts[j + n] = c0.with_value(c1_vals)
            cts[j] = c0.with_value(tuple(rq.add(a, b)
                                         for a, b in zip(c0.value, tmp.value)))
    return {k: v for k, v in cts.items() if k % gap == 0}


def pack(params: Parameters, cts: dict[int, Ciphertext], input_log_gap: int,
         zero_garbage_slots: bool, gks, x_pow2=None) -> Ciphertext:
    """Pack (ring_packing.go:623-795): NTT-domain degree-1 inputs."""
    if params.ring_type != "standard":
        raise ValueError("pack requires the standard ring")
    if not cts:
        raise ValueError("no ciphertexts to pack")
    keys = sorted(cts.keys())
    log_n = params.log_n
    level = cts[keys[0]].level
    rq = params.ring_q.at_level(level)
    if x_pow2 is None:
        x_pow2 = gen_x_pow2_ntt(params, div=False)

    if len(keys) > 1:
        gap = np.gcd.reduce(np.array(keys[1:], dtype=np.int64)) if keys[0] == 0 \
            else np.gcd.reduce(np.array(keys, dtype=np.int64))
        gap = int(gap)
        log_gap = gap.bit_length() - 1
        if gap != 1 << log_gap:
            raise ValueError("ciphertext indices must have power-of-two gaps")
    else:
        gap, log_gap = params.n, log_n

    log_start = log_n - input_log_gap
    log_end = log_n
    if not zero_garbage_slots and gap > 0:
        log_end -= log_gap
    if log_start >= log_end:
        raise ValueError("gap between ciphertexts smaller than input gap")

    n_inv = pow(1 << (log_end - log_start), -1, rq.modulus_at_level(level))
    work: dict[int, Ciphertext | None] = {
        k: v.with_value(tuple(_mul_scalar_big(rq, x, n_inv) for x in v.value))
        for k, v in cts.items()}

    for i in range(log_start, log_end):
        t = 1 << (log_n - 1 - i)
        xp = x_pow2[log_n - i - 1][:level + 1]
        gal_el = params.nth_root - 1 if i == 0 else params.galois_element(1 << (i - 1))
        for jx in range(t):
            jy = jx + t
            a = work.get(jx)
            b = work.get(jy)
            if b is not None:
                b = b.with_value(tuple(rq.mul_coeffs_montgomery(v, xp)
                                       for v in b.value))
                if a is not None:
                    tmpa = a.with_value(tuple(rq.sub(x, y) for x, y in
                                              zip(a.value, b.value)))
                    a = a.with_value(tuple(rq.add(x, y) for x, y in
                                           zip(a.value, b.value)))
                    tmpa = rlwe_eval.automorphism(params, tmpa, gks[gal_el])
                    work[jx] = a.with_value(tuple(rq.add(x, y) for x, y in
                                                  zip(a.value, tmpa.value)))
                else:
                    # b*X^t - phi(b*X^t)
                    tmpa = rlwe_eval.automorphism(params, b, gks[gal_el])
                    work[jx] = b.with_value(tuple(rq.sub(x, y) for x, y in
                                                  zip(b.value, tmpa.value)))
                work[jy] = None
            elif a is not None:
                tmpa = rlwe_eval.automorphism(params, a, gks[gal_el])
                work[jx] = a.with_value(tuple(rq.add(x, y) for x, y in
                                              zip(a.value, tmpa.value)))
    return work[0]


# ---------------------------------------------------------------------------
# Cross-degree ring packing (ring_packing.go:74-430 RingPackingEvaluator).
# ---------------------------------------------------------------------------

class RingPackingEvaluator:
    """Extract/Split/Merge/Repack across ring degrees N_min..N_max
    (core/rlwe/ring_packing.go:74-430).

    Holds one parameter set per log-degree (identical moduli chains), a
    fresh secret per degree, the adjacent-degree ring-switching keys
    (evk_down[ln]: sk_ln -> embed(sk_{ln-1}); evk_up[ln]: embed(sk_{ln-1})
    -> sk_ln, both living in the degree-2^ln ring) and the Galois keys the
    same-degree expand/pack trees need at the minimum degree.

    ``split`` maps ctN[X] = even[Y] + X*odd[Y] (Y = X^2) to two degree-N/2
    ciphertexts; ``merge`` is its inverse; ``extract``/``repack`` compose
    them with the same-degree trees exactly like the reference (naive
    variants skip the zeroing trees)."""

    def __init__(self, key, make_params, log_n_min: int, log_n_max: int):
        """``make_params(log_n) -> Parameters`` must produce sets sharing
        one moduli chain (the caller's parameter family)."""
        import jax

        from matrix_fhe_tpu.rlwe import keys as K, ring_switch as rs

        self.log_n_min = log_n_min
        self.log_n_max = log_n_max
        self.params = {ln: make_params(ln)
                       for ln in range(log_n_min, log_n_max + 1)}
        keys_iter = iter(jax.random.split(key, 4 * (log_n_max - log_n_min + 2)))
        self.sk = {ln: K.gen_secret_key(next(keys_iter), p)
                   for ln, p in self.params.items()}
        self.evk_up = {}
        self.evk_down = {}
        for ln in range(log_n_min + 1, log_n_max + 1):
            pl, ps = self.params[ln], self.params[ln - 1]
            emb = rs.embed_secret_key(ps, pl, self.sk[ln - 1])
            self.evk_down[ln] = K.gen_evaluation_key(
                next(keys_iter), pl, self.sk[ln].value.q, emb)
            self.evk_up[ln] = K.gen_evaluation_key(
                next(keys_iter), pl, emb.value.q, self.sk[ln])
        # same-degree tree keys at the minimum degree
        pmin = self.params[log_n_min]
        els = set(galois_elements_for_expand(pmin))
        els |= set(galois_elements_for_pack(pmin, pmin.log_n))
        self.gks_min = K.gen_galois_keys(next(keys_iter), pmin,
                                         self.sk[log_n_min], sorted(els))
        self.x_pow2 = {ln: gen_x_pow2_ntt(p, div=False)
                       for ln, p in self.params.items()}
        self.x_inv_pow2 = {ln: gen_x_pow2_ntt(p, div=True)
                           for ln, p in self.params.items()}

    # -- degree changes ------------------------------------------------------
    def split(self, ct: Ciphertext, log_n: int
              ) -> tuple[Ciphertext, Ciphertext]:
        """ctN[X] = even[Y] + X odd[Y], NTT-domain degree-1 input
        (ring_packing.go:191-247)."""
        from matrix_fhe_tpu.rlwe import ring_switch as rs

        pl, ps = self.params[log_n], self.params[log_n - 1]
        rq = pl.ring_q.at_level(ct.level)
        tmp = rlwe_eval.apply_evaluation_key(pl, ct, self.evk_down[log_n])

        def down(c):
            vals = tuple(ps.ring_q.at_level(c.level).ntt(
                rs.map_large_to_small_coeff(2, rq.intt(v))) for v in c.value)
            return c.with_value(vals)

        even = down(tmp)
        xinv = self.x_inv_pow2[log_n][0][:ct.level + 1]
        odd = down(tmp.with_value(tuple(
            rq.mul_coeffs_montgomery(v, xinv) for v in tmp.value)))
        return even, odd

    def merge(self, even: Ciphertext | None, odd: Ciphertext | None,
              log_n: int) -> Ciphertext:
        """Inverse of split: (even, odd) at degree 2^{log_n-1} -> degree
        2^{log_n} (ring_packing.go:395-430)."""
        from matrix_fhe_tpu.rlwe import ring_switch as rs

        pl = self.params[log_n]
        ref = even if even is not None else odd
        rq = pl.ring_q.at_level(ref.level)

        def up(c):
            return tuple(rs.map_small_to_large_ntt(2, v) for v in c.value)

        acc = None
        if even is not None:
            acc = up(even)
        if odd is not None:
            x1 = self.x_pow2[log_n][0][:ref.level + 1]
            o = tuple(rq.mul_coeffs_montgomery(v, x1) for v in up(odd))
            acc = o if acc is None else tuple(rq.add(a, b)
                                              for a, b in zip(acc, o))
        lifted = ref.with_value(acc)
        return rlwe_eval.apply_evaluation_key(pl, lifted, self.evk_up[log_n])

    # -- extract / repack ----------------------------------------------------
    def extract(self, ct: Ciphertext, idx, naive: bool = False
                ) -> dict[int, Ciphertext]:
        """ct encrypting sum c_i X^i at degree N_max -> {i: ct_i} at degree
        N_min with c_i in the constant slot (ring_packing.go:74-190); the
        naive form skips zeroing the other coefficients (compose with
        repack)."""
        log_max, log_min = self.log_n_max, self.log_n_min
        factor_bits = log_max - log_min
        n_factor = 1 << factor_bits
        keys = sorted(idx)
        gap = keys[1] - keys[0] if len(keys) > 1 else self.params[log_max].n
        log_gap = max(0, int(gap).bit_length() - 1)

        tmp = {0: ct}
        for i in range(factor_bits):
            t = 1 << i
            log_gap = max(0, log_gap - 1)
            for j in list(tmp.keys()):
                even, odd = self.split(tmp[j], log_max - i)
                tmp[j] = even
                tmp[j + t] = odd

        buckets: dict[int, list[int]] = {}
        for i in keys:
            buckets.setdefault(i & (n_factor - 1), []).append(i // n_factor)

        pmin = self.params[log_min]
        rq = pmin.ring_q.at_level(ct.level)
        out: dict[int, Ciphertext] = {}
        for b, sub in buckets.items():
            if naive:
                small = {}
                for j in sub:
                    c = tmp[b]
                    for i in range(pmin.log_n):
                        if (j >> i) & 1:
                            xinv = self.x_inv_pow2[log_min][i][:ct.level + 1]
                            c = c.with_value(tuple(
                                rq.mul_coeffs_montgomery(v, xinv)
                                for v in c.value))
                    small[j] = c
            else:
                small = expand(pmin, tmp[b], log_gap, self.gks_min,
                               self.x_inv_pow2[log_min])
            for j in sub:
                out[b + j * n_factor] = small[j]
        return out

    def repack(self, cts: dict[int, Ciphertext],
               naive: bool = False) -> Ciphertext:
        """{i: ct_i} at degree N_min (values in the constant slot) -> one
        degree-N_max ciphertext encrypting sum ct_i[0] X^i
        (ring_packing.go:262-392)."""
        log_max, log_min = self.log_n_max, self.log_n_min
        factor_bits = log_max - log_min
        n_factor = 1 << factor_bits
        keys = sorted(cts)
        level = cts[keys[0]].level
        pmin = self.params[log_min]
        rq = pmin.ring_q.at_level(level)

        small: list[dict[int, Ciphertext]] = [dict() for _ in range(n_factor)]
        for i in keys:
            small[i & (n_factor - 1)][i // n_factor] = cts[i]

        large: dict[int, Ciphertext | None] = {}
        for b in range(n_factor):
            if not small[b]:
                large[b] = None
                continue
            if naive:
                work = dict(small[b])
                for i in range(pmin.log_n):
                    t = 1 << (pmin.log_n - 1 - i)
                    for jx in range(t):
                        jy = jx + t
                        a, bb = work.get(jx), work.get(jy)
                        if bb is not None:
                            xp = self.x_pow2[log_min][pmin.log_n - 1 - i]
                            bb = bb.with_value(tuple(
                                rq.mul_coeffs_montgomery(v, xp[:level + 1])
                                for v in bb.value))
                            work[jx] = bb if a is None else a.with_value(
                                tuple(rq.add(x, y) for x, y in
                                      zip(a.value, bb.value)))
                            work[jy] = None
                large[b] = work[0]
            else:
                large[b] = pack(pmin, small[b], pmin.log_n, True,
                                self.gks_min, self.x_pow2[log_min])

        for i in range(factor_bits - 1, -1, -1):
            t = 1 << i
            for j in range(t):
                a, bb = large.get(j), large.get(j + t)
                if a is not None or bb is not None:
                    large[j] = self.merge(a, bb, log_max - i)
                    large[j + t] = None
        return large[0]
