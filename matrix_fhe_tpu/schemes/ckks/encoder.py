"""CKKS encoder: canonical embedding <-> RNS polynomials.

Counterpart of /root/reference/schemes/ckks/encoder.go and
ckks_vector_ops.go.  The special (I)FFT uses the 5^j rotation-group index so
slot j holds the evaluation at the primitive 2N-th root zeta^{5^j}, giving the
standard CKKS slot semantics (rotations = slot shifts, conjugation = complex
conjugate).  Host-side float64 (PREC64 mode); the arbitrary-precision PREC128
variant (encoder.go:325 embedArbitrary) is deferred.

Layout (full slots): real parts -> coefficients [0, N/2), imaginary parts ->
[N/2, N) (schemes/ckks/utils.go:128-147), then forward NTT.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from fractions import Fraction

from matrix_fhe_tpu.ops import modmath as mm
from matrix_fhe_tpu.ops import rings as rg
from matrix_fhe_tpu.rlwe.elements import MetaData, Plaintext
from matrix_fhe_tpu.schemes.ckks.params import CKKSParameters


class Encoder:
    def __init__(self, params: CKKSParameters):
        self.params = params
        m = params.nth_root
        self.m = m
        n_group = m >> 2
        rot = np.empty(n_group, dtype=np.int64)
        five = 1
        for i in range(n_group):
            rot[i] = five
            five = (five * 5) & (m - 1)
        self.rot_group = rot
        self.roots = np.exp(2j * np.pi * np.arange(m + 1) / m)

    # -- special FFTs (ckks_vector_ops.go:18-77) ---------------------------
    def special_ifft(self, values: np.ndarray) -> np.ndarray:
        v = values.astype(np.complex128).copy()
        n = len(v)
        logn = (n - 1).bit_length()
        logm = (self.m - 1).bit_length()
        for loglen in range(logn, 0, -1):
            ln = 1 << loglen
            lenh, lenq = ln >> 1, ln << 2
            log_gap = logm - 2 - loglen
            mask = lenq - 1
            idx = (lenq - (self.rot_group[:lenh] & mask)) << log_gap
            w = self.roots[idx]
            blocks = v.reshape(-1, ln)
            a, b = blocks[:, :lenh], blocks[:, lenh:]
            blocks[:, :lenh], blocks[:, lenh:] = a + b, (a - b) * w[None, :]
        v /= n
        return v[_bit_reverse_perm(n)]

    def special_fft(self, values: np.ndarray) -> np.ndarray:
        v = values.astype(np.complex128)[_bit_reverse_perm(len(values))]
        n = len(v)
        logn = (n - 1).bit_length()
        logm = (self.m - 1).bit_length()
        for loglen in range(1, logn + 1):
            ln = 1 << loglen
            lenh, lenq = ln >> 1, ln << 2
            log_gap = logm - 2 - loglen
            mask = lenq - 1
            w = self.roots[(self.rot_group[:lenh] & mask) << log_gap]
            blocks = v.reshape(-1, ln)
            a, b = blocks[:, :lenh], blocks[:, lenh:] * w[None, :]
            blocks[:, :lenh], blocks[:, lenh:] = a + b, a - b
        return v

    # -- arbitrary-precision special IFFT (PREC128 mode) --------------------
    # embedArbitrary (encoder.go:325): same butterfly schedule as
    # special_ifft but in Decimal arithmetic, for log scales beyond the 53
    # bits float64 can carry.

    def _special_ifft_arbitrary(self, values, digits: int):
        from decimal import Decimal, localcontext
        from matrix_fhe_tpu.utils import bignum as bn
        with localcontext() as ctx:
            ctx.prec = digits
            m = self.m
            pi2 = 2 * bn.pi(digits)
            roots = [(bn.cos(pi2 * k / m, digits), bn.sin(pi2 * k / m, digits))
                     for k in range(m + 1)]
            vr = [Decimal(complex(v).real) for v in values]
            vi = [Decimal(complex(v).imag) for v in values]
            n = len(vr)
            logn = (n - 1).bit_length()
            logm = (m - 1).bit_length()
            for loglen in range(logn, 0, -1):
                ln = 1 << loglen
                lenh, lenq = ln >> 1, ln << 2
                log_gap = logm - 2 - loglen
                mask = lenq - 1
                for blk in range(0, n, ln):
                    for j in range(lenh):
                        idx = (lenq - (int(self.rot_group[j]) & mask)) << log_gap
                        wr, wi = roots[idx]
                        a_r, a_i = vr[blk + j], vi[blk + j]
                        b_r, b_i = vr[blk + j + lenh], vi[blk + j + lenh]
                        sr, si = a_r + b_r, a_i + b_i
                        dr, di = a_r - b_r, a_i - b_i
                        vr[blk + j], vi[blk + j] = sr, si
                        vr[blk + j + lenh] = dr * wr - di * wi
                        vi[blk + j + lenh] = dr * wi + di * wr
            ninv = Decimal(1) / n
            vr = [x * ninv for x in vr]
            vi = [x * ninv for x in vi]
            perm = _bit_reverse_perm(n)
            return [vr[p] for p in perm], [vi[p] for p in perm]

    # -- encode / decode ----------------------------------------------------
    def encode(self, values, level: int | None = None, scale=None,
               is_ntt: bool = True) -> Plaintext:
        """Encode -> Embed (encoder.go:141-323), full slots.  Uses the
        float64 fast path (PREC64) for scales <= 2^53 and the Decimal
        arbitrary-precision path (PREC128, embedArbitrary) beyond."""
        params = self.params
        level = params.max_level if level is None else level
        scale = Fraction(params.default_scale if scale is None else scale)
        slots = params.max_slots
        vals = np.zeros(slots, dtype=np.complex128)
        values = np.asarray(values)
        if params.ring_type == rg.CONJUGATE_INVARIANT:
            vals[: len(values)] = np.real(values)
        else:
            vals[: len(values)] = values

        if scale > (1 << 50):
            # PREC128: high-precision embed, exact big-int rounding
            from decimal import Decimal
            digits = max(40, int(np.log10(float(scale))) + 25)
            wr, wi = self._special_ifft_arbitrary(vals, digits)
            sd = Decimal(scale.numerator) / Decimal(scale.denominator)
            if params.ring_type == rg.CONJUGATE_INVARIANT:
                reals_d = wr
            else:
                reals_d = wr + wi
            coeffs = [int((x * sd).to_integral_value(rounding="ROUND_HALF_EVEN"))
                      for x in reals_d]
            moduli = params.q[: level + 1]
            limbs = np.array([[c % q for c in coeffs] for q in moduli],
                             dtype=np.uint64)
            md = MetaData(scale=scale, is_ntt=is_ntt,
                          log_dimensions=(0, params.log_max_slots))
            p = mm.u64(limbs)
            if is_ntt:
                p = params.ring_q.at_level(level).ntt(p)
            return Plaintext(value=p, metadata=md)

        w = self.special_ifft(vals)

        sf = float(scale)
        if params.ring_type == rg.CONJUGATE_INVARIANT:
            reals = np.real(w)
        else:
            reals = np.concatenate([np.real(w), np.imag(w)])
        coeffs = [round(x * sf) for x in reals]  # exact Python rounding
        moduli = params.q[: level + 1]
        limbs = np.array([[c % q for c in coeffs] for q in moduli], dtype=np.uint64)

        md = MetaData(scale=scale, is_ntt=is_ntt,
                      log_dimensions=(0, params.log_max_slots))
        p = mm.u64(limbs)
        if is_ntt:
            p = params.ring_q.at_level(level).ntt(p)
        return Plaintext(value=p, metadata=md)

    def embed_qp(self, values, level_q: int, level_p: int | None = None,
                 scale=None) -> tuple[jnp.ndarray, jnp.ndarray | None]:
        """Embed values into a (Q, P) polynomial in NTT + Montgomery form —
        the plaintext format of linear-transformation diagonals
        (schemes/ckks/encoder.go:193 Embed with ringqp output,
        circuits/common/lintrans/lintrans.go:205 Encode)."""
        params = self.params
        scale = Fraction(params.default_scale if scale is None else scale)
        slots = params.max_slots
        vals = np.zeros(slots, dtype=np.complex128)
        values = np.asarray(values)
        if params.ring_type == rg.CONJUGATE_INVARIANT:
            vals[: len(values)] = np.real(values)
        else:
            vals[: len(values)] = values
        w = self.special_ifft(vals)
        sf = float(scale)
        if params.ring_type == rg.CONJUGATE_INVARIANT:
            reals = np.real(w)
        else:
            reals = np.concatenate([np.real(w), np.imag(w)])
        coeffs = [round(x * sf) for x in reals]

        rq = params.ring_q.at_level(level_q)
        limbs_q = np.array([[c % q for c in coeffs] for q in params.q[:level_q + 1]],
                           dtype=np.uint64)
        ptq = rq.mform(rq.ntt(mm.u64(limbs_q)))
        ptp = None
        if level_p is not None and level_p >= 0 and params.ring_p is not None:
            rp = params.ring_p.at_level(level_p)
            limbs_p = np.array([[c % q for c in coeffs] for q in params.p[:level_p + 1]],
                               dtype=np.uint64)
            ptp = rp.mform(rp.ntt(mm.u64(limbs_p)))
        return ptq, ptp

    def decode(self, pt: Plaintext) -> np.ndarray:
        """Decode (encoder.go:177): INTT, CRT-reconstruct centered big ints,
        divide by scale, special FFT."""
        params = self.params
        level = pt.level
        ring = params.ring_q.at_level(level)
        v = pt.value
        if pt.metadata.is_ntt:
            v = ring.intt(v)
        arr = np.asarray(v)
        coeffs = crt_reconstruct_centered(arr, params.q[: level + 1])
        sf = float(pt.metadata.scale)
        slots = params.max_slots
        if params.ring_type == rg.CONJUGATE_INVARIANT:
            re = np.array([float(c) / sf for c in coeffs[:slots]])
            w = re.astype(np.complex128)
            # [X]/(X^N+1) -> [X+X^-1]/(X^N+1) (encoder.go:940-946)
            w[1:] -= 1j * re[slots - 1:0:-1]
        else:
            re = np.array([float(c) / sf for c in coeffs[:slots]])
            im = np.array([float(c) / sf for c in coeffs[slots: 2 * slots]])
            w = re + 1j * im
        return self.special_fft(w)


def crt_reconstruct_centered(limbs: np.ndarray, moduli: list[int]) -> list[int]:
    """Centered CRT reconstruction (ring/ring.go:503 PolyToBigintCentered)."""
    Q = 1
    for q in moduli:
        Q *= q
    basis = []
    for q in moduli:
        qs = Q // q
        basis.append(qs * pow(qs % q, q - 2, q))
    n = limbs.shape[-1]
    out = []
    half = Q >> 1
    for j in range(n):
        acc = 0
        for i, q in enumerate(moduli):
            acc += int(limbs[i, j]) * basis[i]
        acc %= Q
        out.append(acc - Q if acc > half else acc)
    return out


def _bit_reverse_perm(n: int) -> np.ndarray:
    logn = (n - 1).bit_length()
    idx = np.arange(n)
    out = np.zeros(n, dtype=np.int64)
    for _ in range(logn):
        out = (out << 1) | (idx & 1)
        idx >>= 1
    return out
