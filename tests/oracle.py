"""Bit-exact pure-Python oracle for the reference's scalar kernels.

Transcribes the *algorithms* of /root/reference/ring (modular_reduction.go,
ntt.go, ntt_3n.go) into Python big-int arithmetic with explicit 64-bit
wrapping, so device kernels can be asserted bit-identical to the Go reference
without running Go.  Test-only code; the framework never imports this.
"""

from __future__ import annotations

M64 = (1 << 64) - 1


def mul64(a: int, b: int) -> tuple[int, int]:
    p = a * b
    return (p >> 64) & M64, p & M64


def gen_mred_constant(q: int) -> int:
    # GenMRedConstant, ring/modular_reduction.go:68-75 (verbatim recurrence).
    m, qq = 1, q
    for _ in range(63):
        m = (m * qq) & M64
        qq = (qq * qq) & M64
    return m


def gen_bred_constant(q: int) -> tuple[int, int]:
    r = (1 << 128) // q
    return (r >> 64) & M64, r & M64


def mred(x: int, y: int, q: int, qinv: int) -> int:
    mhi, mlo = mul64(x, y)
    hhi, _ = mul64((mlo * qinv) & M64, q)
    r = (mhi - hhi + q) & M64
    return r - q if r >= q else r


def mred_lazy(x: int, y: int, q: int, qinv: int) -> int:
    mhi, mlo = mul64(x, y)
    hhi, _ = mul64((mlo * qinv) & M64, q)
    return (mhi - hhi + q) & M64


def bred(x: int, y: int, q: int, bc: tuple[int, int]) -> int:
    mhi, mlo = mul64(x, y)
    r = (mhi * bc[0]) & M64
    hhi, hlo = mul64(mlo, bc[0])
    r = (r + hhi) & M64
    lhi, _ = mul64(mlo, bc[1])
    s0 = (hlo + lhi) & M64
    r = (r + (1 if s0 < hlo else 0)) & M64
    hhi2, hlo2 = mul64(mhi, bc[1])
    r = (r + hhi2) & M64
    t = (hlo2 + s0) & M64
    r = (r + (1 if t < hlo2 else 0)) & M64
    r = (mlo - r * q) & M64
    return r - q if r >= q else r


def bred_add(a: int, q: int, bc: tuple[int, int]) -> int:
    mhi, _ = mul64(a, bc[0])
    r = (a - mhi * q) & M64
    return r - q if r >= q else r


def mform(a: int, q: int, bc: tuple[int, int]) -> int:
    mhi, _ = mul64(a, bc[1])
    r = (-(((a * bc[0]) & M64) + mhi) * q) & M64
    return r - q if r >= q else r


def imform(a: int, q: int, qinv: int) -> int:
    r, _ = mul64((a * qinv) & M64, q)
    r = q - r
    return r - q if r >= q else r


# ---------------------------------------------------------------------------
# NTT loops (ring/ntt.go:223-257 forward, :555-606 backward), with the exact
# lazy-reduction windows and final reductions of the Go code.
# ---------------------------------------------------------------------------

def _butterfly(u, v, psi, two_q, four_q, q, qinv):
    if u >= four_q:
        u -= four_q
    v = mred_lazy(v, psi, q, qinv)
    return (u + v) & M64, (u + two_q - v) & M64


def _inv_butterfly(u, v, psi, two_q, four_q, q, qinv):
    x = u + v
    if x >= two_q:
        x -= two_q
    y = mred_lazy((u + four_q - v) & M64, psi, q, qinv)
    return x, y


def ntt_standard(p1: list[int], q: int, qinv: int, bc, roots: list[int]) -> list[int]:
    n = len(p1)
    p2 = list(p1)
    four_q, two_q = 4 * q, 2 * q
    t = n >> 1
    f = roots[1]
    for jx in range(t):
        p2[jx], p2[jx + t] = _butterfly(p1[jx], p1[jx + t], f, two_q, four_q, q, qinv)
    m = 2
    while m < n:
        t >>= 1
        for i in range(m):
            j1 = (i * t) << 1
            f = roots[m + i]
            for jx in range(j1, j1 + t):
                p2[jx], p2[jx + t] = _butterfly(p2[jx], p2[jx + t], f, two_q, four_q, q, qinv)
        m <<= 1
    return [bred_add(x, q, bc) for x in p2]


def intt_standard(p1: list[int], q: int, qinv: int, ninv: int, roots: list[int]) -> list[int]:
    n = len(p1)
    p2 = list(p1)
    four_q, two_q = 4 * q, 2 * q
    t, h = 1, n >> 1
    for i in range(h):
        j = 2 * i
        p2[j], p2[j + 1] = _inv_butterfly(p1[j], p1[j + 1], roots[h + i], two_q, four_q, q, qinv)
    t <<= 1
    m = n >> 1
    while m > 1:
        h = m >> 1
        j1 = 0
        for i in range(h):
            f = roots[h + i]
            for jx in range(j1, j1 + t):
                p2[jx], p2[jx + t] = _inv_butterfly(p2[jx], p2[jx + t], f, two_q, four_q, q, qinv)
            j1 += t << 1
        t <<= 1
        m >>= 1
    return [mred(x, ninv, q, qinv) for x in p2]


# ---------------------------------------------------------------------------
# Conjugate-invariant NTT loops (ring/ntt.go:754-786 fwd, :1104-1156 bwd).
# ---------------------------------------------------------------------------

def ntt_ci(p1: list[int], q: int, qinv: int, bc, roots: list[int]) -> list[int]:
    n = len(p1)
    p2 = [0] * n
    four_q, two_q = 4 * q, 2 * q
    f = roots[1]
    jy = n - 1
    for jx in range(1, n >> 1):
        p2[jx] = (p1[jx] + two_q - mred_lazy(p1[jy], f, q, qinv)) & M64
        p2[jy] = (p1[jy] + two_q - mred_lazy(p1[jx], f, q, qinv)) & M64
        jy -= 1
    p2[n >> 1] = (p1[n >> 1] + two_q - mred_lazy(p1[n >> 1], f, q, qinv)) & M64
    p2[0] = p1[0]
    t = n
    m = 2
    while m < 2 * n:
        t >>= 1
        h = m >> 1
        j1 = 0
        for i in range(h):
            f = roots[m + i]
            for jx in range(j1, j1 + t):
                p2[jx], p2[jx + t] = _butterfly(p2[jx], p2[jx + t], f, two_q, four_q, q, qinv)
            j1 += 2 * t
        m <<= 1
    return [bred_add(x, q, bc) for x in p2]


def intt_ci(p1: list[int], q: int, qinv: int, ninv: int, roots: list[int]) -> list[int]:
    n = len(p1)
    p2 = list(p1)
    four_q, two_q = 4 * q, 2 * q
    t, h = 1, n >> 1
    j1 = 0
    for i in range(h):
        f = roots[n + i]
        p2[j1], p2[j1 + 1] = _inv_butterfly(p1[j1], p1[j1 + 1], f, two_q, four_q, q, qinv)
        j1 += 2
    t = 2
    m = n >> 1
    while m > 1:
        j1 = 0
        h = m >> 1
        for i in range(h):
            f = roots[m + i]
            for jx in range(j1, j1 + t):
                p2[jx], p2[jx + t] = _inv_butterfly(p2[jx], p2[jx + t], f, two_q, four_q, q, qinv)
            j1 += t << 1
        t <<= 1
        m >>= 1
    f = roots[1]
    jy = n - 1
    for jx in range(1, n >> 1):
        a, b = p2[jx], p2[jy]
        p2[jx] = (a + two_q - mred_lazy(b, f, q, qinv)) & M64
        p2[jy] = (b + two_q - mred_lazy(a, f, q, qinv)) & M64
        jy -= 1
    p2[n >> 1] = (p2[n >> 1] + two_q - mred_lazy(p2[n >> 1], f, q, qinv)) & M64
    x0 = p2[0] << 1
    p2[0] = x0 - q if x0 >= q else x0
    return [mred(x, ninv, q, qinv) for x in p2]


# ---------------------------------------------------------------------------
# 3N-ring reference semantics (ring/ntt_3n.go:82-151): forward = Horner
# evaluation at x_k = omega^{E[k]}, E = sorted totatives of 3N.
# ---------------------------------------------------------------------------

def ntt_3n_forward(p1: list[int], q: int, omega: int) -> list[int]:
    import math

    n = len(p1)
    three_n = 3 * n
    E = [e for e in range(1, three_n) if math.gcd(e, three_n) == 1]
    out = []
    for e in E:
        xk = pow(omega, e, q)
        acc = 0
        for j in range(n - 1, -1, -1):
            acc = (acc * xk + p1[j]) % q
        out.append(acc)
    return out


def negacyclic_mul(a: list[int], b: list[int], q: int) -> list[int]:
    """Schoolbook multiplication in Z_q[X]/(X^N + 1)."""
    n = len(a)
    out = [0] * n
    for i in range(n):
        for j in range(n):
            k = i + j
            if k < n:
                out[k] = (out[k] + a[i] * b[j]) % q
            else:
                out[k - n] = (out[k - n] - a[i] * b[j]) % q
    return out


def matrix_ring_mul(a: list[int], b: list[int], q: int) -> list[int]:
    """Schoolbook multiplication in Z_q[X]/(X^N - X^{N/2} + 1)."""
    n = len(a)
    prod = [0] * (2 * n)
    for i in range(n):
        for j in range(n):
            prod[i + j] = (prod[i + j] + a[i] * b[j]) % q
    # Reduce: X^N = X^{N/2} - 1.
    for k in range(2 * n - 1, n - 1, -1):
        c = prod[k]
        if c:
            prod[k] = 0
            prod[k - n // 2] = (prod[k - n // 2] + c) % q
            prod[k - n] = (prod[k - n] - c) % q
    return prod[:n]
