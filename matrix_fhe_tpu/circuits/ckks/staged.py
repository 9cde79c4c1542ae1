"""Per-stage-jitted bootstrap driver: one compiled XLA graph per pipeline
stage instead of one whole-pipeline graph or ~50k eager dispatches.

Why this exists (and why it is library code, not a probe script): the full
bootstrap pipeline traced as ONE jit graph is the fastest steady-state form,
but its compile payload scales with the BSGS diagonal count of the C2S/S2C
matrices — at logN=14 it exceeds the remote-compile upload limit of the
TPU tunnel, and on CPU the monolithic compile takes tens of minutes.  The
staged form compiles ~a-dozen graphs (head, one per DFT matrix, EvalMod,
one per S2C matrix), each well inside those limits, and still runs the
steady-state bootstrap in a dozen device launches.  This is the form the
committed BOOT_r05.json throughput artifact measures, and the form the
default test suite exercises unconditionally (tests/test_wboot.py).

Counterpart of the reference's monolithic Go pipeline
(circuits/ckks/bootstrapping/evaluator.go:548-588) — the staging split is
a TPU/XLA compilation-model concern with no Go analogue.
"""

from __future__ import annotations

from fractions import Fraction

import jax

from matrix_fhe_tpu.circuits.ckks import dft
from matrix_fhe_tpu.rlwe.elements import Ciphertext


def jit_ciphertext_fn(ev, params, fn, n_out: int = 1):
    """Jit a Ciphertext-tuple function at the array level.

    The evaluator's big device-resident state (per-level contexts with all
    keys, converted lintrans diagonals, evaluation-key pairs) is threaded as
    jit ARGUMENTS — closure-captured arrays would be inlined into the HLO as
    constants, and the resulting compile payloads (100s of MB of keys)
    exceed the remote-compile upload limit.  The evaluator's caches are
    temporarily pointed at the traced pytrees during tracing; cache entries
    created *during* tracing (lower-level context views, converted
    diagonals) are re-derived inside the graph, which XLA constant-folds
    per compile.

    Works for any evaluator exposing the fast/wide cache triple
    (``_ctx_cache``/``_wlt_cache``/``_evk_cache``); missing caches are
    simply not threaded.  Metadata (level/scale/degree) is recorded at
    trace time per input-signature, so one wrapped function serves every
    (level, scale, ntt-form, degree) signature it meets.
    """
    names = [n for n in ("_ctx_cache", "_wlt_cache", "_evk_cache")
             if hasattr(ev, n)]
    cache: dict = {}

    def state():
        out = []
        for n in names:
            c = getattr(ev, n)
            out.append({params.max_level: c[params.max_level]}
                       if n == "_ctx_cache" else dict(c))
        return tuple(out)

    def wrapped(*cts):
        key = tuple((c.level, c.scale, c.metadata.is_ntt, len(c.value))
                    for c in cts)
        st = state()
        if key not in cache:
            metas = [c.metadata for c in cts]
            degs = [len(c.value) for c in cts]
            holder: dict = {}

            def raw(st, *flat):
                saved = [getattr(ev, n) for n in names]
                for n, v in zip(names, st):
                    setattr(ev, n, v)
                try:
                    ins = []
                    i = 0
                    for m, d in zip(metas, degs):
                        ins.append(Ciphertext(value=tuple(flat[i:i + d]),
                                              metadata=m))
                        i += d
                    outs = fn(*ins)
                    if n_out == 1:
                        outs = (outs,)
                    holder["meta"] = [None if o is None else o.metadata
                                      for o in outs]
                    holder["deg"] = [0 if o is None else len(o.value)
                                     for o in outs]
                    return tuple(v for o in outs if o is not None
                                 for v in o.value)
                finally:
                    for n, v in zip(names, saved):
                        setattr(ev, n, v)

            cache[key] = (jax.jit(raw), holder)
        f, holder = cache[key]
        res = f(st, *[v for c in cts for v in c.value])
        outs = []
        i = 0
        for m, d in zip(holder["meta"], holder["deg"]):
            outs.append(None if m is None else
                        Ciphertext(value=tuple(res[i:i + d]), metadata=m))
            i += d
        return outs[0] if n_out == 1 else tuple(outs)

    return wrapped


class StagedBootstrapper:
    """Wrap a ``bootstrapping.Evaluator`` (u64, fast-int32 or wide) into a
    per-stage-jitted pipeline.  ``__call__`` is semantically identical to
    ``bts.bootstrap`` (same math, same metadata) but runs as ~a-dozen
    compiled launches; ``on_stage`` (if set) is called with each stage name
    as it completes, for first-compile progress reporting."""

    def __init__(self, bts):
        self.bts = bts
        self.on_stage = None
        ev, params = bts.ev, bts.p.params
        lit = bts.c2s_matrix.literal
        self._repack = (lit.format == dft.REPACK_IMAG_AS_REAL
                        and lit.log_slots < params.log_n - 1)

        def head(ct):
            ct = bts.scale_down(ct)
            if bts.evk_dense_to_sparse is not None:
                ct = ev.apply_evaluation_key(ct, bts.evk_dense_to_sparse)
            return bts.mod_up(ct)

        def c2s_tail(zv):
            # the tail of dft.coeffs_to_slots after the matrix chain:
            # split conj/real parts (+ optional imag-repack rotation)
            ct_real = ev.conjugate(zv)
            ct_imag = ev.mul_const_complex(ev.sub(zv, ct_real), -1j,
                                           scale=Fraction(1))
            ct_real = ev.add(ct_real, zv)
            if self._repack:
                ct_imag = ev.rotate(ct_imag, 1 << lit.log_slots)
                return ev.add(ct_real, ct_imag), ct_real  # second unused
            return ct_real, ct_imag

        def s2c_head(ct_real, ct_imag):
            return ev.add(ev.mul_const_complex(ct_imag, 1j,
                                               scale=Fraction(1)), ct_real)

        jit_ct = lambda fn, n_out=1: jit_ciphertext_fn(ev, params, fn, n_out)
        self._head = jit_ct(head)
        self._c2s = [jit_ct(lambda c, m=m: ev.rescale(
            ev.evaluate_lintrans(c, m))) for m in bts.c2s_matrix.matrices]
        self._c2s_tail = jit_ct(c2s_tail, n_out=2)
        self._evalmod = jit_ct(lambda c: bts.eval_mod(c))
        self._s2c_head = jit_ct(s2c_head)
        self._s2c = [jit_ct(lambda c, m=m: ev.rescale(
            ev.evaluate_lintrans(c, m))) for m in bts.s2c_matrix.matrices]
        # __call__ returns the last run_stages yield — requires the S2C
        # chain to be non-empty (true for every Parameters the literal
        # constructors can produce: d_s2c >= 1)
        assert self._s2c, "S2C matrix chain is empty"

    def _tick(self, name):
        if self.on_stage is not None:
            self.on_stage(name)

    def run_stages(self, ct: Ciphertext):
        """Generator form of ``__call__``: yields ``(stage_name, ct)`` after
        each stage — the debugging hook for localizing a cross-backend
        divergence (decrypt each intermediate against a reference run)."""
        ct = self._head(ct)
        yield "head", ct
        for i, s in enumerate(self._c2s):
            ct = s(ct)
            yield f"c2s[{i}]", ct
        ct_real, ct_imag = self._c2s_tail(ct)
        yield "c2s_tail", ct_real
        if self._repack:
            ct = self._evalmod(ct_real)
            yield "evalmod", ct
        else:
            ct_real = self._evalmod(ct_real)
            ct_imag = self._evalmod(ct_imag)
            yield "evalmod2", ct_imag
            ct = self._s2c_head(ct_real, ct_imag)
        for i, s in enumerate(self._s2c):
            ct = s(ct)
            yield f"s2c[{i}]", ct

    def __call__(self, ct: Ciphertext) -> Ciphertext:
        for name, ct in self.run_stages(ct):
            self._tick(name)
        return ct
