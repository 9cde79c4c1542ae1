"""Precision statistics harness.

Counterpart of /root/reference/schemes/ckks/precision.go:80-106
(GetPrecisionStats / VerifyTestVectors): log2 precision of decrypted vs
expected vectors.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np


@dataclasses.dataclass
class PrecisionStats:
    min_precision: float
    avg_precision: float
    max_err: float
    avg_err: float

    def __str__(self) -> str:
        return (f"min prec {self.min_precision:.2f} bits, "
                f"avg prec {self.avg_precision:.2f} bits, "
                f"max err {self.max_err:.3e}")


def precision_stats(want, have) -> PrecisionStats:
    want = np.asarray(want, dtype=np.complex128)
    have = np.asarray(have, dtype=np.complex128)[: len(want)]
    err = np.abs(want - have)
    err = np.maximum(err, 1e-300)
    prec = -np.log2(err)
    return PrecisionStats(
        min_precision=float(prec.min()),
        avg_precision=float(prec.mean()),
        max_err=float(err.max()),
        avg_err=float(err.mean()),
    )


def assert_precision(want, have, min_bits: float = 10.0) -> PrecisionStats:
    st = precision_stats(want, have)
    if st.min_precision < min_bits:
        raise AssertionError(f"precision too low: {st} (need {min_bits} bits)")
    return st
