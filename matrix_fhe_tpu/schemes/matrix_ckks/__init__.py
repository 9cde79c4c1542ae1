"""Matrix-CKKS: CKKS-like fixed-point arithmetic over the 3N ring
Z_q[X]/(X^N - X^{N/2} + 1) (the fork's new scheme).

Counterpart of /root/reference/schemes/matrix_ckks.
"""

from matrix_fhe_tpu.schemes.matrix_ckks.scheme import (  # noqa: F401
    MatrixCKKSParametersLiteral, new_parameters, Encoder, Evaluator,
    example_parameters,
)
