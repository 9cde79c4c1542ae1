"""CKKS: approximate homomorphic arithmetic over C^{N/2} (or R^N for the
conjugate-invariant ring).

Counterpart of /root/reference/schemes/ckks.
"""

from matrix_fhe_tpu.schemes.ckks.params import CKKSParametersLiteral, CKKSParameters, new_parameters  # noqa: F401
from matrix_fhe_tpu.schemes.ckks.encoder import Encoder  # noqa: F401
from matrix_fhe_tpu.schemes.ckks.evaluator import Evaluator  # noqa: F401
from matrix_fhe_tpu.schemes.ckks.precision import precision_stats  # noqa: F401
