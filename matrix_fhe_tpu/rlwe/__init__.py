"""L2 RLWE core: parameters, keys, encryption, key-switching evaluators.

TPU-native counterpart of /root/reference/core/rlwe.  All evaluator state is
functional: parameters and keys are pytrees; every operation is a pure
function usable under jax.jit / vmap / shard_map.
"""

from matrix_fhe_tpu.rlwe.params import (  # noqa: F401
    Parameters, ParametersLiteral, Parameters3NLiteral, new_parameters,
    new_parameters_3n, GALOIS_GEN,
)
from matrix_fhe_tpu.rlwe.elements import Ciphertext, Plaintext, MetaData  # noqa: F401
from matrix_fhe_tpu.rlwe.keys import (  # noqa: F401
    SecretKey, PublicKey, EvaluationKey, GaloisKey, RelinearizationKey,
    gen_secret_key, gen_public_key, gen_evaluation_key, gen_relinearization_key,
    gen_galois_key, gen_galois_keys,
)
from matrix_fhe_tpu.rlwe import encryptor, decryptor, evaluator  # noqa: F401
