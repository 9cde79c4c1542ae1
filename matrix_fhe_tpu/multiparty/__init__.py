"""Multiparty (threshold) HE protocols (counterpart of /root/reference/multiparty/)."""

from matrix_fhe_tpu.multiparty.protocols import (  # noqa: F401
    PublicKeyGen, EvaluationKeyGen, GaloisKeyGen, RelinKeyGen,
    KeySwitch, PublicKeySwitch, sample_crp_qp, sample_crp_q,
)
from matrix_fhe_tpu.multiparty.threshold import (  # noqa: F401
    Thresholdizer, Combiner,
)
