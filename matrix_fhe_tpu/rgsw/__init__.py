"""RGSW ciphertexts and external products (counterpart of /root/reference/core/rgsw/)."""

from matrix_fhe_tpu.rgsw.rgsw import (  # noqa: F401
    RGSWCiphertext, encrypt, encrypt_plaintext, external_product,
)
