"""Host-side utilities: number theory, arbitrary-precision helpers, PRNG keys.

TPU-native counterpart of the reference's ``utils/`` layer
(/root/reference/utils): everything here runs on the host (pure Python /
numpy / mpmath) and produces constants consumed by device kernels.
"""

from matrix_fhe_tpu.utils import primes  # noqa: F401
