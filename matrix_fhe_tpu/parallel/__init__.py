"""Multi-chip parallelism: mesh construction and sharded execution.

The FHE analogue of tensor/data parallelism (SURVEY.md section 2.8):

  * **limb axis (L)** — the RNS direction is embarrassingly parallel for
    NTT, vector ops and sampling; rescale / ModUp / ModDown are the only
    cross-limb ops (they become broadcasts/gathers along the limb axis).
    This is the "tensor parallel" axis.
  * **batch axis (B)** — independent ciphertexts; pure data parallelism.
  * **coefficient axis (N)** — pod-scale NTT with butterfly stages exchanged
    via collectives (phase 2).

Sharding is expressed with ``jax.sharding.NamedSharding`` annotations and
GSPMD propagation (the XLA-native mechanism) rather than hand-written
per-device programs.
"""

from matrix_fhe_tpu.parallel.api import (  # noqa: F401
    make_mesh, shard_ciphertext_batch, limb_sharding, batch_sharding,
)
