"""Test configuration: force CPU with 8 virtual devices (sharding tests run on
a virtual mesh, mirroring the reference's in-process multiparty testing
pattern, SURVEY.md section 4.5)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the session env pins "axon" (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import matrix_fhe_tpu  # noqa: E402,F401  (enables x64 before any jnp use)
