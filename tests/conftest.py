"""Test configuration: force CPU with 8 virtual devices (sharding tests run on
a virtual mesh, mirroring the reference's in-process multiparty testing
pattern, SURVEY.md section 4.5).

The environment's axon sitecustomize registers the remote-TPU backend and
overwrites ``jax_platforms`` at interpreter start, so setting the env var is
not enough — we re-force the config after importing jax.  Set
``MATRIX_FHE_TEST_TPU=1`` to run the suite against the real TPU instead.
"""

import os

if not os.environ.get("MATRIX_FHE_TEST_TPU"):
    # Strip the remote-TPU plugin registration before xdist workers spawn:
    # CPU test processes do not need it, and its presence in a long-lived
    # process is implicated in late-process XLA crashes.
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

if not os.environ.get("MATRIX_FHE_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

import matrix_fhe_tpu  # noqa: E402,F401  (enables x64 before any jnp use)

assert os.environ.get("MATRIX_FHE_TEST_TPU") or jax.devices()[0].platform == "cpu", (
    f"tests must run on CPU, got {jax.devices()}")


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running end-to-end tests")


def pytest_collection_modifyitems(config, items):
    """Skip ``slow``-marked tests unless MATRIX_FHE_RUN_SLOW=1: the default
    suite must stay under ~10 minutes (VERDICT r3 weak #6); the heavy
    end-to-end runs are still exercised by setting the env var."""
    import pytest as _pytest
    if os.environ.get("MATRIX_FHE_RUN_SLOW"):
        return
    skip = _pytest.mark.skip(reason="slow test (set MATRIX_FHE_RUN_SLOW=1)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
