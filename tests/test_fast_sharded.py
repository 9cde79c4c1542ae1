"""Limb-sharded fast-path ct-mult on a virtual device mesh.

RNS limbs are the FHE tensor-parallel axis (SURVEY.md §2.8): elementwise ops
and per-limb NTTs are communication-free; decompose/ModDown/rescale cross
limbs and XLA inserts the collectives.  The sharded step must be
bit-identical to the single-device result.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from matrix_fhe_tpu.fast import fckks
from matrix_fhe_tpu.parallel.api import make_mesh


@pytest.fixture(scope="module")
def setup():
    # logn=8 keeps the mxu fallback path (v2 kernel needs logN >= 14)
    ctx, cts = fckks.make_synthetic_context(8, 8, 2, num_rot=2)
    return ctx, cts


@pytest.mark.parametrize("nshards", [2, 4])
def test_sharded_ct_mult_matches(setup, nshards):
    ctx, (c0, c1, d0, d1) = setup
    if len(jax.devices()) < nshards:
        pytest.skip("not enough virtual devices")
    step = jax.jit(lambda *a: fckks.mul_relin_rescale(ctx, *a))
    want = step(c0, c1, d0, d1)

    mesh = make_mesh({"limb": nshards})
    spec = NamedSharding(mesh, P("limb", None))
    args = [jax.device_put(v, spec) for v in (c0, c1, d0, d1)]
    got = step(*args)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_sharded_rotation_matches(setup):
    ctx, (c0, c1, _, _) = setup
    if len(jax.devices()) < 2:
        pytest.skip("not enough virtual devices")
    g = ctx.gal_els[0]
    step = jax.jit(lambda a0, a1: fckks.automorphism(ctx, a0, a1, g))
    want = step(c0, c1)

    mesh = make_mesh({"limb": 2})
    spec = NamedSharding(mesh, P("limb", None))
    got = step(jax.device_put(c0, spec), jax.device_put(c1, spec))
    for gg, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(gg), np.asarray(w))
