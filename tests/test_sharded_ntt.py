"""Coefficient-sharded four-step NTT on a virtual device mesh.

The multi-chip analogue of sequence-parallel attention (SURVEY.md section
2.8): column blocks sharded over the mesh, one reduce-scatter per transform.
Runs on the 8 virtual CPU devices from conftest.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from matrix_fhe_tpu.ops import rings
from matrix_fhe_tpu.parallel import ntt_sharded as sh
from matrix_fhe_tpu.parallel.api import make_mesh
from matrix_fhe_tpu.utils import primes as pr


@pytest.fixture(scope="module")
def tabs_ring():
    n, limbs = 1 << 10, 3
    g = pr.NTTFriendlyPrimesGenerator(45, 2 * n)
    moduli = g.next_alternating_primes(limbs)
    return sh.build_tables(n, moduli), rings.new_ring(n, moduli, rings.STANDARD)


def test_reference_four_step_bit_exact(tabs_ring):
    tabs, ring = tabs_ring
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 1 << 44, (2, 3, tabs.n), dtype=np.uint64))
    got = sh.ntt_reference(x, tabs)
    want = ring.ntt(x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize(
    "nshards",
    # one canonical config in the default suite (8 = the full virtual
    # mesh, the most general communication pattern); the smaller-mesh
    # sweeps add ~4 min of u64-on-CPU compile time for no extra coverage
    [pytest.param(2, marks=pytest.mark.slow),
     pytest.param(4, marks=pytest.mark.slow), 8])
def test_sharded_matches_unsharded(tabs_ring, nshards):
    tabs, ring = tabs_ring
    if len(jax.devices()) < nshards:
        pytest.skip("not enough virtual devices")
    mesh = make_mesh({"seq": nshards})
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.integers(0, 1 << 44, (2, 3, tabs.n), dtype=np.uint64))
    got = sh.ntt_sharded(x, tabs, mesh, axis="seq")
    want = ring.ntt(x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
