"""Limb-sharded flagship step with EXPLICIT collectives: bit-identical to
the unsharded int32 step AND a pinned collective budget, at num_p in
{1, 2, 3} (alpha = num_p hybrid-KS digits, ring/basis_extension.go:381-502)
and with batched operands.

VERDICT r3 task 7 + r4 next #6: the mul+relin+rescale composite runs under
shard_map over the limb axis of the 8-device CPU mesh; the compiled HLO
must contain at most 1 all-gather (hybrid-KS decompose) + rescale_limbs
broadcasts (masked psum per dropped limb) and nothing else crossing shards
— for EVERY alpha (the alpha-limb digit ModUp is shard-local by
construction)."""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from matrix_fhe_tpu.fast import fckks
from matrix_fhe_tpu.parallel import fast_sharded


def _mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.array(jax.devices()[:8]), ("limb",))


@pytest.fixture(scope="module", params=[
    pytest.param(1, marks=pytest.mark.slow),
    2,          # alpha=2: real multi-limb hybrid digits + uneven tail —
    #             the most general schedule; 1 and 3 add no new collective
    #             structure and run in the slow suite
    pytest.param(3, marks=pytest.mark.slow)])
def setup(request):
    mesh = _mesh()
    num_p = request.param
    ctx, (c0, c1, d0, d1) = fckks.make_synthetic_context(
        5, 8, num_p, rescale_limbs=2 if num_p == 1 else 1)
    fn, in_sh = fast_sharded.build_sharded_step(ctx, mesh)
    args = [jax.device_put(v, in_sh) for v in (c0, c1, d0, d1)]
    return ctx, fn, args, (c0, c1, d0, d1)


def test_bit_identical_to_unsharded(setup):
    ctx, fn, args, raw = setup
    o0, o1 = fn(*args)
    w0, w1 = fckks.mul_relin_rescale(ctx, *raw)
    live = w0.shape[-2]
    np.testing.assert_array_equal(np.asarray(o0)[:live], np.asarray(w0))
    np.testing.assert_array_equal(np.asarray(o1)[:live], np.asarray(w1))
    # dropped limbs zeroed
    assert not np.asarray(o0)[live:].any()


def test_collective_budget(setup):
    ctx, fn, args, raw = setup
    hlo = fn.lower(*args).compile().as_text()
    ag = len(re.findall(r"all-gather(?:-start)?\(", hlo))
    ar = len(re.findall(r"all-reduce(?:-start)?\(", hlo))
    cp = len(re.findall(r"collective-permute(?:-start)?\(", hlo))
    a2a = len(re.findall(r"all-to-all(?:-start)?\(", hlo))
    # 1 decompose all-gather + <= rescale_limbs psum broadcasts; XLA may
    # lower a psum as all-reduce; nothing else may cross shards
    assert ag <= 1, f"{ag} all-gathers (expected 1: hybrid-KS decompose)"
    assert ar <= ctx.rescale_limbs, f"{ar} all-reduces (rescale broadcasts)"
    assert cp == 0 and a2a == 0, (cp, a2a)
    assert ag + ar >= 1  # the collectives are real, not optimized away


def test_batched_operands():
    """[B, L, N] operands vmap over the leading axis, same numerics."""
    mesh = _mesh()
    ctx, (c0, c1, d0, d1) = fckks.make_synthetic_context(
        5, 8, 2, rescale_limbs=1)
    fn, in_sh = fast_sharded.build_sharded_step(ctx, mesh)
    B = 3
    rng = np.random.default_rng(0)

    def batch(v):
        reps = jnp.stack([jnp.asarray(
            np.ascontiguousarray(np.roll(np.asarray(v), b, axis=-1)))
            for b in range(B)])
        return reps

    bc0, bc1, bd0, bd1 = (batch(v) for v in (c0, c1, d0, d1))
    o0, o1 = fn(bc0, bc1, bd0, bd1)
    for b in range(B):
        w0, w1 = fckks.mul_relin_rescale(ctx, bc0[b], bc1[b], bd0[b], bd1[b])
        live = w0.shape[-2]
        np.testing.assert_array_equal(np.asarray(o0)[b, :live],
                                      np.asarray(w0))
        np.testing.assert_array_equal(np.asarray(o1)[b, :live],
                                      np.asarray(w1))
