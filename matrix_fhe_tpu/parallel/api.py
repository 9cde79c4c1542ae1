"""Mesh + sharding helpers for batched homomorphic evaluation."""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axes: dict[str, int] | None = None, devices=None) -> Mesh:
    """Mesh over the available devices.  Default: 1-D "batch" axis (pure data
    parallelism over ciphertexts); pass e.g. {"batch": 2, "limb": 4} for a 2-D
    mesh sharding both the ciphertext batch and the RNS limb axis."""
    devices = jax.devices() if devices is None else devices
    if axes is None:
        axes = {"batch": len(devices)}
    names = tuple(axes)
    shape = tuple(axes.values())
    arr = np.array(devices[: int(np.prod(shape))]).reshape(shape)
    return Mesh(arr, names)


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) axis; replicate the rest."""
    return NamedSharding(mesh, P("batch", *([None] * (ndim - 1))))


def limb_sharding(mesh: Mesh, ndim: int, limb_axis: int = -2) -> NamedSharding:
    """Shard the RNS limb axis (second-to-last by convention: [..., L, N])."""
    spec = [None] * ndim
    spec[limb_axis % ndim] = "limb"
    if "batch" in mesh.axis_names and ndim >= 3:
        spec[0] = "batch"
    return NamedSharding(mesh, P(*spec))


def shard_ciphertext_batch(mesh: Mesh, ct_values: tuple, limbs: bool = False):
    """Place a batch of ciphertext component arrays [B, L, N] on the mesh."""
    shardings = [(limb_sharding(mesh, v.ndim) if limbs and "limb" in mesh.axis_names
                  else batch_sharding(mesh, v.ndim)) for v in ct_values]
    return tuple(jax.device_put(v, s) for v, s in zip(ct_values, shardings))
