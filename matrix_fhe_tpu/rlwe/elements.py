"""Ciphertext / Plaintext elements and metadata.

Counterpart of /root/reference/core/rlwe/element.go, ciphertext.go,
plaintext.go, metadata.go.  An element's polynomial vector is a tuple of
``uint64[L, N]`` arrays; metadata is static (hashable) so elements trace
cleanly through jit.
"""

from __future__ import annotations

import dataclasses
import functools
from fractions import Fraction

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class MetaData:
    """PlaintextMetaData + CiphertextMetaData (core/rlwe/metadata.go:15,107).

    ``scale`` is an exact rational (the reference uses 128-bit big.Float,
    metadata scale arithmetic is exact for the power-of-two and prime scales
    used by the schemes; Fraction is exact for all of them).
    """
    scale: Fraction = Fraction(1)
    log_dimensions: tuple[int, int] = (0, 0)
    is_batched: bool = True
    is_ntt: bool = True
    is_montgomery: bool = False

    def with_scale(self, scale) -> "MetaData":
        return dataclasses.replace(self, scale=Fraction(scale))


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=["value"], meta_fields=["metadata"])
@dataclasses.dataclass(frozen=True)
class Ciphertext:
    """Degree-d RLWE ciphertext: value = (c_0, ..., c_d), each uint64[L, N]
    (core/rlwe/ciphertext.go:11)."""
    value: tuple[jnp.ndarray, ...]
    metadata: MetaData = MetaData()

    @property
    def degree(self) -> int:
        return len(self.value) - 1

    @property
    def level(self) -> int:
        return int(self.value[0].shape[-2]) - 1

    @property
    def scale(self) -> Fraction:
        return self.metadata.scale

    def with_value(self, value) -> "Ciphertext":
        return dataclasses.replace(self, value=tuple(value))

    def with_metadata(self, **kw) -> "Ciphertext":
        return dataclasses.replace(self, metadata=dataclasses.replace(self.metadata, **kw))


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=["value"], meta_fields=["metadata"])
@dataclasses.dataclass(frozen=True)
class Plaintext:
    """Degree-0 element (core/rlwe/plaintext.go)."""
    value: jnp.ndarray  # uint64[L, N]
    metadata: MetaData = MetaData()

    @property
    def level(self) -> int:
        return int(self.value.shape[-2]) - 1

    @property
    def scale(self) -> Fraction:
        return self.metadata.scale
