"""L3 schemes: CKKS, BGV/BFV, matrix-CKKS (3N fork).

Counterpart of /root/reference/schemes.  Scheme-agnostic contract
(schemes/schemes.go:7-28): every scheme exposes an encoder
(encode/decode/embed) and an evaluator (add/sub/mul/mul_relin/rescale/...)
over rlwe ciphertexts.
"""

from typing import Any, Protocol, runtime_checkable


@runtime_checkable
class EncoderInterface(Protocol):
    """schemes.Encoder (schemes/schemes.go:7-16): the contract circuits
    program against — encode values into a plaintext at a level/scale,
    decode back, embed into an existing polynomial."""

    def encode(self, values, level=None, scale=None) -> Any: ...
    def decode(self, pt) -> Any: ...


@runtime_checkable
class EvaluatorInterface(Protocol):
    """schemes.Evaluator (schemes/schemes.go:18-28): the scheme-agnostic
    homomorphic-op contract used by the L4 circuits (lintrans, polynomial)."""

    def add(self, a, b) -> Any: ...
    def sub(self, a, b) -> Any: ...
    def mul(self, a, b) -> Any: ...
    def mul_relin(self, a, b) -> Any: ...
    def rescale(self, a) -> Any: ...
