"""L3 schemes: CKKS, BGV/BFV, matrix-CKKS (3N fork).

Counterpart of /root/reference/schemes.  Scheme-agnostic contract
(schemes/schemes.go:7-28): every scheme exposes an encoder
(encode/decode/embed) and an evaluator (add/sub/mul/mul_relin/rescale/...)
over rlwe ciphertexts.
"""
