"""L1 ring arithmetic: modular reduction, NTT, vector ops, basis extension.

TPU-native counterpart of the reference's ``ring/`` package
(/root/reference/ring): device code is JAX (uint64 emulation everywhere, with
Pallas uint32 fast paths for <2^31 moduli); table generation is host-side
Python big-int arithmetic mirroring the reference's constants bit-for-bit.
"""
