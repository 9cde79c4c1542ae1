"""Vectorized oblivious linear evaluation (OLE) over Z_t with BGV.

Counterpart of
/root/reference/examples/singleparty/bgv_vectorized_ole/main.go: a receiver
encrypts x; the sender computes z = a*x + b homomorphically without learning
x; the receiver decrypts z without learning (a, b) beyond the relation.

    JAX_PLATFORMS=cpu python examples/bgv_vectorized_ole.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from matrix_fhe_tpu.rlwe import decryptor, encryptor, keys as K
from matrix_fhe_tpu.schemes import bgv

T = 65537


def main():
    params = bgv.new_parameters(bgv.BGVParametersLiteral(
        logn=7, t=T, logq=(55, 45), logp=(61,)))
    enc = bgv.Encoder(params)

    # receiver: keys + encrypted input
    ks, kp, ke = jax.random.split(jax.random.key(0), 3)
    sk = K.gen_secret_key(ks, params)
    pk = K.gen_public_key(kp, params, sk)
    rng = np.random.default_rng(1)
    x = rng.integers(0, T, params.n)
    ct_x = encryptor.encrypt(ke, params, pk, enc.encode(x))

    # sender: batched affine map with plaintext (a, b) — one ct-pt multiply
    # and one ct-pt add for n OLEs at once
    a = rng.integers(1, T, params.n)
    b = rng.integers(0, T, params.n)
    ev = bgv.Evaluator(params)
    ct_z = ev.add(ev.mul(ct_x, enc.encode(a)), enc.encode(b))

    # receiver decrypts z = a*x + b
    z = enc.decode(decryptor.decrypt(params, sk, ct_z))
    assert np.array_equal(z, (a * x + b) % T)
    print(f"vectorized OLE: {params.n} evaluations of z = a*x + b mod {T}, "
          f"all exact")


if __name__ == "__main__":
    main()
