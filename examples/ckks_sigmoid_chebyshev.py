"""Homomorphic sigmoid via Chebyshev interpolation + Paterson-Stockmeyer.

Counterpart of
/root/reference/examples/singleparty/ckks_sigmoid_chebyshev/main.go:
approximate sigmoid(x) = 1/(e^-x + 1) over [-8, 8] with a degree-31
Chebyshev interpolant and evaluate it on an encrypted vector.

    JAX_PLATFORMS=cpu python examples/ckks_sigmoid_chebyshev.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from decimal import Decimal

import numpy as np
import jax

from matrix_fhe_tpu.circuits import polynomial as poly_circ
from matrix_fhe_tpu.rlwe import decryptor, encryptor, keys as K
from matrix_fhe_tpu.schemes import ckks
from matrix_fhe_tpu.utils import bignum as bn

K_INTERVAL = 8.0


def sigmoid_decimal(x: Decimal) -> Decimal:
    return 1 / ((-x).exp() + 1)


def main():
    params = ckks.new_parameters(ckks.CKKSParametersLiteral(
        logn=7, logq=(55,) + (45,) * 6, logp=(61,), log_default_scale=45))
    enc = ckks.Encoder(params)
    ks, kr, ke = jax.random.split(jax.random.key(0), 3)
    sk = K.gen_secret_key(ks, params)
    rlk = K.gen_relinearization_key(kr, params, sk)
    ev = ckks.Evaluator(params, rlk=rlk)

    # degree-31 Chebyshev interpolant of sigmoid over [-K, K]
    itv = bn.Interval(-K_INTERVAL, K_INTERVAL, nodes=31)
    poly = bn.chebyshev_approximation(sigmoid_decimal, itv)
    xs = np.linspace(-K_INTERVAL, K_INTERVAL, 101)
    plain_err = np.max(np.abs([float(poly.evaluate(complex(x)).real)
                               - 1 / (np.exp(-x) + 1) for x in xs]))
    print(f"plaintext approximation error: {plain_err:.2e}")

    rng = np.random.default_rng(0)
    v = rng.uniform(-K_INTERVAL, K_INTERVAL, params.max_slots)
    ct = encryptor.encrypt(ke, params, sk, enc.encode(v + 0j))

    # change of basis x -> (2x - a - b) / (b - a) into [-1, 1]
    scalar, constant = poly.change_of_basis()
    ct = ev.add_const(ct, float(constant) / float(scalar))
    ct = ev.rescale(ev.mul_const(ct, float(scalar)))

    out = poly_circ.evaluate(ev, enc, ct, poly, params.default_scale)
    got = np.real(enc.decode(decryptor.decrypt(params, sk, out)))
    want = 1 / (np.exp(-v) + 1)
    err = float(np.max(np.abs(got - want)))
    print(f"homomorphic sigmoid: levels used {params.max_level - out.level}, "
          f"max err {err:.2e}")
    assert err < 1e-2


if __name__ == "__main__":
    main()
