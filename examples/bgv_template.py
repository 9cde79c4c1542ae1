"""BGV starter template: exact integer SIMD arithmetic mod t.

Counterpart of /root/reference/examples/singleparty/templates/bgv/main.go on
insecure demo parameters.  Run from the repo root:

    JAX_PLATFORMS=cpu python examples/bgv_template.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from matrix_fhe_tpu.rlwe import decryptor, encryptor, keys as K
from matrix_fhe_tpu.schemes import bgv

T = 65537  # plaintext modulus, t = 1 mod 2N


def main():
    params = bgv.new_parameters(bgv.BGVParametersLiteral(
        logn=7, t=T, logq=(55, 45, 45), logp=(61,)))

    key = jax.random.key(0)
    ks, kp, kr, kg, k1, k2 = jax.random.split(key, 6)
    sk = K.gen_secret_key(ks, params)
    pk = K.gen_public_key(kp, params, sk)
    rlk = K.gen_relinearization_key(kr, params, sk)
    gks = K.gen_galois_keys(kg, params, sk, [params.galois_element(2)])

    enc = bgv.Encoder(params)
    ev = bgv.Evaluator(params, rlk=rlk, galois_keys=gks)

    rng = np.random.default_rng(0)
    a = rng.integers(0, T, params.n)
    b = rng.integers(0, T, params.n)
    ct_a = encryptor.encrypt(k1, params, pk, enc.encode(a))
    ct_b = encryptor.encrypt(k2, params, sk, enc.encode(b))

    # the template circuit: a*b + b, then rotate columns by 2
    ct = ev.add(ev.mul_relin(ct_a, ct_b), ct_b)
    ct = ev.rescale(ct)
    ct = ev.rotate_columns(ct, 2)

    got = enc.decode(decryptor.decrypt(params, sk, ct))
    half = params.n // 2
    ref = (a * b + b) % T
    ref = np.concatenate([np.roll(ref[:half], -2), np.roll(ref[half:], -2)])
    assert np.array_equal(got, ref)
    print(f"BGV template: exact match on {params.n} slots mod {T}")


if __name__ == "__main__":
    main()
