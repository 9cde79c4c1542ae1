"""Privacy-preserving ride hailing: encrypted nearest-driver matching.

Counterpart of
/root/reference/examples/singleparty/bgv_ride_hailing/main.go: a rider
encrypts their position; each SIMD slot pair holds one driver's position;
the platform computes all squared distances under encryption; the rider
decrypts only the distances and picks the closest driver.

    JAX_PLATFORMS=cpu python examples/bgv_ride_hailing.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from matrix_fhe_tpu.rlwe import decryptor, encryptor, keys as K
from matrix_fhe_tpu.schemes import bgv

T = 65537           # plaintext modulus (> max squared distance)
GRID = 120          # coordinates in [0, GRID)
N_DRIVERS = 32


def main():
    params = bgv.new_parameters(bgv.BGVParametersLiteral(
        logn=7, t=T, logq=(55, 45, 45), logp=(61,)))
    enc = bgv.Encoder(params)
    ks, kp, kr, ke = jax.random.split(jax.random.key(0), 4)
    sk = K.gen_secret_key(ks, params)
    pk = K.gen_public_key(kp, params, sk)
    rlk = K.gen_relinearization_key(kr, params, sk)
    ev = bgv.Evaluator(params, rlk=rlk)

    rng = np.random.default_rng(3)
    rider = rng.integers(0, GRID, 2)
    drivers = rng.integers(0, GRID, (N_DRIVERS, 2))

    # rider broadcasts (x, y, x, y, ...) encrypted; drivers' plaintext is
    # interleaved (x_0, y_0, x_1, y_1, ...)
    rider_vec = np.tile(rider, params.n // 2)
    driver_vec = np.zeros(params.n, dtype=np.int64)
    driver_vec[:2 * N_DRIVERS] = drivers.reshape(-1)
    ct = encryptor.encrypt(ke, params, pk, enc.encode(rider_vec))

    # (rider - driver)^2 per coordinate, exact mod t
    diff = ev.sub(ct, enc.encode(driver_vec))
    sq = ev.rescale(ev.mul_relin(diff, diff))

    dec = enc.decode(decryptor.decrypt(params, sk, sq)).astype(np.int64)
    d2 = dec[0:2 * N_DRIVERS:2] + dec[1:2 * N_DRIVERS:2]  # dx^2 + dy^2
    best = int(np.argmin(d2))

    want = np.sum((drivers - rider) ** 2, axis=1)
    assert np.array_equal(d2, want % T)
    assert best == int(np.argmin(want))
    print(f"rider at {tuple(rider)}: closest of {N_DRIVERS} drivers is "
          f"#{best} at {tuple(drivers[best])}, d^2={d2[best]}")


if __name__ == "__main__":
    main()
