"""Base-2^B gadget decomposition + single-P key-switch paths.

Counterpart of the reference's EvaluationKeyParameters.BaseTwoDecomposition
(core/rlwe/keys.go:293-298) and gadgetProductSinglePAndBitDecompLazy
(core/rlwe/evaluator_gadget_product.go:190-325): P-less and single-P keys
with bit decomposition, exercised through apply_evaluation_key, rotation,
relinearization and the RGSW external product.
"""

import numpy as np
import pytest
import jax

from matrix_fhe_tpu import rgsw
from matrix_fhe_tpu.rlwe import decryptor, encryptor, keys as K
from matrix_fhe_tpu.schemes import ckks


def _params(logp=()):
    return ckks.new_parameters(ckks.CKKSParametersLiteral(
        logn=6, logq=(45, 45, 45), logp=logp, log_default_scale=40))


def _roundtrip(params, sk, v, key=3):
    enc = ckks.Encoder(params)
    pt = enc.encode(v)
    return enc, encryptor.encrypt(jax.random.key(key), params, sk, pt)


@pytest.mark.parametrize("evk_params", [
    K.EvaluationKeyParameters(level_p=-1, base_two_decomposition=12),
    K.EvaluationKeyParameters(level_p=-1, base_two_decomposition=0),
])
def test_apply_evaluation_key_pless(evk_params):
    """P-less key switch sk2 -> sk (with and without bit decomposition)."""
    params = _params(logp=())
    sk = K.gen_secret_key(jax.random.key(0), params)
    sk2 = K.gen_secret_key(jax.random.key(1), params)
    evk = K.gen_evaluation_key(jax.random.key(2), params, sk2.value.q, sk,
                               evk_params)
    assert evk.gadget.p is None
    if evk_params.base_two_decomposition:
        assert evk.gadget.base_two == 12
        assert evk.gadget.num_digits == sum(
            K.base_two_counts(params.q, 12))

    rng = np.random.default_rng(0)
    v = rng.uniform(-1, 1, params.max_slots)
    enc, ct = _roundtrip(params, sk2, v)
    ev = ckks.Evaluator(params)
    out = ev.apply_evaluation_key(ct, evk)
    got = enc.decode(decryptor.decrypt(params, sk, out))
    prec = -np.log2(np.mean(np.abs(got - v)) + 1e-30)
    # B=12 digits bound the key-switch noise; without bit decomposition the
    # P-less digit norm is q_i/2 and precision collapses
    if evk_params.base_two_decomposition:
        assert prec > 12, prec
    else:
        assert prec < 12, prec


def test_galois_key_single_p_base2():
    """Single-P (level_p=0) galois key with base-2^B decomposition."""
    params = _params(logp=(45,))
    sk = K.gen_secret_key(jax.random.key(0), params)
    evkp = K.EvaluationKeyParameters(level_p=0, base_two_decomposition=15)
    gal_el = params.galois_element(1)
    gk = K.gen_galois_key(jax.random.key(1), params, sk, gal_el, evkp)
    assert gk.gadget.p is not None and gk.gadget.p.shape[-2] == 1
    ev = ckks.Evaluator(params, galois_keys={gal_el: gk})

    rng = np.random.default_rng(1)
    v = rng.uniform(-1, 1, params.max_slots)
    enc, ct = _roundtrip(params, sk, v)
    got = enc.decode(decryptor.decrypt(params, sk, ev.rotate(ct, 1)))
    want = np.roll(v, -1)
    prec = -np.log2(np.mean(np.abs(got - want)) + 1e-30)
    assert prec > 15, prec


def test_relinearization_base2():
    params = _params(logp=())
    sk = K.gen_secret_key(jax.random.key(0), params)
    rlk = K.gen_relinearization_key(
        jax.random.key(1), params, sk,
        K.EvaluationKeyParameters(level_p=-1, base_two_decomposition=12))
    ev = ckks.Evaluator(params, rlk=rlk)
    rng = np.random.default_rng(2)
    v = rng.uniform(-1, 1, params.max_slots)
    enc, ct = _roundtrip(params, sk, v)
    out = ev.rescale(ev.mul_relin(ct, ct))
    got = enc.decode(decryptor.decrypt(params, sk, out))
    prec = -np.log2(np.mean(np.abs(got - v * v)) + 1e-30)
    assert prec > 10, prec


def test_rgsw_external_product_base2():
    params = _params(logp=())
    sk = K.gen_secret_key(jax.random.key(0), params)
    evkp = K.EvaluationKeyParameters(level_p=-1, base_two_decomposition=12)
    r = rgsw.encrypt_plaintext(jax.random.key(1), params, sk, 3, evkp)
    assert r.g0.base_two == 12

    rng = np.random.default_rng(3)
    v = rng.uniform(-1, 1, params.max_slots)
    enc, ct = _roundtrip(params, sk, v)
    out = rgsw.external_product(params, ct, r)
    got = enc.decode(decryptor.decrypt(params, sk, out))
    prec = -np.log2(np.mean(np.abs(got - 3 * v)) + 1e-30)
    assert prec > 10, prec
