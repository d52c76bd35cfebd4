"""End-to-end CKKS tests (mirrors reference test/evaluator.cu CKKS cases,
examples/5_ckks_basics.cu)."""

import numpy as np

from .fixtures import GeneralHeContext

RNG = np.random.default_rng(321)
SCALE = 2.0 ** 25


def make(n=64, q_bits=(30, 30, 30, 30)):
    return GeneralHeContext("CKKS", n, q_bits=q_bits, scale=SCALE)


def rand_complex(h):
    return (RNG.uniform(-1, 1, h.encoder.slot_count)
            + 1j * RNG.uniform(-1, 1, h.encoder.slot_count))


def enc(h, v):
    return h.encryptor.encrypt_asymmetric(h.encoder.encode(v, scale=h.scale))


def test_encode_decode():
    h = make()
    v = rand_complex(h)
    pt = h.encoder.encode(v, scale=h.scale)
    out = h.encoder.decode(pt)
    np.testing.assert_allclose(out, v, atol=1e-5)


def test_encrypt_decrypt():
    h = make()
    v = rand_complex(h)
    ct = enc(h, v)
    out = h.encoder.decode(h.decryptor.decrypt(ct))
    np.testing.assert_allclose(out, v, atol=1e-4)


def test_add_sub_negate():
    h = make()
    v1, v2 = rand_complex(h), rand_complex(h)
    ct1, ct2 = enc(h, v1), enc(h, v2)
    np.testing.assert_allclose(
        h.encoder.decode(h.decryptor.decrypt(h.evaluator.add(ct1, ct2))),
        v1 + v2, atol=1e-4)
    np.testing.assert_allclose(
        h.encoder.decode(h.decryptor.decrypt(h.evaluator.sub(ct1, ct2))),
        v1 - v2, atol=1e-4)
    np.testing.assert_allclose(
        h.encoder.decode(h.decryptor.decrypt(h.evaluator.negate(ct1))),
        -v1, atol=1e-4)


def test_add_multiply_plain():
    h = make()
    v1, v2 = rand_complex(h), rand_complex(h)
    ct = enc(h, v1)
    pt2 = h.encoder.encode(v2, scale=h.scale)
    np.testing.assert_allclose(
        h.encoder.decode(h.decryptor.decrypt(h.evaluator.add_plain(ct, pt2))),
        v1 + v2, atol=1e-4)
    prod = h.evaluator.multiply_plain(ct, pt2)
    np.testing.assert_allclose(
        h.encoder.decode(h.decryptor.decrypt(prod)), v1 * v2, atol=1e-3)


def test_multiply_relinearize_rescale():
    h = make()
    v1, v2 = rand_complex(h), rand_complex(h)
    ct1, ct2 = enc(h, v1), enc(h, v2)
    prod = h.evaluator.multiply(ct1, ct2)
    assert prod.size == 3
    np.testing.assert_allclose(
        h.encoder.decode(h.decryptor.decrypt(prod)), v1 * v2, atol=1e-3)
    rlk = h.keygen.create_relin_keys()
    rel = h.evaluator.relinearize(prod, rlk)
    np.testing.assert_allclose(
        h.encoder.decode(h.decryptor.decrypt(rel)), v1 * v2, atol=1e-3)
    res = h.evaluator.rescale_to_next(rel)
    assert res.coeff_modulus_size == ct1.coeff_modulus_size - 1
    np.testing.assert_allclose(
        h.encoder.decode(h.decryptor.decrypt(res)), v1 * v2, atol=1e-3)


def test_mod_switch_drop():
    h = make()
    v = rand_complex(h)
    ct = enc(h, v)
    down = h.evaluator.mod_switch_to_next(ct)
    assert down.coeff_modulus_size == ct.coeff_modulus_size - 1
    np.testing.assert_allclose(
        h.encoder.decode(h.decryptor.decrypt(down)), v, atol=1e-4)


def test_square():
    h = make()
    v = rand_complex(h)
    ct = enc(h, v)
    sq = h.evaluator.square(ct)
    np.testing.assert_allclose(
        h.encoder.decode(h.decryptor.decrypt(sq)), v * v, atol=1e-3)
