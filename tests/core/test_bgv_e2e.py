"""End-to-end BGV tests (mirrors reference test/evaluator.cu BGV cases,
examples/4_bgv_basics.cu)."""

import numpy as np

from .fixtures import GeneralHeContext

RNG = np.random.default_rng(777)


def make(n=64, q_bits=(30, 30, 30, 30)):
    return GeneralHeContext("BGV", n, log_t=20, q_bits=q_bits)


def test_encrypt_decrypt():
    h = make()
    m = h.random_simd(RNG)
    for asym in (True, False):
        ct = h.encrypt(m, asym=asym)
        assert ct.is_ntt_form
        np.testing.assert_array_equal(h.decrypt(ct), m)


def test_add_sub_plain_ops():
    h = make()
    m1, m2 = h.random_simd(RNG), h.random_simd(RNG)
    ct1, ct2 = h.encrypt(m1), h.encrypt(m2)
    np.testing.assert_array_equal(h.decrypt(h.evaluator.add(ct1, ct2)), (m1 + m2) % h.t)
    np.testing.assert_array_equal(
        h.decrypt(h.evaluator.sub(ct1, ct2)),
        (m1.astype(np.int64) - m2.astype(np.int64)) % h.t)
    pt2 = h.encoder.encode(m2)
    np.testing.assert_array_equal(h.decrypt(h.evaluator.add_plain(ct1, pt2)), (m1 + m2) % h.t)
    np.testing.assert_array_equal(h.decrypt(h.evaluator.multiply_plain(ct1, pt2)),
                                  m1 * m2 % h.t)


def test_multiply_relinearize():
    h = make()
    m1, m2 = h.random_simd(RNG), h.random_simd(RNG)
    ct1, ct2 = h.encrypt(m1), h.encrypt(m2)
    prod = h.evaluator.multiply(ct1, ct2)
    np.testing.assert_array_equal(h.decrypt(prod), m1 * m2 % h.t)
    rlk = h.keygen.create_relin_keys()
    rel = h.evaluator.relinearize(prod, rlk)
    np.testing.assert_array_equal(h.decrypt(rel), m1 * m2 % h.t)


def test_mod_switch_correction_factor():
    h = make()
    m = h.random_simd(RNG)
    ct = h.encrypt(m)
    down = h.evaluator.mod_switch_to_next(ct)
    assert down.correction_factor != ct.correction_factor
    np.testing.assert_array_equal(h.decrypt(down), m)
    # add two cts with different correction factors
    ct_b = h.encrypt(m)
    down2 = h.evaluator.mod_switch_to_next(h.evaluator.add(ct_b, ct_b))
    s = h.evaluator.add(down, down2)
    np.testing.assert_array_equal(h.decrypt(s), 3 * m % h.t)


def test_multiply_then_modswitch():
    h = make()
    m1, m2 = h.random_simd(RNG), h.random_simd(RNG)
    rlk = h.keygen.create_relin_keys()
    prod = h.evaluator.relinearize(
        h.evaluator.multiply(h.encrypt(m1), h.encrypt(m2)), rlk)
    down = h.evaluator.mod_switch_to_next(prod)
    np.testing.assert_array_equal(h.decrypt(down), m1 * m2 % h.t)
