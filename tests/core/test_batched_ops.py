"""Batched evaluator API tests (mirrors reference test/evaluator_batched.cu:
re-running ops through the batched APIs with vectors of ciphertexts)."""

import numpy as np

from .fixtures import GeneralHeContext

RNG = np.random.default_rng(919)
B = 3


def make(scheme="BFV"):
    return GeneralHeContext(scheme, 32, log_t=20, q_bits=(30, 30, 30))


def test_batched_add_sub_negate():
    h = make()
    ms1 = [h.random_simd(RNG) for _ in range(B)]
    ms2 = [h.random_simd(RNG) for _ in range(B)]
    cts1 = [h.encrypt(m) for m in ms1]
    cts2 = [h.encrypt(m) for m in ms2]
    for out, m1, m2 in zip(h.evaluator.add_batched(cts1, cts2), ms1, ms2):
        np.testing.assert_array_equal(h.decrypt(out), (m1 + m2) % h.t)
    for out, m1, m2 in zip(h.evaluator.sub_batched(cts1, cts2), ms1, ms2):
        np.testing.assert_array_equal(
            h.decrypt(out), (m1.astype(np.int64) - m2.astype(np.int64)) % h.t)
    for out, m in zip(h.evaluator.negate_batched(cts1), ms1):
        np.testing.assert_array_equal(h.decrypt(out), (h.t - m) % h.t)


def test_batched_multiply_relinearize():
    h = make()
    rlk = h.keygen.create_relin_keys()
    ms1 = [h.random_simd(RNG) for _ in range(B)]
    ms2 = [h.random_simd(RNG) for _ in range(B)]
    cts1 = [h.encrypt(m) for m in ms1]
    cts2 = [h.encrypt(m) for m in ms2]
    prods = h.evaluator.multiply_batched(cts1, cts2)
    for out, m1, m2 in zip(prods, ms1, ms2):
        np.testing.assert_array_equal(h.decrypt(out), m1 * m2 % h.t)
    rels = h.evaluator.relinearize_batched(prods, rlk)
    for out, m1, m2 in zip(rels, ms1, ms2):
        assert out.size == 2
        np.testing.assert_array_equal(h.decrypt(out), m1 * m2 % h.t)


def test_batched_multiply_plain():
    h = make()
    ms1 = [h.random_simd(RNG) for _ in range(B)]
    ms2 = [h.random_simd(RNG) for _ in range(B)]
    cts = [h.encrypt(m) for m in ms1]
    pts = [h.encoder.encode(m) for m in ms2]
    for out, m1, m2 in zip(h.evaluator.multiply_plain_batched(cts, pts), ms1, ms2):
        np.testing.assert_array_equal(h.decrypt(out), m1 * m2 % h.t)


def test_batched_encrypt_decrypt():
    h = make()
    ms = [h.random_simd(RNG) for _ in range(B)]
    pts = [h.encoder.encode(m) for m in ms]
    cts = h.encryptor.encrypt_asymmetric_batched(pts)
    cts2 = h.encryptor.encrypt_symmetric_batched(pts, save_seed=True)
    for out, m in zip(h.decryptor.decrypt_batched(cts), ms):
        np.testing.assert_array_equal(h.encoder.decode(out), m)
    for ct, m in zip(cts2, ms):
        assert ct.seed is not None
        np.testing.assert_array_equal(h.decrypt(ct), m)


def test_add_mixed_sizes():
    """size-3 + size-2 pads the smaller operand (ref: translate with
    differing polynomial counts)."""
    h = make()
    m1, m2, m3 = (h.random_simd(RNG) for _ in range(3))
    prod = h.evaluator.multiply(h.encrypt(m1), h.encrypt(m2))  # size 3
    ct3 = h.encrypt(m3)                                        # size 2
    s = h.evaluator.add(prod, ct3)
    assert s.size == 3
    np.testing.assert_array_equal(h.decrypt(s), (m1 * m2 + m3) % h.t)
    s2 = h.evaluator.add(ct3, prod)  # commuted
    np.testing.assert_array_equal(h.decrypt(s2), (m1 * m2 + m3) % h.t)


def test_batched_bgv_multiply():
    h = make("BGV")
    ms1 = [h.random_simd(RNG) for _ in range(B)]
    ms2 = [h.random_simd(RNG) for _ in range(B)]
    cts1 = [h.encrypt(m) for m in ms1]
    cts2 = [h.encrypt(m) for m in ms2]
    for out, m1, m2 in zip(h.evaluator.multiply_batched(cts1, cts2), ms1, ms2):
        np.testing.assert_array_equal(h.decrypt(out), m1 * m2 % h.t)
