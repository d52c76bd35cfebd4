"""Serialization round-trip tests (mirrors reference test/serialize.cu +
serialize_zstd.cu: every object, with/without seed compression, terms)."""

import numpy as np

from .fixtures import GeneralHeContext
from troy_tpu.utils import serialize as S

RNG = np.random.default_rng(55)


def make():
    return GeneralHeContext("BFV", 32, log_t=20, q_bits=(30, 30, 30))


def test_plaintext_roundtrip():
    h = make()
    m = h.random_simd(RNG)
    pt = h.encoder.encode(m)
    for mode in (S.CompressionMode.Nil, S.CompressionMode.Zstd, S.CompressionMode.Zlib):
        blob = S.save_plaintext(pt, mode)
        pt2 = S.load_plaintext(blob)
        np.testing.assert_array_equal(h.encoder.decode(pt2), m)


def test_ciphertext_roundtrip():
    h = make()
    m = h.random_simd(RNG)
    ct = h.encrypt(m)
    for mode in (S.CompressionMode.Nil, S.CompressionMode.Zstd):
        blob = S.save_ciphertext(ct, h.context, mode)
        ct2 = S.load_ciphertext(blob, h.context)
        np.testing.assert_array_equal(h.decrypt(ct2), m)


def test_seed_compressed_ciphertext():
    h = make()
    m = h.random_simd(RNG)
    pt = h.encoder.encode(m)
    ct = h.encryptor.encrypt_symmetric(pt, save_seed=True)
    assert ct.seed is not None
    blob_full = S.save_ciphertext(ct.clone(), h.context)
    ct_noseed = ct.clone()
    ct_noseed.seed = None
    blob_noseed = S.save_ciphertext(ct_noseed, h.context)
    # seeded form stores only c0 + 8-byte seed: roughly half the size
    assert len(blob_full) < len(blob_noseed) * 0.6
    ct2 = S.load_ciphertext(blob_full, h.context)
    np.testing.assert_array_equal(h.decrypt(ct2), m)


def test_save_terms():
    h = make()
    coeffs = RNG.integers(0, h.t, size=h.n, dtype=np.uint64)
    ct = h.encryptor.encrypt_asymmetric(h.encoder.encode_polynomial(coeffs))
    terms = [0, 3, 17]
    blob = S.save_ciphertext(ct, h.context, terms=terms)
    full = S.save_ciphertext(ct, h.context)
    assert len(blob) < len(full)
    ct2 = S.load_ciphertext(blob, h.context)
    dec = h.encoder.decode_polynomial(h.decryptor.decrypt(ct2))
    for t in terms:
        assert dec[t] == coeffs[t]


def test_keys_roundtrip():
    h = make()
    sk2 = S.load_secret_key(S.save_secret_key(h.sk))
    np.testing.assert_array_equal(np.asarray(sk2.data), np.asarray(h.sk.data))
    pk2 = S.load_public_key(S.save_public_key(h.pk, h.context), h.context)
    np.testing.assert_array_equal(np.asarray(pk2.data()), np.asarray(h.pk.data()))
    rlk = h.keygen.create_relin_keys()
    rlk2 = S.load_relin_keys(S.save_kswitch_keys(rlk, S.CompressionMode.Zstd))
    m1, m2 = h.random_simd(RNG), h.random_simd(RNG)
    prod = h.evaluator.relinearize(
        h.evaluator.multiply(h.encrypt(m1), h.encrypt(m2)), rlk2)
    np.testing.assert_array_equal(h.decrypt(prod), m1 * m2 % h.t)


def test_lwe_roundtrip():
    h = make()
    coeffs = RNG.integers(0, h.t, size=h.n, dtype=np.uint64)
    ct = h.encryptor.encrypt_asymmetric(h.encoder.encode_polynomial(coeffs))
    lwe = h.evaluator.extract_lwe(ct, 5)
    lwe2 = S.load_lwe(S.save_lwe(lwe, S.CompressionMode.Zstd))
    back = h.evaluator.assemble_lwe(lwe2)
    dec = h.encoder.decode_polynomial(h.decryptor.decrypt(back))
    assert dec[0] == coeffs[5]
