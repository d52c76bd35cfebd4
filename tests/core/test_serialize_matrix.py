"""Serialization matrix: every object × every scheme roundtrips and obeys
its serialized-size upper bound (mirrors reference test/serialize.cu, where
each object's test asserts serialized_size_upperbound >= actual size)."""

import numpy as np
import pytest

from .fixtures import GeneralHeContext
from troy_tpu.utils import serialize as S
from troy_tpu.utils.serialize import CompressionMode

RNG = np.random.default_rng(31337)
SCHEMES = ("BFV", "BGV", "CKKS")


def make(scheme):
    if scheme == "CKKS":
        return GeneralHeContext(scheme, 32, q_bits=(30, 30, 30))
    return GeneralHeContext(scheme, 32, log_t=20, q_bits=(30, 30, 30))


def message(h):
    if h.scheme.name == "CKKS":
        return RNG.standard_normal(h.encoder.slot_count)
    return h.random_simd(RNG)


def check_decrypts(h, ct, m):
    if h.scheme.name == "CKKS":
        np.testing.assert_allclose(h.decrypt(ct).real, m, atol=1e-3)
    else:
        np.testing.assert_array_equal(h.decrypt(ct), m)


@pytest.mark.parametrize("scheme", SCHEMES)
def test_parms_roundtrip_and_bound(scheme):
    h = make(scheme)
    b = S.save_parms(h.parms)
    assert len(b) <= S.parms_size_upperbound(h.parms)
    q = S.load_parms(b)
    assert q.scheme == h.parms.scheme
    assert q.poly_modulus_degree == h.parms.poly_modulus_degree
    assert [m.value for m in q.coeff_modulus] == \
        [m.value for m in h.parms.coeff_modulus]
    assert q.plain_modulus.value == h.parms.plain_modulus.value


@pytest.mark.parametrize("scheme", SCHEMES)
@pytest.mark.parametrize("mode", (CompressionMode.Nil, CompressionMode.Zstd))
def test_plaintext_roundtrip_and_bound(scheme, mode):
    h = make(scheme)
    m = message(h)
    pt = (h.encoder.encode(m, scale=h.scale) if scheme == "CKKS"
          else h.encoder.encode(m))
    b = S.save_plaintext(pt, mode)
    assert len(b) <= S.plaintext_size_upperbound(pt)
    back = S.load_plaintext(b)
    got = h.encoder.decode(back)
    if scheme == "CKKS":
        np.testing.assert_allclose(got.real, m, atol=1e-6)
    else:
        np.testing.assert_array_equal(got, m)


@pytest.mark.parametrize("scheme", SCHEMES)
@pytest.mark.parametrize("seeded", (False, True))
def test_ciphertext_roundtrip_and_bound(scheme, seeded):
    h = make(scheme)
    m = message(h)
    pt = (h.encoder.encode(m, scale=h.scale) if scheme == "CKKS"
          else h.encoder.encode(m))
    ct = (h.encryptor.encrypt_symmetric(pt, save_seed=True) if seeded
          else h.encryptor.encrypt_asymmetric(pt))
    bound = S.ciphertext_size_upperbound(ct)
    b = S.save_ciphertext(ct, h.context)
    assert len(b) <= bound
    if seeded:
        # seed compression must beat the expanded size by ~half
        full = S.ciphertext_size_upperbound(h.encryptor.encrypt_asymmetric(pt))
        assert len(b) < full * 0.75
    back = S.load_ciphertext(b, h.context)
    check_decrypts(h, back, m)


@pytest.mark.parametrize("scheme", SCHEMES)
def test_keys_roundtrip_and_bound(scheme):
    h = make(scheme)
    b = S.save_secret_key(h.sk)
    assert len(b) <= S.secret_key_size_upperbound(h.sk)
    sk2 = S.load_secret_key(b)
    np.testing.assert_array_equal(np.asarray(sk2.data), np.asarray(h.sk.data))

    b = S.save_public_key(h.pk, h.context)
    assert len(b) <= S.public_key_size_upperbound(h.pk)
    pk2 = S.load_public_key(b, h.context)
    from troy_tpu.core.encryptor import Encryptor
    enc2 = Encryptor(h.context, pk=pk2)
    m = message(h)
    pt = (h.encoder.encode(m, scale=h.scale) if scheme == "CKKS"
          else h.encoder.encode(m))
    check_decrypts(h, enc2.encrypt_asymmetric(pt), m)

    rlk = h.keygen.create_relin_keys()
    b = S.save_kswitch_keys(rlk)
    assert len(b) <= S.kswitch_keys_size_upperbound(rlk)
    rlk2 = S.load_relin_keys(b)
    for k in rlk.keys:
        np.testing.assert_array_equal(np.asarray(rlk2.keys[k]),
                                      np.asarray(rlk.keys[k]))

    glk = h.keygen.create_galois_keys_from_steps([1])
    b = S.save_kswitch_keys(glk, CompressionMode.Zstd)
    assert len(b) <= S.kswitch_keys_size_upperbound(glk)
    glk2 = S.load_galois_keys(b)
    assert set(glk2.keys) == set(glk.keys)


@pytest.mark.parametrize("scheme", SCHEMES)
def test_lwe_roundtrip_and_bound(scheme):
    h = make(scheme)
    m = message(h)
    if scheme == "CKKS":
        pt = h.encoder.encode_float64_polynomial(m, scale=h.scale)
    else:
        pt = h.encoder.encode_polynomial(m)
    ct = h.encryptor.encrypt_asymmetric(pt)
    lwe = h.evaluator.extract_lwe(ct, 5)
    b = S.save_lwe(lwe)
    assert len(b) <= S.lwe_size_upperbound(lwe)
    back = S.load_lwe(b)
    asm = h.evaluator.assemble_lwe(back)
    pt2 = h.decryptor.decrypt(asm)
    if scheme == "CKKS":
        got = h.encoder.decode_float64_polynomial(pt2)[0]
        np.testing.assert_allclose(got, m[5], atol=1e-2)
    else:
        assert int(h.encoder.decode_polynomial(pt2)[0]) == int(m[5])


def test_wide_context_ciphertext_serialize():
    """Wide (40-60-bit prime) ciphertexts: (size, 2, L, n) pair layout must
    roundtrip and obey the bound."""
    h = GeneralHeContext("BFV", 32, log_t=20, q_bits=(40, 40, 40))
    m = h.random_simd(RNG)
    ct = h.encrypt(m)
    b = S.save_ciphertext(ct, h.context)
    assert len(b) <= S.ciphertext_size_upperbound(ct)
    back = S.load_ciphertext(b, h.context)
    np.testing.assert_array_equal(h.decrypt(back), m)
