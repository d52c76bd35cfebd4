"""LWE extraction / packing tests (mirrors reference test/lwe.cu,
examples/12_lwes.cu)."""

import numpy as np

from .fixtures import GeneralHeContext

RNG = np.random.default_rng(99)


def make(n=32):
    return GeneralHeContext("BFV", n, log_t=20, q_bits=(30, 30, 30))


def poly_encrypt(h, coeffs):
    pt = h.encoder.encode_polynomial(coeffs)
    return h.encryptor.encrypt_asymmetric(pt)


def test_extract_assemble_roundtrip():
    h = make()
    coeffs = RNG.integers(0, h.t, size=h.n, dtype=np.uint64)
    ct = poly_encrypt(h, coeffs)
    for term in (0, 1, 7, h.n - 1):
        lwe = h.evaluator.extract_lwe(ct, term)
        back = h.evaluator.assemble_lwe(lwe)
        dec = h.encoder.decode_polynomial(h.decryptor.decrypt(back))
        assert dec[0] == coeffs[term], term


def test_field_trace_keeps_coeff0():
    h = make()
    coeffs = RNG.integers(0, h.t, size=h.n, dtype=np.uint64)
    ct = poly_encrypt(h, coeffs)
    glk = h.keygen.create_automorphism_keys()
    # divide first: only coeff 0 survives the trace, where x n undoes it
    traced = h.evaluator.field_trace(
        h.evaluator.divide_by_poly_modulus_degree(ct), glk, logn_stop=0)
    dec = h.encoder.decode_polynomial(h.decryptor.decrypt(traced))
    assert dec[0] == coeffs[0]
    assert (dec[1:] == 0).all()


def test_pack_lwe_full():
    h = make()
    glk = h.keygen.create_automorphism_keys()
    coeffs = RNG.integers(0, h.t, size=h.n, dtype=np.uint64)
    ct = poly_encrypt(h, coeffs)
    n = h.n
    m = 8  # pack 8 LWEs -> payloads at stride n/8
    lwes = [h.evaluator.extract_lwe(ct, i) for i in range(m)]
    packed = h.evaluator.pack_lwe_ciphertexts(lwes, glk)
    dec = h.encoder.decode_polynomial(h.decryptor.decrypt(packed))
    stride = n // m
    for i in range(m):
        assert dec[i * stride] == coeffs[i], i


def test_pack_lwe_non_power_of_two():
    h = make()
    glk = h.keygen.create_automorphism_keys()
    coeffs = RNG.integers(0, h.t, size=h.n, dtype=np.uint64)
    ct = poly_encrypt(h, coeffs)
    m = 5  # pads to 8
    lwes = [h.evaluator.extract_lwe(ct, 2 * i) for i in range(m)]
    packed = h.evaluator.pack_lwe_ciphertexts(lwes, glk)
    dec = h.encoder.decode_polynomial(h.decryptor.decrypt(packed))
    stride = h.n // 8
    for i in range(m):
        assert dec[i * stride] == coeffs[2 * i], i


def test_pack_single_lwe():
    h = make()
    glk = h.keygen.create_automorphism_keys()
    coeffs = RNG.integers(0, h.t, size=h.n, dtype=np.uint64)
    ct = poly_encrypt(h, coeffs)
    lwe = h.evaluator.extract_lwe(ct, 3)
    packed = h.evaluator.pack_lwe_ciphertexts([lwe], glk)
    dec = h.encoder.decode_polynomial(h.decryptor.decrypt(packed))
    assert dec[0] == coeffs[3]
    assert (dec[1:] == 0).all()


def test_pack_lwe_batched_matches_sequential():
    h = make()
    glk = h.keygen.create_automorphism_keys()
    coeffs = RNG.integers(0, h.t, size=h.n, dtype=np.uint64)
    ct = poly_encrypt(h, coeffs)
    m, G = 4, 3
    groups = [[h.evaluator.extract_lwe(ct, g * m + i) for i in range(m)]
              for g in range(G)]
    batched = h.evaluator.pack_lwe_ciphertexts_batched(groups, glk)
    assert len(batched) == G
    stride = h.n // 4
    for g in range(G):
        seq = h.evaluator.pack_lwe_ciphertexts(groups[g], glk)
        dec_b = h.encoder.decode_polynomial(h.decryptor.decrypt(batched[g]))
        dec_s = h.encoder.decode_polynomial(h.decryptor.decrypt(seq))
        np.testing.assert_array_equal(dec_b, dec_s)
        for i in range(m):
            assert dec_b[i * stride] == coeffs[g * m + i], (g, i)


def test_pack_lwe_batched_ragged_groups():
    h = make()
    glk = h.keygen.create_automorphism_keys()
    coeffs = RNG.integers(0, h.t, size=h.n, dtype=np.uint64)
    ct = poly_encrypt(h, coeffs)
    groups = [[h.evaluator.extract_lwe(ct, i) for i in range(3)],
              [h.evaluator.extract_lwe(ct, 10 + i) for i in range(4)]]
    batched = h.evaluator.pack_lwe_ciphertexts_batched(groups, glk)
    stride = h.n // 4
    dec0 = h.encoder.decode_polynomial(h.decryptor.decrypt(batched[0]))
    dec1 = h.encoder.decode_polynomial(h.decryptor.decrypt(batched[1]))
    for i in range(3):
        assert dec0[i * stride] == coeffs[i], i
    assert dec0[3 * stride] == 0  # padded slot packs as zero
    for i in range(4):
        assert dec1[i * stride] == coeffs[10 + i], i


def test_pack_rlwe_batched_bgv_ntt_form():
    hb = GeneralHeContext("BGV", 32, log_t=20, q_bits=(30, 30, 30))
    glk = hb.keygen.create_automorphism_keys()
    coeffs = RNG.integers(0, hb.t, size=hb.n, dtype=np.uint64)
    pt = hb.encoder.encode_polynomial(coeffs)
    ct = hb.encryptor.encrypt_asymmetric(pt)
    m, G = 2, 2
    groups = [[hb.evaluator.extract_lwe(ct, g * m + i) for i in range(m)]
              for g in range(G)]
    batched = hb.evaluator.pack_lwe_ciphertexts_batched(groups, glk)
    stride = hb.n // 2
    for g in range(G):
        dec = hb.encoder.decode_polynomial(hb.decryptor.decrypt(batched[g]))
        for i in range(m):
            assert dec[i * stride] == coeffs[g * m + i], (g, i)
