"""Depth/chain tests: multi-level computation paths across schemes
(broadens coverage toward reference test/evaluator.cu's 92 cases)."""

import numpy as np

from .fixtures import GeneralHeContext

RNG = np.random.default_rng(140)


def test_bfv_depth2_with_modswitch():
    h = GeneralHeContext("BFV", 32, log_t=20, q_bits=(30,) * 6)
    rlk = h.keygen.create_relin_keys()
    m1, m2, m3 = (h.random_simd(RNG) for _ in range(3))
    ct = h.evaluator.relinearize(
        h.evaluator.multiply(h.encrypt(m1), h.encrypt(m2)), rlk)
    ct = h.evaluator.mod_switch_to_next(ct)
    ct3 = h.evaluator.mod_switch_to(h.encrypt(m3), ct.parms_id)
    prod = h.evaluator.relinearize(h.evaluator.multiply(ct, ct3), rlk)
    np.testing.assert_array_equal(h.decrypt(prod), m1 * m2 % h.t * m3 % h.t)


def test_bfv_mod_switch_to_walks_chain():
    h = GeneralHeContext("BFV", 32, log_t=20, q_bits=(30,) * 5)
    m = h.random_simd(RNG)
    ct = h.encrypt(m)
    last_pid = h.context.last_parms_id
    down = h.evaluator.mod_switch_to(ct, last_pid)
    assert down.parms_id == last_pid
    assert down.coeff_modulus_size == 1
    np.testing.assert_array_equal(h.decrypt(down), m)


def test_ckks_depth2_rescale_chain():
    scale = 2.0 ** 25
    h = GeneralHeContext("CKKS", 64, q_bits=(30,) * 5, scale=scale)
    rlk = h.keygen.create_relin_keys()
    v1 = RNG.uniform(-1, 1, h.encoder.slot_count)
    v2 = RNG.uniform(-1, 1, h.encoder.slot_count)

    def enc(v):
        return h.encryptor.encrypt_asymmetric(h.encoder.encode(v, scale=scale))

    ct = h.evaluator.rescale_to_next(
        h.evaluator.relinearize(h.evaluator.multiply(enc(v1), enc(v2)), rlk))
    # encode the next operand directly at the ct's level and matching scale
    pt3 = h.encoder.encode(v1, parms_id=ct.parms_id, scale=ct.scale)
    ct = h.evaluator.rescale_to_next(h.evaluator.multiply_plain(ct, pt3))
    out = h.encoder.decode(h.decryptor.decrypt(ct))
    np.testing.assert_allclose(out.real, v1 * v2 * v1, atol=6e-2)  # scale ~2^20 after rescale -> coarse precision


def test_ckks_plain_mod_switch_alignment():
    scale = 2.0 ** 25
    h = GeneralHeContext("CKKS", 64, q_bits=(30,) * 4, scale=scale)
    v = RNG.uniform(-1, 1, h.encoder.slot_count)
    pt = h.encoder.encode(v, scale=scale)
    ct = h.encryptor.encrypt_asymmetric(pt)
    ct_down = h.evaluator.mod_switch_to_next(ct)
    pt_down = h.evaluator.mod_switch_plain_to(pt, ct_down.parms_id)
    s = h.evaluator.add_plain(ct_down, pt_down)
    out = h.encoder.decode(h.decryptor.decrypt(s))
    np.testing.assert_allclose(out, 2 * v, atol=1e-3)


def test_bgv_depth2():
    h = GeneralHeContext("BGV", 32, log_t=20, q_bits=(30,) * 6)
    rlk = h.keygen.create_relin_keys()
    m1, m2, m3 = (h.random_simd(RNG) for _ in range(3))
    ct = h.evaluator.relinearize(
        h.evaluator.multiply(h.encrypt(m1), h.encrypt(m2)), rlk)
    ct = h.evaluator.mod_switch_to_next(ct)
    ct3 = h.evaluator.mod_switch_to(h.encrypt(m3), ct.parms_id)
    prod = h.evaluator.relinearize(h.evaluator.multiply(ct, ct3), rlk)
    np.testing.assert_array_equal(h.decrypt(prod), m1 * m2 % h.t * m3 % h.t)


def test_rotation_at_lower_level():
    h = GeneralHeContext("BFV", 64, log_t=20, q_bits=(30,) * 5)
    glk = h.keygen.create_galois_keys_from_steps([1])
    m = h.random_simd(RNG)
    ct = h.evaluator.mod_switch_to_next(h.encrypt(m))
    out = h.decrypt(h.evaluator.rotate_rows(ct, 1, glk)).reshape(2, -1)
    np.testing.assert_array_equal(out, np.roll(m.reshape(2, -1), -1, axis=1))


def test_serialize_ckks_bgv_metadata():
    from troy_tpu.utils import serialize as S

    scale = 2.0 ** 25
    hc = GeneralHeContext("CKKS", 32, q_bits=(30, 30, 30), scale=scale)
    v = RNG.uniform(-1, 1, hc.encoder.slot_count)
    ct = hc.encryptor.encrypt_asymmetric(hc.encoder.encode(v, scale=scale))
    ct2 = S.load_ciphertext(S.save_ciphertext(ct, hc.context), hc.context)
    assert ct2.scale == ct.scale and ct2.is_ntt_form
    np.testing.assert_allclose(
        hc.encoder.decode(hc.decryptor.decrypt(ct2)), v, atol=1e-4)

    hb = GeneralHeContext("BGV", 32, log_t=20, q_bits=(30, 30, 30))
    m = hb.random_simd(RNG)
    ctb = hb.evaluator.mod_switch_to_next(hb.encrypt(m))
    assert ctb.correction_factor != 1
    ctb2 = S.load_ciphertext(S.save_ciphertext(ctb, hb.context), hb.context)
    assert ctb2.correction_factor == ctb.correction_factor
    np.testing.assert_array_equal(hb.decrypt(ctb2), m)


def test_ckks_encode_variants():
    h = GeneralHeContext("CKKS", 32, q_bits=(30, 30, 30), scale=2.0 ** 25)
    enc = h.encoder
    pt = enc.encode_float64_single(0.5, scale=2.0 ** 25)
    np.testing.assert_allclose(enc.decode(pt), 0.5, atol=1e-5)
    pt = enc.encode_complex64_single(0.25 + 0.5j, scale=2.0 ** 25)
    np.testing.assert_allclose(enc.decode(pt), 0.25 + 0.5j, atol=1e-5)
    pt = enc.encode_integer64_single(7)
    ct = h.encryptor.encrypt_asymmetric(enc.encode([1.0] * enc.slot_count,
                                                   scale=2.0 ** 25))
    prod = h.evaluator.multiply_plain(ct, pt)  # exact x7, scale unchanged
    assert prod.scale == ct.scale
    np.testing.assert_allclose(
        enc.decode(h.decryptor.decrypt(prod)), 7.0, atol=1e-4)
