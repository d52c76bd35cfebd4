"""Negative/validation tests: parameter checks, mismatched operands
(mirrors the reference's pervasive [Class::method] argument validation)."""

import numpy as np
import pytest

from .fixtures import GeneralHeContext
from troy_tpu.core.params import EncryptionParameters, SchemeType
from troy_tpu.core.context import HeContext
from troy_tpu.core.coeff_modulus import CoeffModulus, PlainModulus, SecurityLevel
from troy_tpu.core.modulus import Modulus

RNG = np.random.default_rng(3131)


def test_coeff_modulus_bit_size_guard():
    # too small for either path
    with pytest.raises(ValueError, match="bit size"):
        CoeffModulus.create(1024, [20])
    # too large for the wide path
    with pytest.raises(ValueError, match="bit size"):
        CoeffModulus.create(1024, [61])
    # fast-path and wide-path widths cannot mix in one chain
    with pytest.raises(ValueError, match="bit size"):
        CoeffModulus.create(1024, [30, 40])
    # wide path (SEAL-default widths) is accepted
    qs = CoeffModulus.create(1024, [40, 40])
    assert [q.bit_count for q in qs] == [40, 40]


def test_plain_modulus_width_guard():
    with pytest.raises(ValueError, match="30 bits"):
        PlainModulus.batching(1024, 40)


def test_security_budget_enforced():
    parms = EncryptionParameters(SchemeType.BFV)
    parms.set_poly_modulus_degree(1024)
    parms.set_coeff_modulus(CoeffModulus.create(1024, [30, 30]))
    parms.set_plain_modulus(PlainModulus.batching(1024, 20))
    # 60 bits > 27-bit classical-128 bound for n=1024
    with pytest.raises(ValueError, match="security"):
        HeContext.create(parms, True, SecurityLevel.Classical128)
    HeContext.create(parms, True, SecurityLevel.Nil)  # fine without a bound


def test_non_ntt_modulus_rejected():
    parms = EncryptionParameters(SchemeType.BFV)
    parms.set_poly_modulus_degree(1024)
    # a 30-bit prime NOT ≡ 1 mod 2n
    from troy_tpu.utils import numth

    p = numth.get_prime(2, 30)
    assert p % 2048 != 1
    parms.set_coeff_modulus([Modulus(p)])
    parms.set_plain_modulus(PlainModulus.batching(1024, 20))
    with pytest.raises(ValueError, match="NTT"):
        HeContext.create(parms, True, SecurityLevel.Nil)


def test_ckks_rejects_plain_modulus():
    parms = EncryptionParameters(SchemeType.CKKS)
    with pytest.raises(ValueError, match="plain modulus"):
        parms.set_plain_modulus(65537)


def test_level_mismatch_rejected():
    h = GeneralHeContext("BFV", 32, log_t=20, q_bits=(30, 30, 30))
    m = h.random_simd(RNG)
    ct1 = h.encrypt(m)
    ct2 = h.evaluator.mod_switch_to_next(h.encrypt(m))
    with pytest.raises(ValueError, match="level"):
        h.evaluator.add(ct1, ct2)


def test_ckks_scale_mismatch_rejected():
    h = GeneralHeContext("CKKS", 32, q_bits=(30, 30, 30), scale=2.0 ** 25)
    v = RNG.uniform(-1, 1, h.encoder.slot_count)
    ct1 = h.encryptor.encrypt_asymmetric(h.encoder.encode(v, scale=2.0 ** 25))
    ct2 = h.encryptor.encrypt_asymmetric(h.encoder.encode(v, scale=2.0 ** 26))
    with pytest.raises(ValueError, match="scale"):
        h.evaluator.add(ct1, ct2)


def test_relinearize_requires_size3():
    # relinearize needs a size >= 3 ciphertext (arbitrary sizes supported)
    h = GeneralHeContext("BFV", 32, log_t=20, q_bits=(30, 30, 30))
    rlk = h.keygen.create_relin_keys()
    ct = h.encrypt(h.random_simd(RNG))
    with pytest.raises(ValueError, match=">= 3"):
        h.evaluator.relinearize(ct, rlk)


def test_unknown_parms_id():
    h = GeneralHeContext("BFV", 32, log_t=20, q_bits=(30, 30, 30))
    with pytest.raises(KeyError):
        h.context.get_context_data("ab" * 32)


def test_encoder_capacity():
    h = GeneralHeContext("CKKS", 32, q_bits=(30, 30, 30), scale=2.0 ** 25)
    with pytest.raises(ValueError, match="exceed"):
        h.encoder.encode([1e30] * h.encoder.slot_count, scale=2.0 ** 60)


def test_bfv_add_plain_form_mismatch_rejected():
    """NTT-form plain onto coeff-form BFV ct must raise, not silently mix
    domains."""
    import pytest
    import numpy as np
    from tests.core.fixtures import GeneralHeContext

    h = GeneralHeContext("BFV", 32, log_t=20, q_bits=(30, 30, 30))
    rng = np.random.default_rng(2)
    ct = h.encrypt(h.random_simd(rng))
    pt_ntt = h.evaluator.transform_plain_to_ntt(
        h.encoder.encode(h.random_simd(rng)), ct.parms_id)
    with pytest.raises(ValueError):
        h.evaluator.add_plain(ct, pt_ntt)
