"""HeContext chain + Modulus behavior (mirrors reference test/he_context.cu
BFVConstruct / ModulusChainExpansion and test/modulus.cu CreateModulus /
Reduce) and CKKS encoder variant coverage (test/ckks_encoder.cu)."""

import numpy as np
import pytest

from .fixtures import GeneralHeContext
from troy_tpu.core.modulus import Modulus
from troy_tpu.core.params import EncryptionParameters, SchemeType
from troy_tpu.core.context import HeContext
from troy_tpu.core.coeff_modulus import (CoeffModulus, PlainModulus,
                                         SecurityLevel)

RNG = np.random.default_rng(808)


# ---------------------------------------------------------------- modulus --
def test_modulus_create_and_ratio():
    for v in (2, 3, (1 << 29) + 11, (1 << 30) - 35, (1 << 60) - 93):
        m = Modulus(v)
        assert m.value == v
        ratio = (m.ratio64_hi << 32) | m.ratio64_lo
        assert ratio == (1 << 64) // v  # Barrett word pair


def test_modulus_rejects_invalid():
    with pytest.raises(ValueError):
        Modulus(1)  # 1 is not a usable modulus (ref: modulus.cu)
    with pytest.raises((ValueError, OverflowError)):
        Modulus(1 << 62)  # beyond the 61-bit bound


def test_modulus_reduce_matches_python():
    m = Modulus((1 << 29) + 11)
    vals = [0, 1, m.value - 1, m.value, m.value + 1, (1 << 40) + 12345]
    for v in vals:
        assert m.reduce(v) == v % m.value


# ----------------------------------------------------------------- context --
def test_bfv_construct_chain_properties():
    """(ref: he_context.cu BFVConstruct + ModulusChainExpansion)"""
    h = GeneralHeContext("BFV", 32, log_t=20, q_bits=(30, 30, 30, 30))
    ctx = h.context
    key_cd = ctx.key_context_data()
    assert key_cd.chain_index == 0
    assert len(key_cd.parms.coeff_modulus) == 4
    first = ctx.first_context_data()
    assert first.parms_id == ctx.first_parms_id
    # key level holds the special prime; first data level drops it
    assert len(first.parms.coeff_modulus) == 3
    # walk the chain: L shrinks by one per level, prev/next consistent
    cd = first
    seen = 1
    while not cd.is_last():
        nxt = cd.next
        assert nxt.prev is cd
        assert nxt.chain_index == cd.chain_index + 1
        assert len(nxt.parms.coeff_modulus) == len(cd.parms.coeff_modulus) - 1
        assert ctx.get_context_data(nxt.parms_id) is nxt
        cd = nxt
        seen += 1
    assert cd.parms_id == ctx.last_parms_id
    assert seen == 3  # data levels: 3, 2, 1 limbs
    assert ctx.using_keyswitching


def test_no_expand_chain_single_level():
    h = GeneralHeContext("BFV", 32, log_t=20, q_bits=(30, 30, 30),
                         expand_mod_chain=False)
    first = h.context.first_context_data()
    assert first.is_last()


def test_security_level_enforced():
    """n=1024 allows only 27 bits of log Q at 128-bit security."""
    parms = EncryptionParameters(SchemeType.BFV)
    parms.set_poly_modulus_degree(1024)
    parms.set_coeff_modulus(CoeffModulus.create(1024, [30, 30]))
    parms.set_plain_modulus(PlainModulus.batching(1024, 20))
    with pytest.raises(ValueError):
        HeContext.create(parms, True, SecurityLevel.Classical128)
    assert CoeffModulus.max_bit_count(1024, SecurityLevel.Classical128) == 27
    assert CoeffModulus.max_bit_count(8192, SecurityLevel.Classical192) == 152


def test_parms_id_chain_is_hash_chain():
    """Every level's parms_id differs, and reconstructing identical parms
    reproduces the identical id (blake2b of the parameter block)."""
    h1 = GeneralHeContext("BFV", 32, log_t=20, q_bits=(30, 30, 30))
    h2 = GeneralHeContext("BFV", 32, log_t=20, q_bits=(30, 30, 30))
    ids1 = []
    cd = h1.context.key_context_data()
    ids1.append(cd.parms_id)
    cd = h1.context.first_context_data()
    while True:
        ids1.append(cd.parms_id)
        if cd.is_last():
            break
        cd = cd.next
    assert len(set(ids1)) == len(ids1)
    assert h2.context.first_parms_id == h1.context.first_parms_id


# ---------------------------------------------------------- ckks encoder --
def test_ckks_encode_single_values():
    """(ref: ckks_encoder.cu single-value suites)"""
    h = GeneralHeContext("CKKS", 32, q_bits=(30, 30, 30))
    enc = h.encoder
    scale = 2.0 ** 25
    pt = enc.encode_float64_single(3.14159, scale=scale)
    np.testing.assert_allclose(enc.decode(pt), 3.14159, atol=1e-5)
    pt = enc.encode_complex64_single(1.5 - 2.25j, scale=scale)
    got = enc.decode(pt)
    np.testing.assert_allclose(got[0], 1.5 - 2.25j, atol=1e-5)
    pt = enc.encode_integer64_single(-7)
    np.testing.assert_allclose(enc.decode(pt).real, -7, atol=1e-6)


def test_ckks_encode_polynomial_variants():
    """(ref: ckks_encoder.cu Double/IntegerPolynomial)"""
    h = GeneralHeContext("CKKS", 32, q_bits=(30, 30, 30))
    enc = h.encoder
    scale = 2.0 ** 25
    coeffs = RNG.uniform(-2, 2, h.n)
    pt = enc.encode_float64_polynomial(coeffs, scale=scale)
    np.testing.assert_allclose(enc.decode_float64_polynomial(pt), coeffs,
                               atol=1e-5)
    # polynomial form multiplies as negacyclic convolution under the hood:
    # encrypt, multiply by x (shift), decrypt
    ct = h.encryptor.encrypt_asymmetric(pt)
    shifted = h.evaluator.negacyclic_shift(ct, 1)
    got = enc.decode_float64_polynomial(h.decryptor.decrypt(shifted))
    want = np.concatenate([[-coeffs[-1]], coeffs[:-1]])
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_ckks_encode_at_lower_level():
    h = GeneralHeContext("CKKS", 32, q_bits=(30, 30, 30, 30))
    enc = h.encoder
    scale = 2.0 ** 25
    lower = h.context.first_context_data().next.parms_id
    v = RNG.uniform(-1, 1, enc.slot_count)
    pt = enc.encode(v, parms_id=lower, scale=scale)
    assert pt.parms_id == lower
    ct = h.encryptor.encrypt_asymmetric(pt)
    np.testing.assert_allclose(h.decrypt(ct), v, atol=1e-4)


class TestQualifiers:
    """EncryptionParameterQualifiers parity (ref: encryption_parameters.h:277,
    context_data.h:61, he_context.h:97)."""

    def test_bfv_batching_flags(self):
        from tests.core.fixtures import GeneralHeContext
        from troy_tpu.core.coeff_modulus import SecurityLevel

        g = GeneralHeContext("BFV", 64, log_t=20, q_bits=(30, 30, 30))
        q = g.context.first_context_data().qualifiers
        assert g.context.parameters_set()
        assert q.parameters_set()
        assert q.using_ntt and q.using_fft
        assert q.using_batching           # PlainModulus.batching => SIMD
        assert q.using_fast_plain_lift    # 30-bit primes > 20-bit t
        assert q.security_level == SecurityLevel.Nil

    def test_ckks_batching_always_on(self):
        from tests.core.fixtures import GeneralHeContext

        g = GeneralHeContext("CKKS", 64, q_bits=(30, 30))
        assert g.context.first_context_data().qualifiers.using_batching

    def test_security_level_recorded(self):
        import numpy as np
        from troy_tpu.core.params import EncryptionParameters, SchemeType
        from troy_tpu.core.context import HeContext
        from troy_tpu.core.coeff_modulus import (CoeffModulus, PlainModulus,
                                                 SecurityLevel)

        parms = EncryptionParameters(SchemeType.BFV)
        parms.set_poly_modulus_degree(4096)
        parms.set_coeff_modulus(CoeffModulus.create(4096, [30, 30, 30]))
        parms.set_plain_modulus(PlainModulus.batching(4096, 20))
        ctx = HeContext.create(parms, True, SecurityLevel.Classical128)
        q = ctx.key_context_data().qualifiers if hasattr(ctx, "key_context_data") \
            else ctx.get_context_data(ctx.key_parms_id).qualifiers
        assert q.security_level == SecurityLevel.Classical128
