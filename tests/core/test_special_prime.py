"""Special-prime-for-encryption tests (mirrors reference
test/special_prime_for_encryption.cu): encrypt at key level, divide by the
special prime — fresh noise budget improves."""

import numpy as np

from troy_tpu.core.params import EncryptionParameters, SchemeType
from troy_tpu.core.context import HeContext
from troy_tpu.core.coeff_modulus import CoeffModulus, PlainModulus, SecurityLevel
from troy_tpu.core.keygen import KeyGenerator
from troy_tpu.core.encryptor import Encryptor
from troy_tpu.core.decryptor import Decryptor
from troy_tpu.core.evaluator import Evaluator
from troy_tpu.core.batch_encoder import BatchEncoder
from troy_tpu.core.ckks_encoder import CKKSEncoder

RNG = np.random.default_rng(808)
N = 64


def build(scheme, special):
    parms = EncryptionParameters(scheme)
    parms.set_poly_modulus_degree(N)
    parms.set_coeff_modulus(CoeffModulus.create(N, [30, 30, 30, 30]))
    if scheme != SchemeType.CKKS:
        parms.set_plain_modulus(PlainModulus.batching(N, 20))
    parms.set_use_special_prime_for_encryption(special)
    ctx = HeContext.create(parms, True, SecurityLevel.Nil, 9)
    kg = KeyGenerator(ctx)
    enc = Encryptor(ctx, pk=kg.create_public_key(), sk=kg.secret_key)
    dec = Decryptor(ctx, kg.secret_key)
    return ctx, kg, enc, dec


def test_bfv_special_prime_roundtrip_and_noise():
    ctx, kg, enc, dec = build(SchemeType.BFV, True)
    be = BatchEncoder(ctx)
    t = ctx.first_context_data().parms.plain_modulus.value
    m = RNG.integers(0, t, N, dtype=np.uint64)
    for method in ("encrypt_asymmetric", "encrypt_symmetric"):
        ct = getattr(enc, method)(be.encode(m))
        assert ct.parms_id == ctx.first_parms_id
        np.testing.assert_array_equal(be.decode(dec.decrypt(ct)), m)
    # noise advantage vs plain encryption, measured on zero encryptions
    # (message scale-up rounding floors the budget otherwise)
    ctx2, kg2, enc2, dec2 = build(SchemeType.BFV, False)
    # with 30-bit limbs the division rounding noise (~n/2) is the same order
    # as the CBD encryption noise, so the budget gain is small but must not
    # be negative
    b_plain = dec2.invariant_noise_budget(enc2.encrypt_zero_asymmetric())
    b_special = dec.invariant_noise_budget(enc.encrypt_zero_asymmetric())
    assert b_special >= b_plain, (b_special, b_plain)


def test_bgv_special_prime():
    ctx, kg, enc, dec = build(SchemeType.BGV, True)
    be = BatchEncoder(ctx)
    t = ctx.first_context_data().parms.plain_modulus.value
    m = RNG.integers(0, t, N, dtype=np.uint64)
    ct = enc.encrypt_asymmetric(be.encode(m))
    assert ct.correction_factor != 1
    np.testing.assert_array_equal(be.decode(dec.decrypt(ct)), m)


def test_ckks_special_prime():
    ctx, kg, enc, dec = build(SchemeType.CKKS, True)
    ce = CKKSEncoder(ctx)
    scale = 2.0 ** 25
    v = RNG.uniform(-1, 1, ce.slot_count) + 1j * RNG.uniform(-1, 1, ce.slot_count)
    ct = enc.encrypt_asymmetric(ce.encode(v, scale=scale))
    out = ce.decode(dec.decrypt(ct))
    np.testing.assert_allclose(out, v, atol=1e-4)
