"""Operations on ciphertexts encrypted in special-prime-for-encryption mode
(mirrors reference test/special_prime_for_encryption.cu: Encrypt / Multiply /
Relinearize per scheme; the Host/Device split collapses to the one JAX
path).  Complements tests/core/test_special_prime.py's roundtrip+noise
checks with the homomorphic-op matrix."""

import numpy as np
import pytest

from troy_tpu.core.params import EncryptionParameters, SchemeType
from troy_tpu.core.context import HeContext
from troy_tpu.core.coeff_modulus import CoeffModulus, PlainModulus, SecurityLevel
from troy_tpu.core.keygen import KeyGenerator
from troy_tpu.core.encryptor import Encryptor
from troy_tpu.core.decryptor import Decryptor
from troy_tpu.core.evaluator import Evaluator
from troy_tpu.core.batch_encoder import BatchEncoder
from troy_tpu.core.ckks_encoder import CKKSEncoder

RNG = np.random.default_rng(818)
N = 64
SCALE = 2.0 ** 30

_cache = {}


def build(scheme_name):
    if scheme_name in _cache:
        return _cache[scheme_name]
    scheme = getattr(SchemeType, scheme_name)
    parms = EncryptionParameters(scheme)
    parms.set_poly_modulus_degree(N)
    parms.set_coeff_modulus(CoeffModulus.create(N, [30, 30, 30, 30]))
    if scheme != SchemeType.CKKS:
        parms.set_plain_modulus(PlainModulus.batching(N, 20))
    parms.set_use_special_prime_for_encryption(True)
    ctx = HeContext.create(parms, True, SecurityLevel.Nil, 9)
    kg = KeyGenerator(ctx)

    class H:
        pass

    h = H()
    h.ctx = ctx
    h.kg = kg
    h.enc = Encryptor(ctx, pk=kg.create_public_key(), sk=kg.secret_key)
    h.dec = Decryptor(ctx, kg.secret_key)
    h.ev = Evaluator(ctx)
    h.rlk = kg.create_relin_keys()
    if scheme == SchemeType.CKKS:
        h.encoder = CKKSEncoder(ctx)
        h.t = None
    else:
        h.encoder = BatchEncoder(ctx)
        h.t = ctx.first_context_data().parms.plain_modulus.value
    _cache[scheme_name] = h
    return h


def rand_msg(h):
    if h.t is None:
        n2 = h.encoder.slot_count
        return RNG.uniform(-1, 1, n2) + 1j * RNG.uniform(-1, 1, n2)
    return RNG.integers(0, h.t, N, dtype=np.uint64)


def encode(h, v):
    if h.t is None:
        return h.encoder.encode(v, scale=SCALE)
    return h.encoder.encode(v)


def decode(h, pt):
    if h.t is None:
        return h.encoder.decode(pt)
    return h.encoder.decode(pt)


def check(h, got, want, atol=1e-4):
    if h.t is None:
        np.testing.assert_allclose(got, want, atol=atol)
    else:
        want = np.mod(want.astype(object), h.t).astype(np.uint64)
        np.testing.assert_array_equal(np.asarray(got, np.uint64), want)


@pytest.mark.parametrize("scheme", ["BFV", "BGV", "CKKS"])
@pytest.mark.parametrize("asym", [True, False])
def test_special_prime_encrypt(scheme, asym):
    h = build(scheme)
    v = rand_msg(h)
    method = h.enc.encrypt_asymmetric if asym else h.enc.encrypt_symmetric
    ct = method(encode(h, v))
    assert ct.parms_id == h.ctx.first_parms_id
    check(h, decode(h, h.dec.decrypt(ct)), v)


@pytest.mark.parametrize("scheme", ["BFV", "BGV", "CKKS"])
def test_special_prime_multiply(scheme):
    h = build(scheme)
    v1, v2 = rand_msg(h), rand_msg(h)
    c1 = h.enc.encrypt_asymmetric(encode(h, v1))
    c2 = h.enc.encrypt_asymmetric(encode(h, v2))
    prod = h.ev.multiply(c1, c2)
    assert prod.size == 3
    want = v1 * v2 if h.t is None else v1.astype(object) * v2.astype(object)
    check(h, decode(h, h.dec.decrypt(prod)), np.asarray(want), atol=1e-3)


@pytest.mark.parametrize("scheme", ["BFV", "BGV", "CKKS"])
def test_special_prime_relinearize(scheme):
    h = build(scheme)
    v1, v2 = rand_msg(h), rand_msg(h)
    c1 = h.enc.encrypt_asymmetric(encode(h, v1))
    c2 = h.enc.encrypt_asymmetric(encode(h, v2))
    rel = h.ev.relinearize(h.ev.multiply(c1, c2), h.rlk)
    assert rel.size == 2
    want = v1 * v2 if h.t is None else v1.astype(object) * v2.astype(object)
    check(h, decode(h, h.dec.decrypt(rel)), np.asarray(want), atol=1e-3)


@pytest.mark.parametrize("scheme", ["BFV", "BGV"])
def test_special_prime_add_and_plain_ops(scheme):
    h = build(scheme)
    v1, v2 = rand_msg(h), rand_msg(h)
    c1 = h.enc.encrypt_asymmetric(encode(h, v1))
    c2 = h.enc.encrypt_asymmetric(encode(h, v2))
    check(h, decode(h, h.dec.decrypt(h.ev.add(c1, c2))),
          v1.astype(object) + v2.astype(object))
    check(h, decode(h, h.dec.decrypt(h.ev.add_plain(c1, encode(h, v2)))),
          v1.astype(object) + v2.astype(object))
    check(h, decode(h, h.dec.decrypt(h.ev.multiply_plain(c1, encode(h, v2)))),
          v1.astype(object) * v2.astype(object))


def test_special_prime_symmetric_seed_roundtrip():
    """Seed-compressed symmetric ciphertexts must regenerate c1 with the
    special-prime layout intact (ref rlwe.cu special-prime + seed path)."""
    from troy_tpu.utils import serialize as S

    h = build("BFV")
    v = rand_msg(h)
    ct = h.enc.encrypt_symmetric(encode(h, v), save_seed=True)
    blob = S.save_ciphertext(ct, h.ctx)
    ct2 = S.load_ciphertext(blob, h.ctx)
    check(h, decode(h, h.dec.decrypt(ct2)), v)
