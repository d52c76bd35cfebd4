"""Parametrized cross-scheme operator suite (mirrors the reference's
test_adv.h GeneralHeContext pattern: one test body instantiated over
BFV x BGV x CKKS and asymmetric x symmetric encryption,
test/evaluator.cu:47-98)."""

import numpy as np
import pytest

from .fixtures import GeneralHeContext

RNG = np.random.default_rng(90210)
SCHEMES = ["BFV", "BGV", "CKKS"]
SCALE = 2.0 ** 25

_ctx_cache = {}


def ctx(scheme):
    if scheme not in _ctx_cache:
        _ctx_cache[scheme] = GeneralHeContext(
            scheme, 32, log_t=20, q_bits=(30,) * 5, scale=SCALE)
        _ctx_cache[scheme]._rlk = _ctx_cache[scheme].keygen.create_relin_keys()
    return _ctx_cache[scheme]


def rand_msg(h):
    if h.scheme.name == "CKKS":
        n2 = h.encoder.slot_count
        return RNG.uniform(-1, 1, n2) + 1j * RNG.uniform(-1, 1, n2)
    return h.random_simd(RNG)


def enc(h, v, asym=True):
    if h.scheme.name == "CKKS":
        pt = h.encoder.encode(v, scale=SCALE)
        return (h.encryptor.encrypt_asymmetric(pt) if asym
                else h.encryptor.encrypt_symmetric(pt))
    return h.encrypt(v, asym=asym)


def dec(h, ct):
    if h.scheme.name == "CKKS":
        return h.encoder.decode(h.decryptor.decrypt(ct))
    return h.decrypt(ct)


def check(h, got, want, msg=""):
    if h.scheme.name == "CKKS":
        np.testing.assert_allclose(got, want, atol=2e-3, err_msg=msg)
    else:
        want = np.mod(want, h.t)
        np.testing.assert_array_equal(got, want.astype(np.uint64), err_msg=msg)


@pytest.mark.parametrize("scheme", SCHEMES)
@pytest.mark.parametrize("asym", [True, False])
def test_encrypt_decrypt(scheme, asym):
    h = ctx(scheme)
    v = rand_msg(h)
    check(h, dec(h, enc(h, v, asym)), v)


@pytest.mark.parametrize("scheme", SCHEMES)
def test_negate(scheme):
    h = ctx(scheme)
    v = rand_msg(h)
    check(h, dec(h, h.evaluator.negate(enc(h, v))),
          -v if scheme == "CKKS" else (h.t - v.astype(np.int64)))


@pytest.mark.parametrize("scheme", SCHEMES)
def test_add_sub(scheme):
    h = ctx(scheme)
    v1, v2 = rand_msg(h), rand_msg(h)
    c1, c2 = enc(h, v1), enc(h, v2)
    check(h, dec(h, h.evaluator.add(c1, c2)), v1.astype(np.int64) + v2
          if scheme != "CKKS" else v1 + v2)
    check(h, dec(h, h.evaluator.sub(c1, c2)), v1.astype(np.int64) - v2.astype(np.int64)
          if scheme != "CKKS" else v1 - v2)


@pytest.mark.parametrize("scheme", SCHEMES)
def test_multiply_relinearize(scheme):
    h = ctx(scheme)
    v1, v2 = rand_msg(h), rand_msg(h)
    prod = h.evaluator.multiply(enc(h, v1), enc(h, v2))
    want = (v1.astype(np.int64) * v2.astype(np.int64)
            if scheme != "CKKS" else v1 * v2)
    check(h, dec(h, prod), want, "size-3")
    rel = h.evaluator.relinearize(prod, h._rlk)
    check(h, dec(h, rel), want, "relinearized")


@pytest.mark.parametrize("scheme", SCHEMES)
def test_square(scheme):
    h = ctx(scheme)
    v = rand_msg(h)
    want = v.astype(np.int64) ** 2 if scheme != "CKKS" else v * v
    check(h, dec(h, h.evaluator.square(enc(h, v))), want)


@pytest.mark.parametrize("scheme", SCHEMES)
def test_add_sub_multiply_plain(scheme):
    h = ctx(scheme)
    v1, v2 = rand_msg(h), rand_msg(h)
    c1 = enc(h, v1)
    pt2 = (h.encoder.encode(v2, scale=SCALE) if scheme == "CKKS"
           else h.encoder.encode(v2))
    check(h, dec(h, h.evaluator.add_plain(c1, pt2)),
          v1.astype(np.int64) + v2 if scheme != "CKKS" else v1 + v2)
    check(h, dec(h, h.evaluator.sub_plain(c1, pt2)),
          v1.astype(np.int64) - v2.astype(np.int64) if scheme != "CKKS" else v1 - v2)
    prod = h.evaluator.multiply_plain(c1, pt2)
    want = (v1.astype(np.int64) * v2.astype(np.int64)
            if scheme != "CKKS" else v1 * v2)
    if scheme == "CKKS":
        np.testing.assert_allclose(dec(h, prod), want, atol=5e-3)
    else:
        check(h, dec(h, prod), want)


@pytest.mark.parametrize("scheme", SCHEMES)
def test_mod_switch(scheme):
    h = ctx(scheme)
    v = rand_msg(h)
    down = h.evaluator.mod_switch_to_next(enc(h, v))
    assert down.coeff_modulus_size == 3
    check(h, dec(h, down), v)


@pytest.mark.parametrize("scheme", SCHEMES)
def test_transform_ntt_roundtrip_ct(scheme):
    h = ctx(scheme)
    v = rand_msg(h)
    ct = enc(h, v)
    if ct.is_ntt_form:
        rt = h.evaluator.transform_to_ntt(h.evaluator.transform_from_ntt(ct))
    else:
        rt = h.evaluator.transform_from_ntt(h.evaluator.transform_to_ntt(ct))
    check(h, dec(h, rt), v)


@pytest.mark.parametrize("scheme", SCHEMES)
def test_serialize_roundtrip(scheme):
    from troy_tpu.utils import serialize as S

    h = ctx(scheme)
    v = rand_msg(h)
    ct = enc(h, v)
    back = S.load_ciphertext(S.save_ciphertext(ct, h.context), h.context)
    check(h, dec(h, back), v)
