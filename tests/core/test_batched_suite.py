"""Cross-scheme batched-operator suite (mirrors reference
test/evaluator_batched.cu + encryptor_batched.cu: every batched API must
agree with the scalar path element by element, for BFV, BGV and CKKS)."""

import numpy as np
import pytest

from .fixtures import GeneralHeContext

RNG = np.random.default_rng(112233)
SCHEMES = ("BFV", "BGV", "CKKS")
SCALE = 2.0 ** 25
B = 3

_cache = {}


def ctx(scheme):
    if scheme not in _cache:
        h = GeneralHeContext(scheme, 32, log_t=20, q_bits=(30,) * 5,
                             scale=SCALE)
        h._rlk = h.keygen.create_relin_keys()
        h._glk = h.keygen.create_galois_keys()
        _cache[scheme] = h
    return _cache[scheme]


def rand_msg(h):
    if h.scheme.name == "CKKS":
        n2 = h.encoder.slot_count
        return RNG.uniform(-1, 1, n2) + 1j * RNG.uniform(-1, 1, n2)
    return h.random_simd(RNG)


def encode(h, v):
    if h.scheme.name == "CKKS":
        return h.encoder.encode(v, scale=SCALE)
    return h.encoder.encode(v)


def dec(h, ct):
    if h.scheme.name == "CKKS":
        return h.encoder.decode(h.decryptor.decrypt(ct))
    return h.decrypt(ct)


def assert_matches_scalar(h, batched_cts, scalar_cts):
    """Batched path must agree with the scalar path bit-for-bit on the
    decrypted values (same kernels, same math)."""
    for b, s in zip(batched_cts, scalar_cts):
        got, want = dec(h, b), dec(h, s)
        if h.scheme.name == "CKKS":
            np.testing.assert_allclose(got, want, atol=1e-9)
        else:
            np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("scheme", SCHEMES)
@pytest.mark.parametrize("asym", (True, False))
def test_encrypt_decrypt_batched(scheme, asym):
    """(ref: encryptor_batched.cu test_suite)"""
    h = ctx(scheme)
    ms = [rand_msg(h) for _ in range(B)]
    pts = [encode(h, m) for m in ms]
    cts = (h.encryptor.encrypt_asymmetric_batched(pts) if asym
           else h.encryptor.encrypt_symmetric_batched(pts))
    outs = h.decryptor.decrypt_batched(cts)
    for out, m in zip(outs, ms):
        got = h.encoder.decode(out)
        if scheme == "CKKS":
            np.testing.assert_allclose(got, m, atol=2e-3)
        else:
            np.testing.assert_array_equal(got, m)


@pytest.mark.parametrize("scheme", SCHEMES)
def test_translate_batched_suite(scheme):
    h = ctx(scheme)
    ms1 = [rand_msg(h) for _ in range(B)]
    ms2 = [rand_msg(h) for _ in range(B)]
    cts1 = [h.encryptor.encrypt_asymmetric(encode(h, m)) for m in ms1]
    cts2 = [h.encryptor.encrypt_asymmetric(encode(h, m)) for m in ms2]
    assert_matches_scalar(
        h, h.evaluator.add_batched(cts1, cts2),
        [h.evaluator.add(a, b) for a, b in zip(cts1, cts2)])
    assert_matches_scalar(
        h, h.evaluator.sub_batched(cts1, cts2),
        [h.evaluator.sub(a, b) for a, b in zip(cts1, cts2)])
    assert_matches_scalar(
        h, h.evaluator.negate_batched(cts1),
        [h.evaluator.negate(a) for a in cts1])


@pytest.mark.parametrize("scheme", SCHEMES)
def test_multiply_relinearize_batched_suite(scheme):
    h = ctx(scheme)
    ms1 = [rand_msg(h) for _ in range(B)]
    ms2 = [rand_msg(h) for _ in range(B)]
    cts1 = [h.encryptor.encrypt_asymmetric(encode(h, m)) for m in ms1]
    cts2 = [h.encryptor.encrypt_asymmetric(encode(h, m)) for m in ms2]
    prods = h.evaluator.multiply_batched(cts1, cts2)
    scalar = [h.evaluator.multiply(a, b) for a, b in zip(cts1, cts2)]
    assert_matches_scalar(h, prods, scalar)
    assert_matches_scalar(
        h, h.evaluator.relinearize_batched(prods, h._rlk),
        [h.evaluator.relinearize(p, h._rlk) for p in scalar])


@pytest.mark.parametrize("scheme", SCHEMES)
def test_multiply_plain_batched_suite(scheme):
    h = ctx(scheme)
    ms1 = [rand_msg(h) for _ in range(B)]
    ms2 = [rand_msg(h) for _ in range(B)]
    cts = [h.encryptor.encrypt_asymmetric(encode(h, m)) for m in ms1]
    pts = [encode(h, m) for m in ms2]
    assert_matches_scalar(
        h, h.evaluator.multiply_plain_batched(cts, pts),
        [h.evaluator.multiply_plain(c, p) for c, p in zip(cts, pts)])


@pytest.mark.parametrize("scheme", SCHEMES)
def test_rotation_batched_suite(scheme):
    h = ctx(scheme)
    ms = [rand_msg(h) for _ in range(B)]
    cts = [h.encryptor.encrypt_asymmetric(encode(h, m)) for m in ms]
    if scheme == "CKKS":
        batched = h.evaluator.rotate_vector_batched(cts, 2, h._glk)
        scalar = [h.evaluator.rotate_vector(c, 2, h._glk) for c in cts]
    else:
        batched = h.evaluator.rotate_rows_batched(cts, 2, h._glk)
        scalar = [h.evaluator.rotate_rows(c, 2, h._glk) for c in cts]
    assert_matches_scalar(h, batched, scalar)
    if scheme == "CKKS":
        batched = h.evaluator.complex_conjugate_batched(cts, h._glk)
        scalar = [h.evaluator.complex_conjugate(c, h._glk) for c in cts]
    else:
        batched = h.evaluator.rotate_columns_batched(cts, h._glk)
        scalar = [h.evaluator.rotate_columns(c, h._glk) for c in cts]
    assert_matches_scalar(h, batched, scalar)


@pytest.mark.parametrize("scheme", SCHEMES)
def test_mod_switch_batched_suite(scheme):
    h = ctx(scheme)
    ms = [rand_msg(h) for _ in range(B)]
    cts = [h.encryptor.encrypt_asymmetric(encode(h, m)) for m in ms]
    assert_matches_scalar(
        h, h.evaluator.mod_switch_to_next_batched(cts),
        [h.evaluator.mod_switch_to_next(c) for c in cts])


@pytest.mark.parametrize("scheme", SCHEMES)
def test_ntt_transform_batched_suite(scheme):
    h = ctx(scheme)
    ms = [rand_msg(h) for _ in range(B)]
    cts = [h.encryptor.encrypt_asymmetric(encode(h, m)) for m in ms]
    if scheme == "BFV":  # coeff-form native: to NTT then back
        fwd = h.evaluator.transform_to_ntt_batched(cts)
        scalar = [h.evaluator.transform_to_ntt(c) for c in cts]
        back = h.evaluator.transform_from_ntt_batched(fwd)
    else:  # NTT-form native: from NTT then back
        inv = h.evaluator.transform_from_ntt_batched(cts)
        scalar = [h.evaluator.transform_from_ntt(c) for c in cts]
        back = h.evaluator.transform_to_ntt_batched(inv)
        assert_matches_scalar(h, inv, scalar)
    assert_matches_scalar(h, back, cts)
