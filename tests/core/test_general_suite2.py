"""Second cross-scheme operator suite: pre-transformed plaintext operands,
NAF multi-step rotation, exponentiate, square-vs-multiply identity
(mirrors reference test/evaluator.cu scenarios not covered by
test_general_suite.py)."""

import numpy as np
import pytest

from .fixtures import GeneralHeContext

RNG = np.random.default_rng(60606)
SCHEMES = ["BFV", "BGV", "CKKS"]
SCALE = 2.0 ** 25

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


def enc(h, v):
    return h.encryptor.encrypt_asymmetric(encode(h, v))


def dec(h, ct):
    if h.scheme.name == "CKKS":
        return h.encoder.decode(h.decryptor.decrypt(ct))
    return h.decrypt(ct)


def check(h, got, want, atol=2e-3, msg=""):
    if h.scheme.name == "CKKS":
        np.testing.assert_allclose(got, want, atol=atol, err_msg=msg)
    else:
        np.testing.assert_array_equal(
            got, np.mod(want, h.t).astype(np.uint64), err_msg=msg)


@pytest.mark.parametrize("scheme", SCHEMES)
def test_multiply_plain_ntt_form_operand(scheme):
    """A plaintext pre-transformed to NTT/RNS operand form must multiply
    identically to the mod-t form (ref: multiply_plain_ntt path)."""
    h = ctx(scheme)
    v1, v2 = rand_msg(h), rand_msg(h)
    ct = enc(h, v1)
    pt = encode(h, v2)
    want_ct = h.evaluator.multiply_plain(ct, pt)
    if scheme == "CKKS":
        pre = pt  # already RNS NTT form
    else:
        pre = h.evaluator.transform_plain_to_ntt(pt, ct.parms_id)
        if not ct.is_ntt_form:
            pass  # BFV ct is coeff form; multiply_plain handles the mix
    got_ct = h.evaluator.multiply_plain(ct, pre)
    check(h, dec(h, got_ct), np.asarray(dec(h, want_ct)), atol=5e-3)


@pytest.mark.parametrize("scheme", SCHEMES)
def test_add_plain_rns_form_operand(scheme):
    """add_plain with a scale-up / NTT RNS-form plaintext
    (ref: evaluator_translate.cu add_plain RNS branches)."""
    h = ctx(scheme)
    v1, v2 = rand_msg(h), rand_msg(h)
    ct = enc(h, v1)
    pt = encode(h, v2)
    if scheme == "BFV":
        pre = h.evaluator.bfv_scale_up(pt, ct.parms_id)
    elif scheme == "BGV":
        pre = pt  # mod-t path is canonical for BGV adds
    else:
        pre = pt
    got = dec(h, h.evaluator.add_plain(ct, pre))
    if scheme == "CKKS":
        check(h, got, v1 + v2)
    else:
        check(h, got, v1.astype(np.int64) + v2)


@pytest.mark.parametrize("scheme", SCHEMES)
def test_rotation_naf_multi_step(scheme):
    """step=3 with only power-of-two keys exercises the NAF decomposition
    (ref: evaluator_keyswitching.cu:276 rotate_internal)."""
    h = ctx(scheme)
    v = rand_msg(h)
    ct = enc(h, v)
    if scheme == "CKKS":
        out = dec(h, h.evaluator.rotate_vector(ct, 3, h._glk))
        want = np.roll(v, -3)
        np.testing.assert_allclose(out, want, atol=2e-3)
    else:
        out = dec(h, h.evaluator.rotate_rows(ct, 3, h._glk))
        half = h.n // 2
        want = np.concatenate([np.roll(v[:half], -3), np.roll(v[half:], -3)])
        np.testing.assert_array_equal(out, want)


@pytest.mark.parametrize("scheme", SCHEMES)
@pytest.mark.parametrize("power", [3, 4])
def test_exponentiate(scheme, power):
    h = ctx(scheme)
    if scheme == "CKKS":
        v = RNG.uniform(0.5, 1.0, h.encoder.slot_count)  # keep scale sane
    else:
        v = rand_msg(h)
    ct = enc(h, v)
    out = h.evaluator.exponentiate(ct, power, h._rlk)
    if scheme == "CKKS":
        got = dec(h, out)
        np.testing.assert_allclose(got.real, v ** power, atol=0.1)
    else:
        want = v.astype(object)
        for _ in range(power - 1):
            want = want * v % h.t
        np.testing.assert_array_equal(dec(h, out).astype(object), want)


@pytest.mark.parametrize("scheme", SCHEMES)
def test_square_matches_multiply(scheme):
    h = ctx(scheme)
    v = rand_msg(h)
    ct = enc(h, v)
    sq = h.evaluator.square(ct)
    mul = h.evaluator.multiply(ct, ct)
    got_s, got_m = dec(h, h.evaluator.relinearize(sq, h._rlk)), \
        dec(h, h.evaluator.relinearize(mul, h._rlk))
    if scheme == "CKKS":
        np.testing.assert_allclose(got_s, got_m, atol=1e-9)
    else:
        np.testing.assert_array_equal(got_s, got_m)
