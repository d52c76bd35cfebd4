"""BatchEncoder RNS-form conversions + noise-budget behavior
(mirrors reference test/batch_encoder.cu ScaleUpDown /
CentralizeDecentralize and test/encryptor.cu InvariantNoiseBudget)."""

import numpy as np
import pytest

from .fixtures import GeneralHeContext

RNG = np.random.default_rng(5150)


@pytest.mark.parametrize("q_bits", [(30, 30, 30), (40, 40, 40)],
                         ids=["fast", "wide"])
def test_scale_up_down_roundtrip(q_bits):
    h = GeneralHeContext("BFV", 32, log_t=20, q_bits=q_bits)
    m = h.random_simd(RNG)
    pt = h.encoder.encode(m)
    up = h.encoder.scale_up(pt)
    assert up.parms_id == h.context.first_parms_id
    np.testing.assert_array_equal(h.encoder.decode(h.encoder.scale_down(up)), m)


@pytest.mark.parametrize("q_bits", [(30, 30, 30), (40, 40, 40)],
                         ids=["fast", "wide"])
def test_centralize_decentralize_roundtrip(q_bits):
    h = GeneralHeContext("BFV", 32, log_t=20, q_bits=q_bits)
    m = h.random_simd(RNG)
    pt = h.encoder.encode(m)
    cen = h.encoder.centralize(pt)
    np.testing.assert_array_equal(
        h.encoder.decode(h.encoder.decentralize(cen)), m)


def test_scale_up_matches_encrypt_form():
    """scale_up output adds to a zero encryption like a fresh encrypt
    (ref: the encrypt pipeline uses the same scaling variant)."""
    h = GeneralHeContext("BFV", 32, log_t=20, q_bits=(30, 30, 30))
    m = h.random_simd(RNG)
    up = h.encoder.scale_up(h.encoder.encode(m))
    z = h.encryptor.encrypt_zero_asymmetric()
    ct = h.evaluator.add_plain(z, h.encoder.encode(m))
    np.testing.assert_array_equal(h.decrypt(ct), m)
    # and the pre-scaled form must agree
    ct2 = h.evaluator.add_plain(z, up)
    np.testing.assert_array_equal(h.decrypt(ct2), m)


@pytest.mark.parametrize("scheme", ["BFV", "BGV"])
def test_noise_budget_decreases_with_depth(scheme):
    """(ref: encryptor.cu InvariantNoiseBudget; budget shrinks per mul)"""
    h = GeneralHeContext(scheme, 32, log_t=20, q_bits=(30,) * 5)
    m = h.random_simd(RNG)
    ct = h.encrypt(m)
    b0 = h.decryptor.invariant_noise_budget(ct)
    assert b0 > 10
    rlk = h.keygen.create_relin_keys()
    sq = h.evaluator.relinearize(h.evaluator.multiply(ct, ct), rlk)
    b1 = h.decryptor.invariant_noise_budget(sq)
    assert 0 < b1 < b0
    np.testing.assert_array_equal(h.decrypt(sq), m * m % h.t)


def test_noise_budget_additive_ops_cheap():
    """Adds cost at most a couple budget bits (ref: noise analysis)."""
    h = GeneralHeContext("BFV", 32, log_t=20, q_bits=(30, 30, 30))
    m = h.random_simd(RNG)
    ct = h.encrypt(m)
    b0 = h.decryptor.invariant_noise_budget(ct)
    acc = ct
    for _ in range(4):
        acc = h.evaluator.add(acc, ct)
    b1 = h.decryptor.invariant_noise_budget(acc)
    assert b1 >= b0 - 4


def test_noise_budget_exhaustion_detectable():
    """A too-shallow chain runs out of budget; the budget reports 0."""
    h = GeneralHeContext("BFV", 32, log_t=26, q_bits=(30, 30, 30))
    rlk = h.keygen.create_relin_keys()
    m = h.random_simd(RNG)
    ct = h.encrypt(m)
    for _ in range(3):
        ct = h.evaluator.relinearize(h.evaluator.multiply(ct, ct), rlk)
    assert h.decryptor.invariant_noise_budget(ct) == 0
