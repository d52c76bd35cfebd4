"""Randomized op-sequence property tests: apply a random (seeded,
reproducible) sequence of homomorphic ops while tracking the expected
plaintext with Python-int / complex oracles, then decrypt once at the end.
Catches cross-op interaction bugs (correction factors, scale bookkeeping,
form transitions) that single-op tests cannot."""

import numpy as np
import pytest

from tests.core.fixtures import GeneralHeContext

SCALE = 2.0 ** 30
STEPS = 12

_ctx = {}


def ctx(scheme, wide):
    key = (scheme, wide)
    if key not in _ctx:
        q = (60, 40, 40, 60) if wide else (30, 30, 30, 30)
        h = GeneralHeContext(scheme, 32, log_t=20, q_bits=q, scale=SCALE)
        h._rlk = h.keygen.create_relin_keys()
        _ctx[key] = h
    return _ctx[key]


def run_sequence(scheme, wide, seed):
    h = ctx(scheme, wide)
    rng = np.random.default_rng(seed)
    ev = h.evaluator
    is_ckks = scheme == "CKKS"

    def rand_msg():
        if is_ckks:
            n2 = h.encoder.slot_count
            return rng.uniform(-1, 1, n2) + 1j * rng.uniform(-1, 1, n2)
        return h.random_simd(rng).astype(object)

    def encrypt(v, scale=SCALE):
        pt = (h.encoder.encode(v, scale=scale) if is_ckks
              else h.encoder.encode(v.astype(np.uint64)))
        return h.encryptor.encrypt_asymmetric(pt)

    v = rand_msg()
    ct = encrypt(v)
    mults = 0
    # ops valid at any point; multiply limited by the modulus budget
    for _ in range(STEPS):
        op = rng.choice(["add", "sub", "negate", "add_plain", "mul_plain",
                         "multiply"])
        cur_scale = ct.scale if is_ckks else SCALE
        if op == "add":
            w = rand_msg()
            ct = ev.add(ct, encrypt(w, cur_scale))
            v = v + w
        elif op == "sub":
            w = rand_msg()
            ct = ev.sub(ct, encrypt(w, cur_scale))
            v = v - w
        elif op == "negate":
            ct = ev.negate(ct)
            v = -v
        elif op == "add_plain":
            w = rand_msg()
            if is_ckks:
                ct = ev.add_plain(ct, h.encoder.encode(w, scale=cur_scale))
            else:
                ct = ev.add_plain(ct, h.encoder.encode(w.astype(np.uint64)))
            v = v + w
        elif op == "mul_plain" and mults < 1:
            w = rand_msg()
            if is_ckks:
                ct = ev.multiply_plain(ct, h.encoder.encode(w, scale=SCALE))
            else:
                ct = ev.multiply_plain(ct, h.encoder.encode(w.astype(np.uint64)))
            v = v * w
            mults += 1
        elif op == "multiply" and mults < 1:
            w = rand_msg()
            ct = ev.relinearize(ev.multiply(ct, encrypt(w, SCALE)), h._rlk)
            v = v * w
            mults += 1
    got = h.encoder.decode(h.decryptor.decrypt(ct))
    if is_ckks:
        np.testing.assert_allclose(got, v, atol=2e-2)
    else:
        want = np.mod(v, h.t).astype(np.uint64)
        np.testing.assert_array_equal(np.asarray(got, np.uint64), want)


@pytest.mark.parametrize("seed", [1, 2, 3])
@pytest.mark.parametrize("scheme", ["BFV", "BGV", "CKKS"])
def test_fuzz_fast(scheme, seed):
    run_sequence(scheme, wide=False, seed=seed)


@pytest.mark.parametrize("seed", [1])
@pytest.mark.parametrize("scheme", ["BFV", "BGV", "CKKS"])
def test_fuzz_wide(scheme, seed):
    run_sequence(scheme, wide=True, seed=seed)
