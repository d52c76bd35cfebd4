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
        # BGV correction-factor balancing scales ciphertext noise by up to
        # t (~2^20, matching the reference's balance_correction_factors), so
        # its random sequences need a deeper chain to stay within budget
        if wide:
            q = (60, 40, 40, 60)
        else:
            q = (30,) * (6 if scheme == "BGV" else 4)
        h = GeneralHeContext(scheme, 32, log_t=20, q_bits=q, scale=SCALE)
        h._rlk = h.keygen.create_relin_keys()
        h._glk = h.keygen.create_galois_keys_from_steps([1, 2, -1])
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

    def encrypt(v, scale=SCALE, pid=None):
        pt = (h.encoder.encode(v, scale=scale) if is_ckks
              else h.encoder.encode(v.astype(np.uint64)))
        c = h.encryptor.encrypt_asymmetric(pt)
        if pid is not None and c.parms_id != pid:
            c = ev.mod_switch_to(c, pid)
        return c

    v = rand_msg()
    ct = encrypt(v)
    mults = 0
    switches = 0

    def q_at(ct_):
        cd = h.context.get_context_data(ct_.parms_id)
        q = 1
        for m_ in cd.parms.coeff_modulus:
            q *= m_.value
        return q

    def scale_fits(new_scale):
        # phase |m|*scale must stay well under Q/2 at the ct's level
        return (not is_ckks) or new_scale * 64 < q_at(ct) / 2

    balances = [0]

    def balance_ok(other):
        # each BGV correction-factor balancing scales noise by up to t
        # (~2^20, ref balance_correction_factors): cap how many the random
        # walk may trigger so sequences stay inside the noise budget
        if scheme != "BGV" or ct.correction_factor == other.correction_factor:
            return True
        if balances[0] >= 2:
            return False
        balances[0] += 1
        return True
    # ops valid at any point; multiply limited by the modulus budget
    for _ in range(STEPS):
        op = rng.choice(["add", "sub", "negate", "add_plain", "mul_plain",
                         "multiply", "rotate", "mod_switch"])
        cur_scale = ct.scale if is_ckks else SCALE
        if op == "add":
            w = rand_msg()
            other = encrypt(w, cur_scale, ct.parms_id)
            if not balance_ok(other):
                continue
            ct = ev.add(ct, other)
            v = v + w
        elif op == "sub":
            w = rand_msg()
            other = encrypt(w, cur_scale, ct.parms_id)
            if not balance_ok(other):
                continue
            ct = ev.sub(ct, other)
            v = v - w
        elif op == "negate":
            ct = ev.negate(ct)
            v = -v
        elif op == "add_plain":
            w = rand_msg()
            if is_ckks:
                ct = ev.add_plain(ct, h.encoder.encode(
                    w, scale=cur_scale, parms_id=ct.parms_id))
            else:
                ct = ev.add_plain(ct, h.encoder.encode(w.astype(np.uint64)))
            v = v + w
        elif op == "mul_plain" and mults < 1 and scale_fits(cur_scale * SCALE):
            w = rand_msg()
            if is_ckks:
                ct = ev.multiply_plain(ct, h.encoder.encode(
                    w, scale=SCALE, parms_id=ct.parms_id))
            else:
                ct = ev.multiply_plain(ct, h.encoder.encode(w.astype(np.uint64)))
            v = v * w
            mults += 1
        elif op == "multiply" and mults < 1 and scale_fits(cur_scale * SCALE):
            w = rand_msg()
            ct = ev.relinearize(ev.multiply(ct, encrypt(w, SCALE, ct.parms_id)), h._rlk)
            v = v * w
            mults += 1
        elif op == "rotate":
            step = int(rng.choice([1, 2, -1]))
            if is_ckks:
                ct = ev.rotate_vector(ct, step, h._glk)
                v = np.roll(v, -step)
            else:
                ct = ev.rotate_rows(ct, step, h._glk)
                half = len(v) // 2
                grid = np.stack([v[:half], v[half:]])
                grid = np.roll(grid, -step, axis=1)
                v = np.concatenate([grid[0], grid[1]])
        elif op == "mod_switch" and switches < 1:
            cd = h.context.get_context_data(ct.parms_id)
            if cd.is_last():
                continue
            if is_ckks:
                # the dropped-limb modulus must still hold the phase:
                # |m|*scale + noise << Q_next/2 (else wraparound is expected
                # user error, not a library bug)
                q_next = 1
                for m_ in cd.next.parms.coeff_modulus:
                    q_next *= m_.value
                if ct.scale * 64 > q_next / 2:
                    continue
            ct = ev.mod_switch_to_next(ct)
            switches += 1
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
