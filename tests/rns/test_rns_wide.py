"""Wide-width (40-60-bit prime) BEHZ toolbox tests vs Python-int oracles —
the (hi, lo) u32-pair analogs of tests/rns/test_rns.py (reference
src/utils/rns_tool.cu at its native <=61-bit width, test/utils/rns_tool.cu)."""

import numpy as np
import jax.numpy as jnp

from troy_tpu.core.modulus import Modulus
from troy_tpu.utils import numth
from troy_tpu.rns.rns_base import RNSBase
from troy_tpu.rns.rns_tool64 import RNSTool64
from troy_tpu.rns.scaling import BFVScaler64

RNG = np.random.default_rng(6464)
LOG_N = 4
N = 1 << LOG_N


def make_base(bits, log_n=LOG_N):
    primes = []
    for b in bits:
        p = numth.get_primes(2 * (1 << log_n), b, len(bits) + 4)
        primes.append(next(q for q in p if q not in primes))
    return RNSBase([Modulus(p) for p in primes])


def to_pair(arr64: np.ndarray) -> jnp.ndarray:
    """(L, n) uint64 residues -> (2, L, n) u32 (hi, lo) pair array."""
    return jnp.stack([jnp.asarray((arr64 >> 32).astype(np.uint32)),
                      jnp.asarray((arr64 & 0xFFFFFFFF).astype(np.uint32))])


def from_pair(y: np.ndarray) -> np.ndarray:
    """(2, L, n) -> (L, n) object-int values (avoids uint64 wrap)."""
    return (y[0].astype(object) << 32) + y[1].astype(object)


def rand_ints(base, count):
    return [int.from_bytes(RNG.bytes(32), "little") % base.prod
            for _ in range(count)]


def test_wide_sm_mrq_centered_exact():
    base = make_base([60, 40, 50])
    tool = RNSTool64(LOG_N, base, Modulus(numth.get_prime(2 * N, 20)))
    values = rand_ints(base, N)
    x = to_pair(base.residues_host(values))
    y = from_pair(np.asarray(tool.fast_b_conv_m_tilde_sm_mrq(x)))
    Q = base.prod
    bsk = tool.base_Bsk
    composed = bsk.compose_array_host(y)
    for c, v in enumerate(values):
        Y = composed[c]
        if Y > bsk.prod // 2:
            Y -= bsk.prod
        assert Y in (v, v - Q, v + Q), (c, v, Y)


def test_wide_fast_floor_fast_b_conv_sk():
    base = make_base([60, 40, 50])
    tool = RNSTool64(LOG_N, base, Modulus(numth.get_prime(2 * N, 20)))
    Q = base.prod
    bound = min(tool.base_B.prod // 4, Q * Q // 16)
    values = [int.from_bytes(RNG.bytes(64), "little") % bound
              for _ in range(N)]
    w_q = to_pair(base.residues_host(values))
    w_bsk = to_pair(tool.base_Bsk.residues_host(values))
    y = from_pair(np.asarray(tool.fast_floor_fast_b_conv_sk(w_q, w_bsk)))
    for c, v in enumerate(values):
        floor = v // Q
        got = [int(y[i, c]) for i in range(base.size)]
        ok = any(
            all(g == (floor + e) % q for g, q in zip(got, base.values))
            for e in range(-(base.size + 1), base.size + 2)
        )
        assert ok, (c, v, floor, got)


def test_wide_divide_and_round_q_last():
    base = make_base([60, 40, 40, 60])
    tool = RNSTool64(LOG_N, base, Modulus(numth.get_prime(2 * N, 20)))
    values = rand_ints(base, N)
    x = to_pair(base.residues_host(values))
    y = from_pair(np.asarray(tool.divide_and_round_q_last(x)))
    q_last = base.values[-1]
    for c, v in enumerate(values):
        want = (v + q_last // 2) // q_last
        for i, q in enumerate(base.values[:-1]):
            assert int(y[i, c]) == want % q, (c, i)


def test_wide_decrypt_scale_and_round():
    base = make_base([60, 40, 50])
    t = Modulus(numth.get_prime(2 * N, 20))
    tool = RNSTool64(LOG_N, base, t)
    Q = base.prod
    delta = Q // t.value
    m = RNG.integers(0, t.value, size=N)
    v = [int.from_bytes(RNG.bytes(16), "little") % (delta // 2) - delta // 4
         for _ in range(N)]
    phase = [(int(m[i]) * delta + v[i]) % Q for i in range(N)]
    x = to_pair(base.residues_host(phase))
    got = np.asarray(tool.decrypt_scale_and_round(x))
    np.testing.assert_array_equal(np.asarray(got, np.uint64),
                                  m.astype(np.uint64))


def test_wide_decrypt_mod_t():
    base = make_base([60, 40, 50])
    t = Modulus(numth.get_prime(2 * N, 20))
    tool = RNSTool64(LOG_N, base, t)
    Q = base.prod
    e = RNG.integers(-(1 << 40), 1 << 40, size=N)
    m = RNG.integers(0, t.value, size=N)
    vals = [(int(m[i]) + t.value * int(e[i])) % Q for i in range(N)]
    x = to_pair(base.residues_host(vals))
    got = np.asarray(tool.decrypt_mod_t(x))
    np.testing.assert_array_equal(np.asarray(got, np.uint64),
                                  m.astype(np.uint64))


def test_wide_decrypt_mod_t_boundary_adversarial():
    """Phases adversarially close to +-Q/2 (wide analog of
    tests/rns/test_exact_decrypt.py; ref rns_base.cu exact_convey_array)."""
    base = make_base([60, 40, 50])
    t = Modulus(numth.get_prime(2 * N, 20))
    tool = RNSTool64(LOG_N, base, t)
    Q = base.prod
    L = base.size
    min_delta = (L * Q >> 66) + 1
    xs = []
    for delta in (min_delta, 2 * min_delta, Q >> 24):
        xs += [Q // 2 - delta, Q // 2 + delta, Q // 2 + 1 + delta]
    xs += [0, 1, Q - 1]
    xs = (xs * (N // len(xs) + 1))[:N]
    x = to_pair(base.residues_host(xs))
    got = np.asarray(tool.decrypt_mod_t(x))
    for c, v in enumerate(xs):
        centered = v - Q if v > Q // 2 else v
        assert int(got[c]) == centered % t.value, (c, v)


def test_wide_scale_up_centralize_decentralize():
    base = make_base([60, 40, 50])
    t = Modulus(numth.get_prime(2 * N, 20))
    scaler = BFVScaler64(base, t)
    Q = base.prod
    m = RNG.integers(0, t.value, size=N).astype(np.uint32)
    up = from_pair(np.asarray(scaler.scale_up(jnp.asarray(m))))
    for c in range(N):
        want = (int(m[c]) * Q + t.value // 2) // t.value
        for i, q in enumerate(base.values):
            assert int(up[i, c]) == want % q, (c, i)
    cent = np.asarray(scaler.centralize(jnp.asarray(m)))
    cent_int = from_pair(cent)
    for c in range(N):
        mc = int(m[c])
        centered = mc - t.value if mc >= (t.value + 1) // 2 else mc
        for i, q in enumerate(base.values):
            assert int(cent_int[i, c]) == centered % q
    back = np.asarray(scaler.decentralize(jnp.asarray(cent)))
    np.testing.assert_array_equal(np.asarray(back, np.uint64),
                                  m.astype(np.uint64))
