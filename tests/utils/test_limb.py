"""ops/limb.py multiword (16-bit limb) device arithmetic vs Python-int
oracles (oracles use Python ints per project rules — numpy u64 wraps)."""

import numpy as np
import jax.numpy as jnp

from troy_tpu.ops import limb as LB
from troy_tpu.ops import u32 as U

RNG = np.random.default_rng(9090)


def rand_ints(k, n):
    return [int.from_bytes(RNG.bytes(16), "little") & ((1 << k) - 1)
            for _ in range(n)]


def test_from_to_ints_roundtrip():
    for k in (33, 48, 64, 100, 128):
        vals = rand_ints(k, 17)
        arr = LB.from_ints(vals, k)
        back = LB.to_ints(arr, k)
        assert [int(v) for v in back] == vals, f"k={k}"


def test_mul_const_full_and_low():
    k = 80
    n = 9
    vals = rand_ints(k, n)
    x = jnp.asarray(LB.from_ints(vals, k))
    c = rand_ints(k, 1)[0]
    cl = LB.const_limbs(c, LB.width(k))
    full = np.asarray(LB.mul_const_full(x, cl))
    got = LB.to_ints(full, 2 * k)
    assert [int(g) for g in got] == [v * c for v in vals]
    lowk = np.asarray(LB.mul_const_low(x, cl, k))
    got_low = LB.to_ints(lowk, k)
    assert [int(g) for g in got_low] == [(v * c) & ((1 << k) - 1) for v in vals]


def test_dot_const_low():
    k = 100
    n = 8
    L = 6
    vals = [RNG.integers(0, 1 << 32, size=n, dtype=np.uint64).astype(np.uint32)
            for _ in range(L)]
    consts = [rand_ints(k, 1)[0] for _ in range(L)]
    got = LB.to_ints(np.asarray(LB.dot_const_low(
        [jnp.asarray(v) for v in vals],
        [LB.const_limbs(c, LB.width(k)) for c in consts], k)), k)
    want = [sum(int(vals[i][j]) * consts[i] for i in range(L))
            & ((1 << k) - 1) for j in range(n)]
    assert [int(g) for g in got] == want


def test_add_sub_shift_bit():
    k = 70
    n = 11
    a_int = rand_ints(k, n)
    b_int = rand_ints(k, n)
    a = jnp.asarray(LB.from_ints(a_int, k))
    b = jnp.asarray(LB.from_ints(b_int, k))
    mask = (1 << k) - 1
    sub = LB.to_ints(np.asarray(LB.sub_low(a, b, k)), k)
    assert [int(g) for g in sub] == [(x - y) & mask for x, y in zip(a_int, b_int)]
    c = rand_ints(k, 1)[0]
    add = LB.to_ints(np.asarray(LB.add_const_low(
        a, LB.const_limbs(c, LB.width(k)), k)), k)
    assert [int(g) for g in add] == [(x + c) & mask for x in a_int]
    sh = LB.to_ints(np.asarray(LB.shift_right(a, 37)), k)
    assert [int(g) for g in sh] == [x >> 37 for x in a_int]
    ab = LB.to_ints(np.asarray(LB.add_bit(a, 3)), k)
    # no-overflow precondition: force top bits clear
    assert all(((int(g) - 8) & mask) == x for g, x in zip(ab, a_int))
    bits = np.asarray(LB.get_bit(a, k - 1))
    assert list(bits) == [(x >> (k - 1)) & 1 for x in a_int]


def test_fold_mod_q():
    k = 90
    n = 7
    qs = [(1 << 30) - 35, (1 << 29) + 11, 998244353]
    vals = rand_ints(k, n)
    x = jnp.asarray(LB.from_ints(vals, k))
    W = LB.width(k)
    pow16 = [jnp.asarray(np.array([pow(2, 16 * w, q) for q in qs],
                                  dtype=np.uint32))[:, None]
             for w in range(W)]
    q = jnp.asarray(np.array(qs, dtype=np.uint32))[:, None]
    ratios = [(1 << 64) // q_ for q_ in qs]
    qhi = jnp.asarray(np.array([r >> 32 for r in ratios], dtype=np.uint32))[:, None]
    qlo = jnp.asarray(np.array([r & 0xFFFFFFFF for r in ratios],
                               dtype=np.uint32))[:, None]
    got = np.asarray(LB.fold_mod_q(x, pow16, q, qhi, qlo))
    for i, q_ in enumerate(qs):
        assert [int(g) for g in got[i]] == [v % q_ for v in vals], f"q={q_}"
