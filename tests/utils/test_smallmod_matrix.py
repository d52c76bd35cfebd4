"""Modular-arithmetic primitive matrix vs Python-int oracles — boundary and
random cases for the u32 fast path and the (hi, lo) u64 wide path (mirrors
reference test/utils/uint_small_mod.cu categories: add/sub/negate/div2/
barrett-reduce/multiply/multiply-add/modulo/exponentiate; the reference's
Host/Device split collapses to the one JAX path here)."""

import numpy as np
import jax.numpy as jnp
import pytest

from troy_tpu.core.modulus import Modulus
from troy_tpu.ops import u32 as U
from troy_tpu.ops import u64 as W
from troy_tpu.utils import numth

RNG = np.random.default_rng(2222)

Q32S = [numth.get_prime(64, b) for b in (29, 30)] + [(1 << 29) + 1]
Q64S = [numth.get_prime(64, b) for b in (40, 50, 60)]


def edge_vals(q, count=12):
    """Boundary-heavy operand set in [0, q)."""
    edges = [0, 1, 2, q // 2, q // 2 + 1, q - 2, q - 1]
    rand = [int(RNG.integers(0, q)) for _ in range(count - len(edges))]
    return edges + rand


def as_u32(vals):
    return jnp.asarray(np.array(vals, dtype=np.uint32))


def as_pair(vals):
    a = np.array(vals, dtype=np.uint64)
    return (jnp.asarray((a >> 32).astype(np.uint32)),
            jnp.asarray((a & 0xFFFFFFFF).astype(np.uint32)))


def pair_int(h, l):
    return [(int(a) << 32) + int(b)
            for a, b in zip(np.asarray(h), np.asarray(l))]


# ---------------------------------------------------------------------------
# u32 fast path
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("q", Q32S)
def test_u32_add_sub_neg_mod(q):
    xs, ys = edge_vals(q), edge_vals(q)
    x, y = as_u32(xs), as_u32(ys)
    qv = U.u32(q)
    got = np.asarray(U.add_mod(x, y, qv))
    assert [int(g) for g in got] == [(a + b) % q for a, b in zip(xs, ys)]
    got = np.asarray(U.sub_mod(x, y, qv))
    assert [int(g) for g in got] == [(a - b) % q for a, b in zip(xs, ys)]
    got = np.asarray(U.neg_mod(x, qv))
    assert [int(g) for g in got] == [(-a) % q for a in xs]


@pytest.mark.parametrize("q", Q32S)
def test_u32_div2_mod(q):
    assert q % 2 == 1
    xs = edge_vals(q)
    got = np.asarray(U.div2_mod(as_u32(xs), U.u32(q)))
    inv2 = pow(2, -1, q)
    assert [int(g) for g in got] == [a * inv2 % q for a in xs]


@pytest.mark.parametrize("q", Q32S)
def test_u32_mul_and_barrett(q):
    m = Modulus(q)
    xs, ys = edge_vals(q), edge_vals(q)
    got = np.asarray(U.mul_mod(as_u32(xs), as_u32(ys), U.u32(q),
                               U.u32(m.ratio64_hi), U.u32(m.ratio64_lo)))
    assert [int(g) for g in got] == [a * b % q for a, b in zip(xs, ys)]
    # barrett_reduce_u64 on full-range z < q * 2^32 (products of residues)
    zs = [a * b for a, b in zip(xs, ys)] + [0, q - 1, q, q + 1, 2 * q - 1]
    zh = as_u32([z >> 32 for z in zs])
    zl = as_u32([z & 0xFFFFFFFF for z in zs])
    got = np.asarray(U.barrett_reduce_u64(zh, zl, U.u32(q),
                                          U.u32(m.ratio64_hi),
                                          U.u32(m.ratio64_lo)))
    assert [int(g) for g in got] == [z % q for z in zs]


@pytest.mark.parametrize("q", Q32S)
def test_u32_shoup_and_dot(q):
    m = Modulus(q)
    xs = edge_vals(q)
    w = int(RNG.integers(1, q))
    ws = (w << 32) // q
    got = np.asarray(U.shoup_mul(as_u32(xs), U.u32(w), U.u32(ws), U.u32(q)))
    assert [int(g) for g in got] == [a * w % q for a in xs]
    lazy = np.asarray(U.shoup_mul_lazy(as_u32(xs), U.u32(w), U.u32(ws),
                                       U.u32(q)))
    assert all(int(g) < 2 * q and int(g) % q == a * w % q
               for g, a in zip(lazy, xs))
    # multiply-add chain: dot of K terms, one Barrett at the end
    K = 8
    aa = [edge_vals(q) for _ in range(K)]
    bb = [edge_vals(q) for _ in range(K)]
    pairs = [(as_u32(a), as_u32(b)) for a, b in zip(aa, bb)]
    got = np.asarray(U.dot_mod(pairs, U.u32(q), U.u32(m.ratio64_hi),
                               U.u32(m.ratio64_lo)))
    want = [sum(a[i] * b[i] for a, b in zip(aa, bb)) % q
            for i in range(len(aa[0]))]
    assert [int(g) for g in got] == want


def test_u32_exponentiate_mod():
    """Host-side NAF exponentiation (ref exponentiate_uint64_mod)."""
    for q in Q32S:
        m = Modulus(q)
        for e in (0, 1, 2, 3, 65537, q - 1):
            b = int(RNG.integers(1, q))
            assert m.pow(b, e) == pow(b, e, q)


# ---------------------------------------------------------------------------
# u64 wide path
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("q", Q64S)
def test_u64_add_sub_neg_mod(q):
    xs, ys = edge_vals(q), edge_vals(q)
    (xh, xl), (yh, yl) = as_pair(xs), as_pair(ys)
    qh, ql = as_pair([q])[0][0], as_pair([q])[1][0]
    got = pair_int(*W.add_mod64(xh, xl, yh, yl, qh, ql))
    assert got == [(a + b) % q for a, b in zip(xs, ys)]
    got = pair_int(*W.sub_mod64(xh, xl, yh, yl, qh, ql))
    assert got == [(a - b) % q for a, b in zip(xs, ys)]
    got = pair_int(*W.neg_mod64(xh, xl, qh, ql))
    assert got == [(-a) % q for a in xs]


@pytest.mark.parametrize("q", Q64S)
def test_u64_div2_mod(q):
    xs = edge_vals(q)
    (xh, xl) = as_pair(xs)
    qh, ql = as_pair([q])[0][0], as_pair([q])[1][0]
    got = pair_int(*W.div2_mod64(xh, xl, qh, ql))
    inv2 = pow(2, -1, q)
    assert got == [a * inv2 % q for a in xs]


@pytest.mark.parametrize("q", Q64S)
def test_u64_mul_mod_and_barrett_u128(q):
    xs, ys = edge_vals(q), edge_vals(q)
    (xh, xl), (yh, yl) = as_pair(xs), as_pair(ys)
    qh, ql = as_pair([q])[0][0], as_pair([q])[1][0]
    r = (1 << 128) // q
    rw = [U.u32((r >> (32 * w)) & 0xFFFFFFFF) for w in (3, 2, 1, 0)]
    got = pair_int(*W.mul_mod64(xh, xl, yh, yl, qh, ql, *rw))
    assert got == [a * b % q for a, b in zip(xs, ys)]
    # barrett_reduce_u128 on 4-word products (z < q * 2^64)
    zs = [a * b for a, b in zip(xs, ys)] + [0, q - 1, q, 2 * q - 1,
                                            q * ((1 << 64) // q + 0) - 1]
    words = []
    for w in range(4):
        words.append(as_u32([(z >> (32 * w)) & 0xFFFFFFFF for z in zs]))
    got = pair_int(*W.barrett_reduce_u128(words[3], words[2], words[1],
                                          words[0], qh, ql, *rw))
    assert got == [z % q for z in zs]


@pytest.mark.parametrize("q", Q64S)
def test_u64_modulo_full_range(q):
    """barrett_reduce_u64: reduce arbitrary full-range u64 values."""
    zs = [0, 1, q - 1, q, q + 1, 2 * q, (1 << 64) - 1,
          (1 << 63) + 12345] + [int.from_bytes(RNG.bytes(8), "little")
                                for _ in range(8)]
    (zh, zl) = as_pair(zs)
    qh, ql = as_pair([q])[0][0], as_pair([q])[1][0]
    r = (1 << 128) // q
    rw = [U.u32((r >> (32 * w)) & 0xFFFFFFFF) for w in (3, 2, 1, 0)]
    got = pair_int(*W.barrett_reduce_u64(zh, zl, qh, ql, *rw))
    assert got == [z % q for z in zs]


@pytest.mark.parametrize("q", Q64S)
def test_u64_shoup_and_dot(q):
    xs = edge_vals(q)
    (xh, xl) = as_pair(xs)
    qh, ql = as_pair([q])[0][0], as_pair([q])[1][0]
    w = int(RNG.integers(1, q))
    ws = (w << 64) // q
    (wh, wl) = as_pair([w])
    (sh, sl) = as_pair([ws])
    got = pair_int(*W.shoup_mul64(xh, xl, wh[0], wl[0], sh[0], sl[0],
                                  qh, ql))
    assert got == [a * w % q for a in xs]
    lazy = pair_int(*W.shoup_mul64_lazy(xh, xl, wh[0], wl[0], sh[0], sl[0],
                                        qh, ql))
    assert all(g < 2 * q and g % q == a * w % q for g, a in zip(lazy, xs))
    # 128-bit accumulating dot with chunked Barrett
    K = 6
    aa = [edge_vals(q) for _ in range(K)]
    bb = [edge_vals(q) for _ in range(K)]
    pairs = [(as_pair(a), as_pair(b)) for a, b in zip(aa, bb)]
    r = (1 << 128) // q
    rw = [U.u32((r >> (32 * w)) & 0xFFFFFFFF) for w in (3, 2, 1, 0)]
    mt = W.dot_mod64_terms(q)
    got = pair_int(*W.dot_mod64(pairs, qh, ql, *rw, mt))
    want = [sum(a[i] * b[i] for a, b in zip(aa, bb)) % q
            for i in range(len(aa[0]))]
    assert got == want


def test_u64_mul_wide_and_add128_exact():
    """4-word product and accumulation vs big-int oracle at extremes."""
    q = Q64S[-1]
    xs = [0, 1, q - 1, (1 << 62) - 1] + [int(RNG.integers(0, q))
                                         for _ in range(6)]
    ys = [q - 1, 1, q - 1, (1 << 61) + 7] + [int(RNG.integers(0, q))
                                             for _ in range(6)]
    (xh, xl), (yh, yl) = as_pair(xs), as_pair(ys)
    p = W.mul64_wide(xh, xl, yh, yl)
    got = [sum(int(np.asarray(p[3 - w])[i]) << (32 * w) for w in range(4))
           for i in range(len(xs))]
    assert got == [a * b for a, b in zip(xs, ys)]
    s = W.add128(*p, *p)
    got2 = [sum(int(np.asarray(s[3 - w])[i]) << (32 * w) for w in range(4))
            for i in range(len(xs))]
    assert got2 == [2 * a * b for a, b in zip(xs, ys)]
