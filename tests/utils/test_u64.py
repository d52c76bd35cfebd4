"""ops/u64.py — (hi, lo)-pair emulated 64-bit modular arithmetic vs
python-int oracles (mirrors reference test/utils/basics.cu coverage of
multiply_uint64_uint64 / barrett_reduce_uint128 at full width)."""

import numpy as np
import jax
import jax.numpy as jnp

from troy_tpu.ops import u64 as W
from troy_tpu.utils import numth

RNG = np.random.default_rng(60461)
M64 = (1 << 64) - 1

# representative compat-mode primes: 40, 50, 60, 61 bits, NTT-friendly for
# n=64 (p ≡ 1 mod 128) — the SEAL-default bit sizes the u32 fast path rejects
PRIMES = [numth.get_prime(128, b) for b in (40, 50, 60, 61)]


def _rand_u64(shape, bound=1 << 64):
    return RNG.integers(0, min(bound, 1 << 63), size=shape, dtype=np.uint64) | (
        RNG.integers(0, 2, size=shape, dtype=np.uint64) << np.uint64(63)
        if bound > (1 << 63)
        else np.uint64(0)
    )


def _pairs(vals):
    hi, lo = W.pack64(vals)
    return jnp.asarray(hi), jnp.asarray(lo)


def _ints(hi, lo):
    return [int(v) for v in W.unpack64(np.asarray(hi), np.asarray(lo))]


def test_pack_unpack_roundtrip():
    v = _rand_u64((257,))
    hi, lo = W.pack64(v)
    np.testing.assert_array_equal(W.unpack64(hi, lo), v)


def test_mul64_wide_and_lo_hi():
    a = _rand_u64((256,))
    b = _rand_u64((256,))
    ah, al = _pairs(a)
    bh, bl = _pairs(b)
    w3, w2, w1, w0 = W.mul64_wide(ah, al, bh, bl)
    lo_h, lo_l = W.mul64_lo(ah, al, bh, bl)
    hi_h, hi_l = W.mul64_hi(ah, al, bh, bl)
    for i in range(256):
        p = int(a[i]) * int(b[i])
        got = (int(np.asarray(w3)[i]) << 96) | (int(np.asarray(w2)[i]) << 64) \
            | (int(np.asarray(w1)[i]) << 32) | int(np.asarray(w0)[i])
        assert got == p, f"wide mismatch at {i}"
    np.testing.assert_array_equal(
        _ints(lo_h, lo_l), [(int(x) * int(y)) & M64 for x, y in zip(a, b)])
    np.testing.assert_array_equal(
        _ints(hi_h, hi_l), [(int(x) * int(y)) >> 64 for x, y in zip(a, b)])


def test_add_sub_wrap():
    a = _rand_u64((200,))
    b = _rand_u64((200,))
    ah, al = _pairs(a)
    bh, bl = _pairs(b)
    s = W.add64(ah, al, bh, bl)
    d = W.sub64(ah, al, bh, bl)
    np.testing.assert_array_equal(
        _ints(*s), [(int(x) + int(y)) & M64 for x, y in zip(a, b)])
    np.testing.assert_array_equal(
        _ints(*d), [(int(x) - int(y)) & M64 for x, y in zip(a, b)])
    hi2, lo2, c = W.add64c(ah, al, bh, bl)
    for i in range(200):
        full = int(a[i]) + int(b[i])
        assert int(np.asarray(c)[i]) == full >> 64
        got = (int(np.asarray(hi2)[i]) << 32) | int(np.asarray(lo2)[i])
        assert got == full & M64


def test_mod_add_sub_neg_div2():
    for q in PRIMES:
        qh, ql = W.words(q, 2)[1], W.words(q, 2)[0]
        a = RNG.integers(0, q, 128, dtype=np.uint64)
        b = RNG.integers(0, q, 128, dtype=np.uint64)
        a[0] = 0  # exercise the zero branch of neg
        ah, al = _pairs(a)
        bh, bl = _pairs(b)
        np.testing.assert_array_equal(
            _ints(*W.add_mod64(ah, al, bh, bl, qh, ql)),
            [(int(x) + int(y)) % q for x, y in zip(a, b)])
        np.testing.assert_array_equal(
            _ints(*W.sub_mod64(ah, al, bh, bl, qh, ql)),
            [(int(x) - int(y)) % q for x, y in zip(a, b)])
        np.testing.assert_array_equal(
            _ints(*W.neg_mod64(ah, al, qh, ql)), [(-int(x)) % q for x in a])
        inv2 = pow(2, -1, q)
        np.testing.assert_array_equal(
            _ints(*W.div2_mod64(ah, al, qh, ql)),
            [int(x) * inv2 % q for x in a])


def test_div2_mod_carry_edge():
    """q whose halved low word is 0xFFFFFFFF (carry into hi on +1)."""
    q = 0x3FFFFFFFF  # odd; (q>>1) low word = 0xFFFFFFFF
    qh, ql = W.U32(q >> 32), W.U32(q & 0xFFFFFFFF)
    a = np.array([1, 3, q - 2], dtype=np.uint64)
    ah, al = _pairs(a)
    inv2 = pow(2, -1, q)
    np.testing.assert_array_equal(
        _ints(*W.div2_mod64(ah, al, qh, ql)), [int(x) * inv2 % q for x in a])


def test_barrett_mul_mod64():
    for q in PRIMES:
        r0, r1, r2, r3 = W.barrett_ratio_u128(q)
        qh, ql = W.words(q, 2)[1], W.words(q, 2)[0]
        a = RNG.integers(0, q, 256, dtype=np.uint64)
        b = RNG.integers(0, q, 256, dtype=np.uint64)
        a[:2] = [0, q - 1]
        b[:2] = [q - 1, q - 1]
        ah, al = _pairs(a)
        bh, bl = _pairs(b)
        got = W.mul_mod64(ah, al, bh, bl, qh, ql, r3, r2, r1, r0)
        np.testing.assert_array_equal(
            _ints(*got), [int(x) * int(y) % q for x, y in zip(a, b)])


def test_barrett_reduce_u64_full_range():
    for q in PRIMES:
        r0, r1, r2, r3 = W.barrett_ratio_u128(q)
        qh, ql = W.words(q, 2)[1], W.words(q, 2)[0]
        a = _rand_u64((256,))
        a[:3] = [0, np.uint64(M64), np.uint64(q)]
        ah, al = _pairs(a)
        got = W.barrett_reduce_u64(ah, al, qh, ql, r3, r2, r1, r0)
        np.testing.assert_array_equal(_ints(*got), [int(x) % q for x in a])


def test_shoup_mul64():
    for q in PRIMES:
        qh, ql = W.words(q, 2)[1], W.words(q, 2)[0]
        ws = [int(RNG.integers(0, q)) for _ in range(8)]
        x = RNG.integers(0, q, 64, dtype=np.uint64)
        xh, xl = _pairs(x)
        for w in ws:
            s0, s1 = W.shoup_word64(w, q)
            wh, wl = W.words(w, 2)[1], W.words(w, 2)[0]
            got = W.shoup_mul64(xh, xl, wh, wl, s1, s0, qh, ql)
            np.testing.assert_array_equal(
                _ints(*got), [int(v) * w % q for v in x])
            # lazy variant stays below 2q
            lh, ll = W.shoup_mul64_lazy(xh, xl, wh, wl, s1, s0, qh, ql)
            for v, r in zip(x, _ints(lh, ll)):
                assert r < 2 * q and r % q == int(v) * w % q


def test_jit_composition():
    """The pair ops trace and fuse under jit (one compiled kernel)."""
    q = PRIMES[2]
    r0, r1, r2, r3 = W.barrett_ratio_u128(q)
    qh, ql = W.words(q, 2)[1], W.words(q, 2)[0]

    @jax.jit
    def f(ah, al, bh, bl):
        ph, pl = W.mul_mod64(ah, al, bh, bl, qh, ql, r3, r2, r1, r0)
        return W.add_mod64(ph, pl, ah, al, qh, ql)

    a = RNG.integers(0, q, 128, dtype=np.uint64)
    b = RNG.integers(0, q, 128, dtype=np.uint64)
    got = f(*_pairs(a), *_pairs(b))
    np.testing.assert_array_equal(
        _ints(*got), [(int(x) * int(y) + int(x)) % q for x, y in zip(a, b)])


def test_dot_mod64():
    """128-bit accumulating dot product (keyswitch inner-product primitive)."""
    for q in PRIMES:
        r0, r1, r2, r3 = W.barrett_ratio_u128(q)
        qh, ql = W.words(q, 2)[1], W.words(q, 2)[0]
        K = 7
        a = [RNG.integers(0, q, 64, dtype=np.uint64) for _ in range(K)]
        b = [RNG.integers(0, q, 64, dtype=np.uint64) for _ in range(K)]
        pairs = [(_pairs(x), _pairs(y)) for x, y in zip(a, b)]
        mt = W.dot_mod64_terms(q)
        assert 1 <= mt <= 16
        got = W.dot_mod64(pairs, qh, ql, r3, r2, r1, r0, mt)
        want = [sum(int(a[k][i]) * int(b[k][i]) for k in range(K)) % q
                for i in range(64)]
        np.testing.assert_array_equal(_ints(*got), want)


def test_add128():
    """4-word 128-bit add vs python-int oracle, wrapping mod 2^128."""
    words = [np.asarray(jnp.asarray(
        RNG.integers(0, 1 << 32, 64, dtype=np.uint64).astype(np.uint32)))
        for _ in range(8)]
    a3, a2, a1, a0, b3, b2, b1, b0 = words
    got = W.add128(a3, a2, a1, a0, b3, b2, b1, b0)
    g = [np.asarray(x) for x in got]
    for i in range(64):
        x = sum(int(w[i]) << (32 * k) for k, w in enumerate([a0, a1, a2, a3]))
        y = sum(int(w[i]) << (32 * k) for k, w in enumerate([b0, b1, b2, b3]))
        want = (x + y) % (1 << 128)
        out = sum(int(g[3 - k][i]) << (32 * k) for k in range(4))
        assert out == want, f"add128 mismatch at {i}"


def test_mul64_wide_karatsuba_bit_identical():
    """mul64_wide_k (3-partial-product Karatsuba, a measured VPU negative —
    see its docstring / BENCH.md) must stay bit-identical to mul64_wide."""
    a = _rand_u64((4096,))
    b = _rand_u64((4096,))
    edge = np.array([0, 1, M64, 0xFFFFFFFF00000000, 0x00000000FFFFFFFF,
                     0x8000000000000000, 0x0000FFFF0000FFFF], dtype=np.uint64)
    a = np.concatenate([a, np.repeat(edge, len(edge))])
    b = np.concatenate([b, np.tile(edge, len(edge))])
    ah, al = _pairs(a)
    bh, bl = _pairs(b)
    ref = W.mul64_wide(ah, al, bh, bl)
    got = jax.jit(W.mul64_wide_k)(ah, al, bh, bl)
    for i, (r, g) in enumerate(zip(ref, got)):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g),
                                      err_msg=f"word {3 - i}")
