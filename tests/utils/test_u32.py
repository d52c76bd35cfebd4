"""Tests for the u32 wide/modular arithmetic core against a Python-int oracle
(mirrors reference test/utils/{basics,uint_small_mod}.cu coverage)."""

import numpy as np
import jax.numpy as jnp

from troy_tpu.ops import u32 as U
from troy_tpu.core.modulus import Modulus

RNG = np.random.default_rng(0xC0FFEE)


def rand_u32(shape, lo=0, hi=1 << 32):
    return jnp.asarray(RNG.integers(lo, hi, size=shape, dtype=np.uint64).astype(np.uint32))


TEST_MODULI = [
    (1 << 28) + 1,      # smallest fast-path bound region (not prime, fine for barrett)
    268582913,          # 29-bit NTT prime
    536903681,          # 30-bit NTT prime
    (1 << 30) - 1,
    786433,             # small prime (plain modulus style) — barrett must still work
    2,
]


def test_mul32_wide():
    a = rand_u32(4096)
    b = rand_u32(4096)
    hi, lo = U.mul32_wide(a, b)
    prod = np.asarray(a, dtype=np.uint64) * np.asarray(b, dtype=np.uint64)
    np.testing.assert_array_equal(np.asarray(lo), (prod & 0xFFFFFFFF).astype(np.uint32))
    np.testing.assert_array_equal(np.asarray(hi), (prod >> 32).astype(np.uint32))


def test_add64():
    a = RNG.integers(0, 1 << 64, size=1024, dtype=np.uint64)
    b = RNG.integers(0, 1 << 64, size=1024, dtype=np.uint64)
    hi, lo = U.add64(
        jnp.asarray((a >> 32).astype(np.uint32)), jnp.asarray((a & 0xFFFFFFFF).astype(np.uint32)),
        jnp.asarray((b >> 32).astype(np.uint32)), jnp.asarray((b & 0xFFFFFFFF).astype(np.uint32)))
    s = a + b  # wraps mod 2^64
    np.testing.assert_array_equal(np.asarray(lo), (s & 0xFFFFFFFF).astype(np.uint32))
    np.testing.assert_array_equal(np.asarray(hi), (s >> 32).astype(np.uint32))


def test_barrett_reduce_u64():
    for q in TEST_MODULI:
        m = Modulus(q)
        z = RNG.integers(0, 1 << 64, size=2048, dtype=np.uint64)
        r = U.barrett_reduce_u64(
            jnp.asarray((z >> 32).astype(np.uint32)),
            jnp.asarray((z & 0xFFFFFFFF).astype(np.uint32)),
            U.u32(q), U.u32(m.ratio64_hi), U.u32(m.ratio64_lo))
        np.testing.assert_array_equal(np.asarray(r), (z % q).astype(np.uint32), err_msg=f"q={q}")


def test_mul_mod():
    for q in TEST_MODULI:
        m = Modulus(q)
        a = RNG.integers(0, 1 << 32, size=2048, dtype=np.uint64)
        b = RNG.integers(0, 1 << 32, size=2048, dtype=np.uint64)
        r = U.mul_mod(jnp.asarray(a.astype(np.uint32)), jnp.asarray(b.astype(np.uint32)),
                      U.u32(q), U.u32(m.ratio64_hi), U.u32(m.ratio64_lo))
        np.testing.assert_array_equal(np.asarray(r), (a * b % q).astype(np.uint32), err_msg=f"q={q}")


def test_add_sub_neg_div2_mod():
    q = 536903681
    a = RNG.integers(0, q, size=2048, dtype=np.uint64)
    b = RNG.integers(0, q, size=2048, dtype=np.uint64)
    ja, jb, jq = jnp.asarray(a.astype(np.uint32)), jnp.asarray(b.astype(np.uint32)), U.u32(q)
    np.testing.assert_array_equal(np.asarray(U.add_mod(ja, jb, jq)), ((a + b) % q).astype(np.uint32))
    np.testing.assert_array_equal(
        np.asarray(U.sub_mod(ja, jb, jq)),
        ((a.astype(object) - b.astype(object)) % q).astype(np.uint32))
    np.testing.assert_array_equal(np.asarray(U.neg_mod(ja, jq)), ((q - a) % q).astype(np.uint32))
    inv2 = (q + 1) // 2  # inverse of 2 mod any odd q
    np.testing.assert_array_equal(np.asarray(U.div2_mod(ja, jq)), (a * inv2 % q).astype(np.uint32))


def test_shoup_mul():
    for q in [268582913, 536903681]:
        m = Modulus(q)
        w = int(RNG.integers(0, q))
        ws = m.shoup(w)
        x = RNG.integers(0, 1 << 32, size=2048, dtype=np.uint64)
        lazy = U.shoup_mul_lazy(jnp.asarray(x.astype(np.uint32)), U.u32(w), U.u32(ws), U.u32(q))
        lazy_np = np.asarray(lazy, dtype=np.uint64)
        assert (lazy_np < 2 * q).all()
        np.testing.assert_array_equal(lazy_np % q, x * w % q)
        full = U.shoup_mul(jnp.asarray(x.astype(np.uint32)), U.u32(w), U.u32(ws), U.u32(q))
        np.testing.assert_array_equal(np.asarray(full), (x * w % q).astype(np.uint32))


def test_modulus_constants():
    m = Modulus(536903681)
    assert m.bit_count == 30
    assert m.is_prime
    assert m.fits_fast_path()
    ratio = (m.ratio64_hi << 32) | m.ratio64_lo
    assert ratio == (1 << 64) // m.value
    assert m.invert(12345) * 12345 % m.value == 1
