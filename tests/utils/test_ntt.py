"""NTT tests vs a naive O(n^2) negacyclic oracle (mirrors reference test/utils/ntt.cu)."""

import numpy as np
import jax.numpy as jnp

from troy_tpu.core.modulus import Modulus
from troy_tpu.ops.ntt import NTTTables, ntt, intt
from troy_tpu.utils import numth

RNG = np.random.default_rng(7)


def make_tables(log_n, bit_sizes):
    n = 1 << log_n
    primes = []
    for b in sorted(set(bit_sizes)):
        cnt = bit_sizes.count(b)
        primes += numth.get_primes(2 * n, b, cnt)
    return NTTTables(log_n, [Modulus(p) for p in primes])


def naive_negacyclic_ntt(x, q, psi):
    """Evaluations at psi^(2k+1), k = 0..n-1 (natural k order)."""
    n = len(x)
    out = []
    for k in range(n):
        root = pow(psi, 2 * k + 1, q)
        acc, p = 0, 1
        for j in range(n):
            acc = (acc + int(x[j]) * p) % q
            p = p * root % q
        out.append(acc)
    return out


def test_roundtrip():
    for log_n in (3, 5, 11):
        t = make_tables(log_n, [29, 30, 30])
        n = 1 << log_n
        L = 3
        x = RNG.integers(0, 1 << 28, size=(L, n)).astype(np.uint32)
        x = x % np.asarray(t.host["q"])[:, None]
        y = intt(ntt(jnp.asarray(x), t.pack()), t.pack())
        np.testing.assert_array_equal(np.asarray(y), x)


def test_vs_naive():
    log_n = 4
    n = 1 << log_n
    t = make_tables(log_n, [29, 30])
    x = np.stack([RNG.integers(0, q, size=n) for q in t.host["q"].tolist()]).astype(np.uint32)
    got = np.asarray(ntt(jnp.asarray(x), t.pack()))
    for k_limb, mod in enumerate(t.moduli):
        q = mod.value
        psi = numth.try_minimal_primitive_root(2 * n, q)
        expect = naive_negacyclic_ntt(x[k_limb], q, psi)
        # position p holds evaluation at psi^(2*brv(p)+1)
        for p in range(n):
            assert got[k_limb, p] == expect[numth.reverse_bits(p, log_n)]


def test_convolution_theorem():
    """NTT(a) * NTT(b) (pointwise) == NTT(negacyclic a*b)."""
    log_n = 6
    n = 1 << log_n
    t = make_tables(log_n, [29])
    q = int(t.host["q"][0])
    a = RNG.integers(0, q, size=n)
    b = RNG.integers(0, q, size=n)
    # naive negacyclic product
    c = [0] * n
    for i in range(n):
        for j in range(n):
            k = i + j
            sgn = 1
            if k >= n:
                k -= n
                sgn = -1
            c[k] = (c[k] + sgn * int(a[i]) * int(b[j])) % q
    fa = np.asarray(ntt(jnp.asarray(a.astype(np.uint32)[None, :]), t.pack()), dtype=np.uint64)
    fb = np.asarray(ntt(jnp.asarray(b.astype(np.uint32)[None, :]), t.pack()), dtype=np.uint64)
    fc = np.asarray(ntt(jnp.asarray(np.array(c, dtype=np.uint32)[None, :]), t.pack()), dtype=np.uint64)
    np.testing.assert_array_equal(fa * fb % q, fc)


def test_batched_leading_axes():
    log_n = 5
    t = make_tables(log_n, [29, 30])
    n = 1 << log_n
    x = np.stack([
        RNG.integers(0, q, size=(4, 2, n)) for q in t.host["q"].tolist()
    ], axis=2).astype(np.uint32)  # (4, 2, L, n)
    y = np.asarray(ntt(jnp.asarray(x), t.pack()))
    # equals per-slice transform
    for i in range(4):
        for j in range(2):
            yy = np.asarray(ntt(jnp.asarray(x[i, j]), t.pack()))
            np.testing.assert_array_equal(y[i, j], yy)
