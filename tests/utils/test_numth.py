"""Tests for host number theory (mirrors reference test/utils/number_theory coverage)."""

from troy_tpu.utils import numth


def test_is_prime():
    assert numth.is_prime(2)
    assert numth.is_prime(3)
    assert not numth.is_prime(1)
    assert not numth.is_prime(0)
    assert numth.is_prime(0x4000000000037)  # 51-bit prime
    assert numth.is_prime((1 << 29) - 3)
    assert not numth.is_prime((1 << 29) - 1)
    assert numth.is_prime(1073479681)  # 30-bit NTT prime (q ≡ 1 mod 2^15)


def test_xgcd_invert():
    g, x, y = numth.xgcd(240, 46)
    assert g == 2 and 240 * x + 46 * y == 2
    q = 1073479681
    for a in [2, 3, 12345, q - 1]:
        inv = numth.invert_mod(a, q)
        assert a * inv % q == 1


def test_get_primes_ntt():
    n = 4096
    primes = numth.get_primes(2 * n, 30, 4)
    assert len(primes) == 4
    assert len(set(primes)) == 4
    for p in primes:
        assert numth.is_prime(p)
        assert p % (2 * n) == 1
        assert p.bit_length() == 30
    assert primes == sorted(primes, reverse=True)


def test_primitive_roots():
    n = 1024
    q = numth.get_prime(2 * n, 29)
    root = numth.try_minimal_primitive_root(2 * n, q)
    assert root is not None
    # root is a primitive 2n-th root: root^n == -1, root^2n == 1
    assert pow(root, n, q) == q - 1
    assert pow(root, 2 * n, q) == 1
    # minimality is deterministic
    assert root == numth.try_minimal_primitive_root(2 * n, q)


def test_reverse_bits():
    assert numth.reverse_bits(0b0011, 4) == 0b1100
    assert numth.reverse_bits(1, 13) == 1 << 12
    for v in range(16):
        assert numth.reverse_bits(numth.reverse_bits(v, 4), 4) == v


def test_naf():
    for v in [0, 1, 2, 3, 7, 15, -5, 1000, -1000, 31]:
        assert sum(numth.naf(v)) == v
        # non-adjacency: all terms distinct powers of 2 (up to sign)
        mags = [abs(t) for t in numth.naf(v)]
        assert len(set(mags)) == len(mags)
