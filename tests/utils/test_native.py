"""Native component tests: AES-128 vectors (FIPS-197) + u64 NTT oracle."""

import numpy as np
import pytest

from troy_tpu import native
from troy_tpu.utils import numth

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib unavailable")


def test_aes128_fips197_vector():
    # FIPS-197 appendix C.1: key 000102...0f, plaintext 00112233...ff
    key = bytes(range(16))
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    # CTR with counter = plaintext block: encrypt(counter) == ECB(pt)
    ctr_lo = int.from_bytes(pt[:8], "little")
    ctr_hi = int.from_bytes(pt[8:], "little")
    ks = native.aes128_ctr_bytes(key, (ctr_hi << 64) | ctr_lo, 16)
    assert ks.hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"


def test_aes128_ctr_determinism_and_increment():
    key = b"0123456789abcdef"
    a = native.aes128_ctr_bytes(key, 7, 64)
    b = native.aes128_ctr_bytes(key, 7, 64)
    assert a == b
    # second block of counter 7 == first block of counter 8
    c = native.aes128_ctr_bytes(key, 8, 16)
    assert a[16:32] == c


def test_ntt64_oracle_roundtrip_and_match():
    log_n, n = 5, 32
    q = numth.get_prime(2 * n, 40)
    psi = numth.try_minimal_primitive_root(2 * n, q)
    ipsi = numth.invert_mod(psi, q)
    brv = [numth.reverse_bits(i, log_n) for i in range(n)]
    fwd = np.zeros(n, np.uint64)
    inv = np.zeros(n, np.uint64)
    p = ip = 1
    for i in range(n):
        fwd[brv[i]] = p
        inv[brv[i]] = ip
        p = p * psi % q
        ip = ip * ipsi % q
    rng = np.random.default_rng(1)
    x = rng.integers(0, q, n, dtype=np.uint64)
    y = native.ntt64_forward(x, fwd, q)
    back = native.ntt64_inverse(y, inv, numth.invert_mod(n, q), q)
    np.testing.assert_array_equal(back, x)
    # convolution theorem vs naive negacyclic product
    a = rng.integers(0, q, n, dtype=np.uint64)
    b = rng.integers(0, q, n, dtype=np.uint64)
    c = [0] * n
    for i in range(n):
        for j in range(n):
            k, s = (i + j, 1) if i + j < n else (i + j - n, -1)
            c[k] = (c[k] + s * int(a[i]) * int(b[j])) % q
    fa = native.ntt64_forward(a, fwd, q).astype(object)
    fb = native.ntt64_forward(b, fwd, q).astype(object)
    fc = native.ntt64_forward(np.array(c, np.uint64), fwd, q).astype(object)
    assert all((fa[i] * fb[i]) % q == fc[i] for i in range(n))
