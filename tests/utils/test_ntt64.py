"""ops/ntt64.py — compat-mode 60-bit-prime NTT vs python-int oracles
(mirrors test/utils/ntt.cu: roundtrip, evaluation order, negacyclic
convolution through the NTT domain)."""

import numpy as np
import jax
import jax.numpy as jnp

from troy_tpu.ops import ntt64 as N64
from troy_tpu.ops import u64 as W
from troy_tpu.utils import numth

RNG = np.random.default_rng(4242)


def make(log_n, bits=(60, 50)):
    n = 1 << log_n
    primes = [numth.get_prime(2 * n, b) for b in bits]
    return N64.NTT64Tables(log_n, primes), primes


def rand_poly(primes, n):
    vals = np.stack([RNG.integers(0, q, n, dtype=np.uint64) for q in primes])
    hi, lo = W.pack64(vals)
    return jnp.asarray(hi), jnp.asarray(lo), vals


def test_roundtrip():
    t, primes = make(6)
    pack = t.pack()
    hi, lo, vals = rand_poly(primes, t.n)
    f = N64.ntt_forward64(hi, lo, pack)
    b_hi, b_lo = N64.ntt_inverse64(*f, pack)
    np.testing.assert_array_equal(
        W.unpack64(np.asarray(b_hi), np.asarray(b_lo)), vals)


def test_forward_matches_evaluation_order():
    """Position p holds the evaluation at psi^(2*brv(p)+1) — the same NTT
    order contract as the u32 path (ops/ntt.py module docstring)."""
    log_n = 3
    t, primes = make(log_n, bits=(60,))
    n = t.n
    pack = t.pack()
    hi, lo, vals = rand_poly(primes, n)
    f_hi, f_lo = N64.ntt_forward64(hi, lo, pack)
    got = W.unpack64(np.asarray(f_hi), np.asarray(f_lo))
    q = primes[0]
    psi = numth.try_minimal_primitive_root(2 * n, q)
    coeffs = [int(v) for v in vals[0]]
    for p in range(n):
        root = pow(psi, 2 * numth.reverse_bits(p, log_n) + 1, q)
        want = sum(c * pow(root, i, q) for i, c in enumerate(coeffs)) % q
        assert int(got[0, p]) == want, f"position {p}"


def test_negacyclic_convolution():
    """NTT -> dyadic -> INTT == schoolbook negacyclic product mod (x^n + 1)."""
    t, primes = make(5)
    n = t.n
    pack = t.pack()
    a_hi, a_lo, a = rand_poly(primes, n)
    b_hi, b_lo, b = rand_poly(primes, n)

    @jax.jit
    def mul(ah, al, bh, bl):
        fa = N64.ntt_forward64(ah, al, pack)
        fb = N64.ntt_forward64(bh, bl, pack)
        p = N64.dyadic_product64(*fa, *fb, pack)
        return N64.ntt_inverse64(*p, pack)

    g_hi, g_lo = mul(a_hi, a_lo, b_hi, b_lo)
    got = W.unpack64(np.asarray(g_hi), np.asarray(g_lo))
    for k, q in enumerate(primes):
        want = [0] * n
        for i in range(n):
            for j in range(n):
                s = (i + j) % n
                sign = -1 if i + j >= n else 1
                want[s] = (want[s] + sign * int(a[k, i]) * int(b[k, j])) % q
        np.testing.assert_array_equal(got[k], np.array(want, dtype=np.uint64))


def test_sixstep_matches_radix2():
    """The wide six-step schedule is bit-identical to the radix-2 oracle
    (same contract as the u32 backends, tests/utils/test_ntt_mxu.py)."""
    log_n = 9  # >= _MXU_MIN_LOG_N so pack() includes the sixstep tables
    t, primes = make(log_n, bits=(60, 41))
    pack = dict(t.pack())
    if "ss_T_hi" not in pack:
        pack.update(t._sixstep_pack())
    radix2 = {k: v for k, v in pack.items() if not k.startswith("ss")}

    hi, lo, _ = rand_poly(primes, t.n)
    f_ss = N64.ntt_forward64(hi, lo, pack)
    f_r2 = N64.ntt_forward64(hi, lo, radix2)
    np.testing.assert_array_equal(np.asarray(f_ss[0]), np.asarray(f_r2[0]))
    np.testing.assert_array_equal(np.asarray(f_ss[1]), np.asarray(f_r2[1]))

    b_ss = N64.ntt_inverse64(*f_ss, pack)
    b_r2 = N64.ntt_inverse64(*f_r2, radix2)
    np.testing.assert_array_equal(np.asarray(b_ss[0]), np.asarray(b_r2[0]))
    np.testing.assert_array_equal(np.asarray(b_ss[1]), np.asarray(b_r2[1]))


def test_sixstep_split_knob_roundtrip(monkeypatch):
    """Non-square TROY_NTT_SPLIT_A splits stay bit-exact (wide width)."""
    monkeypatch.setenv("TROY_NTT_SPLIT_A", "3")
    t, primes = make(8, bits=(55,))
    pack = dict(t.pack())
    pack.update(t._sixstep_pack())
    assert pack["ss_log_n1"] == 3
    hi, lo, vals = rand_poly(primes, t.n)
    f = N64.ntt_forward64(hi, lo, pack)
    b_hi, b_lo = N64.ntt_inverse64(*f, pack)
    np.testing.assert_array_equal(
        W.unpack64(np.asarray(b_hi), np.asarray(b_lo)), vals)


def test_batched_leading_axes():
    """Pairs vectorize over arbitrary leading axes like the u32 path."""
    t, primes = make(4)
    pack = t.pack()
    B = 3
    vals = np.stack(
        [np.stack([RNG.integers(0, q, t.n, dtype=np.uint64) for q in primes])
         for _ in range(B)])
    hi, lo = W.pack64(vals)
    f = N64.ntt_forward64(jnp.asarray(hi), jnp.asarray(lo), pack)
    b_hi, b_lo = N64.ntt_inverse64(*f, pack)
    np.testing.assert_array_equal(
        W.unpack64(np.asarray(b_hi), np.asarray(b_lo)), vals)
