"""MXU 4-step NTT must be bit-identical to the radix-2 reference path."""

import numpy as np
import jax.numpy as jnp

from troy_tpu.core.modulus import Modulus
from troy_tpu.ops.ntt import NTTTables, ntt_forward, ntt_inverse
from troy_tpu.ops.ntt_mxu import MxuNTTTables, ntt_forward_mxu, ntt_inverse_mxu
from troy_tpu.utils import numth

RNG = np.random.default_rng(1717)


def make(log_n, bits_list):
    n = 1 << log_n
    primes = []
    for b in sorted(set(bits_list)):
        primes += numth.get_primes(2 * n, b, bits_list.count(b))
    mods = [Modulus(p) for p in primes]
    return NTTTables(log_n, mods), MxuNTTTables(log_n, mods)


def rand_x(tables, shape_lead=()):
    q = np.asarray(tables.host["q"])
    L, n = q.shape[0], tables.n
    x = RNG.integers(0, 1 << 30, size=shape_lead + (L, n)).astype(np.uint32)
    return jnp.asarray(x % q[:, None])


def test_forward_matches_radix2():
    for log_n in (4, 6, 10):
        ref, mxu = make(log_n, [29, 30])
        x = rand_x(ref)
        a = np.asarray(ntt_forward(x, ref.pack()))
        b = np.asarray(ntt_forward_mxu(x, mxu.pack()))
        np.testing.assert_array_equal(a, b, err_msg=f"log_n={log_n}")


def test_inverse_matches_radix2():
    for log_n in (4, 6, 10):
        ref, mxu = make(log_n, [30, 30])
        x = rand_x(ref)
        a = np.asarray(ntt_inverse(x, ref.pack()))
        b = np.asarray(ntt_inverse_mxu(x, mxu.pack()))
        np.testing.assert_array_equal(a, b, err_msg=f"log_n={log_n}")


def test_roundtrip_batched():
    ref, mxu = make(6, [30])
    x = rand_x(ref, shape_lead=(3, 2))
    y = ntt_forward_mxu(x, mxu.pack())
    back = ntt_inverse_mxu(y, mxu.pack())
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
    # cross: forward mxu + inverse radix-2
    back2 = ntt_inverse(y, ref.pack())
    np.testing.assert_array_equal(np.asarray(back2), np.asarray(x))


def test_large_contraction_fallback_roundtrip():
    """n = 2^15 has a 256-wide matmul contraction: the pairwise int32 fold
    would overflow, so recombination takes the 7-diagonal fallback and the
    pallas kernel keeps the twiddle as a separate Shoup pass (single-plane
    T16 tables).  Both the XLA einsum and the interpret-mode pallas kernel
    must stay bit-identical to the radix-2 oracle."""
    import jax

    log_n = 15
    ref, mxu = make(log_n, [30])
    x = rand_x(ref)
    pack = mxu.pack()
    assert pack["T16"].shape[0] == 1  # single-plane (non-folded) tables
    a = np.asarray(ntt_forward(x, ref.pack()))
    b = np.asarray(ntt_forward_mxu(x, pack))
    np.testing.assert_array_equal(a, b)
    from troy_tpu.ops.ntt_pallas import _ntt_pallas_mxu

    p = _ntt_pallas_mxu(
        jnp.asarray(x)[None], pack["q"], pack["W1"], pack["W2"],
        pack["T16"], pack["T16_shoup"], pack["Tcorr"],
        pack["pow16"], pack["pow16_shoup"], pack["corr16"],
        pack["pow8"], pack["pow8_shoup"], pack["corr8"], inverse=False)
    np.testing.assert_array_equal(a, np.asarray(p)[0])
    inv = np.asarray(ntt_inverse_mxu(jnp.asarray(b), pack))
    np.testing.assert_array_equal(inv, np.asarray(x))


def test_pairwise_fold_adversarial_bounds():
    """Stress the int32 bounds of the pairwise-folded recombination at the
    maximum contraction length (K = PAIR_FOLD_MAX_K = 128): operands and
    weights crafted so every balanced digit hits an extreme (-128 via
    0x80 bytes) — the worst case of the |C| <= 0.76 * 2^31 analysis in the
    module docstring.  Checked against a Python big-int oracle."""
    from troy_tpu.ops import ntt_mxu as MX
    from troy_tpu.core.modulus import Modulus

    q = numth.get_prime(2 * 2048, 30)  # near-2^30 modulus, worst granularity
    K = MX.PAIR_FOLD_MAX_K
    M_COLS = 128
    # values with 0x80 byte patterns force digits to -128 after balancing;
    # clamp below q to stay valid residues
    patterns = np.array([0x20808080, 0x1F808080, 0x20807F80, 0x00808080],
                        dtype=np.uint64)
    W_host = np.empty((K, K), dtype=np.uint32)
    X_host = np.empty((K, M_COLS), dtype=np.uint32)
    rng = np.random.default_rng(99)
    for arr in (W_host, X_host):
        pick = rng.integers(0, len(patterns), size=arr.shape)
        arr[...] = (patterns[pick] % q).astype(np.uint32)
    mods = [Modulus(q)]
    t = {
        "q": jnp.asarray(np.array([q], dtype=np.uint32)),
    }
    (pow16, pow16_sh, pow8, pow8_sh, corr16, corr8) = MX._pow_tables(mods)
    t.update(pow16=jnp.asarray(pow16), pow16_shoup=jnp.asarray(pow16_sh),
             pow8=jnp.asarray(pow8), pow8_shoup=jnp.asarray(pow8_sh),
             corr16=jnp.asarray(corr16), corr8=jnp.asarray(corr8))
    Wl = jnp.asarray(MX._balance_const(W_host[None]))  # (4, 1, K, K)
    x = jnp.asarray(X_host[None])                      # (1, K, M)
    got = np.asarray(MX._modular_matmul_left(Wl, x, t))
    want = (W_host.astype(object) @ X_host.astype(object)) % q
    np.testing.assert_array_equal(got[0], want.astype(np.uint64))
