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
