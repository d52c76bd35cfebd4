"""Pallas NTT kernels (interpret mode on CPU) must match the XLA paths."""

import numpy as np
import jax.numpy as jnp

import troy_tpu.ops.ntt as NTTMOD
from troy_tpu.ops.ntt_mxu import MxuNTTTables
from troy_tpu.ops.ntt_pallas import (ntt_forward_pallas, ntt_inverse_pallas,
                                     ntt_forward_pallas_mxu,
                                     ntt_inverse_pallas_mxu)
from troy_tpu.core.modulus import Modulus
from troy_tpu.utils import numth

RNG = np.random.default_rng(555)


def setup(log_n=9, L=2):
    n = 1 << log_n
    mods = [Modulus(p) for p in numth.get_primes(2 * n, 30, L)]
    tabs = NTTMOD.NTTTables(log_n, mods)
    base = dict(tabs.pack())
    full = dict(base)
    full.update(tabs._sixstep_pack())
    full.update(MxuNTTTables(log_n, mods).pack_prefixed())
    q = np.array([m.value for m in mods], dtype=np.uint32)
    x = jnp.asarray(
        RNG.integers(0, 1 << 30, size=(2, L, n)).astype(np.uint32) % q[:, None])
    return base, full, x


def test_pallas_sixstep_kernel_matches():
    base, full, x = setup()
    np.testing.assert_array_equal(
        np.asarray(NTTMOD.ntt_forward(x, base)),
        np.asarray(ntt_forward_pallas(x, full)))
    np.testing.assert_array_equal(
        np.asarray(NTTMOD.ntt_inverse(x, base)),
        np.asarray(ntt_inverse_pallas(x, full)))


def test_pallas_mxu_kernel_matches():
    base, full, x = setup()
    np.testing.assert_array_equal(
        np.asarray(NTTMOD.ntt_forward(x, base)),
        np.asarray(ntt_forward_pallas_mxu(x, full)))
    np.testing.assert_array_equal(
        np.asarray(NTTMOD.ntt_inverse(x, base)),
        np.asarray(ntt_inverse_pallas_mxu(x, full)))
