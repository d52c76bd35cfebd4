"""Fused NTT->convolute->INTT Pallas kernel (interpret mode) vs unfused."""

import numpy as np
import jax.numpy as jnp

import troy_tpu.ops.ntt as NTTMOD
from troy_tpu.ops.fused_mul import fused_negacyclic_multiply
from troy_tpu.ops.dyadic import dyadic_convolute
from troy_tpu.core.modulus import Modulus
from troy_tpu.utils import numth

RNG = np.random.default_rng(4242)


def test_fused_matches_unfused():
    log_n, L = 9, 2
    n = 1 << log_n
    mods = [Modulus(p) for p in numth.get_primes(2 * n, 30, L)]
    tabs = NTTMOD.NTTTables(log_n, mods)
    pack = dict(tabs.pack())
    if "ss_Ti" not in pack:  # default pack omits the pallas-only Ti tables
        pack.update(tabs._sixstep_pack())
    q = np.array([m.value for m in mods], dtype=np.uint32)
    a = jnp.asarray(RNG.integers(0, 1 << 30, size=(2, 2, L, n)).astype(np.uint32)
                    % q[:, None])
    b = jnp.asarray(RNG.integers(0, 1 << 30, size=(2, 2, L, n)).astype(np.uint32)
                    % q[:, None])
    ref = NTTMOD.ntt_inverse(
        dyadic_convolute(NTTMOD.ntt_forward(a, pack),
                         NTTMOD.ntt_forward(b, pack), pack), pack)
    got = fused_negacyclic_multiply(a, b, pack)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
