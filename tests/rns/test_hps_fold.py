"""Round-5 BEHZ dot-family optimizations, both widths:

  * fast_floor_scale_fast_b_conv_sk — the ×t/Q⁻¹ table fold must be
    BIT-IDENTICAL to multiply_scalar(t) + fast_floor_fast_b_conv_sk,
  * fast_b_conv_hps — the HPS-style lift must represent x + d*q with
    d in {-1, 0, +1} (big-int oracle),
  * end-to-end: BFV multiply under TROY_BFV_BCONV=hps decrypts to the
    same plaintext as the reference-exact BEHZ m_tilde path.

Mirrors reference test/utils/rns_tool.cu coverage for the stages it
replaces (rns_tool.cu fast_b_conv_m_tilde_sm_mrq / fast_floor).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from troy_tpu.core.modulus import Modulus
from troy_tpu.utils import numth
from troy_tpu.rns.rns_base import RNSBase
from troy_tpu.rns.rns_tool import RNSTool
from troy_tpu.rns.rns_tool64 import RNSTool64

from ..core.fixtures import GeneralHeContext

RNG = np.random.default_rng(55)
LOG_N = 4
N = 1 << LOG_N


def make_tool(wide: bool):
    bits = 45 if wide else 30
    primes = numth.get_primes(2 * N, bits, 3)
    base = RNSBase([Modulus(p) for p in primes])
    cls = RNSTool64 if wide else RNSTool
    return cls(LOG_N, base, Modulus(numth.get_prime(2 * N, 20)))


def decompose(base: RNSBase, values, wide: bool):
    if not wide:
        return jnp.asarray(base.decompose_array_host(values))
    arr = base.residues_host(values)
    return jnp.stack([jnp.asarray((arr >> 32).astype(np.uint32)),
                      jnp.asarray((arr & 0xFFFFFFFF).astype(np.uint32))])


def compose(base: RNSBase, y, wide: bool):
    y = np.asarray(y)
    if wide:
        y = (y[0].astype(object) << 32) | y[1].astype(object)
    return base.compose_array_host(y)


@pytest.mark.parametrize("wide", [False, True])
def test_t_fold_bit_identical(wide):
    """(t-scale + legacy fast_floor) == t-folded fast_floor, bitwise."""
    tool = make_tool(wide)
    base = tool.base_q
    Q = base.prod
    t = tool.t.value
    bound = min(tool.base_B.prod // (4 * t), Q * Q // 16)
    values = [int.from_bytes(RNG.bytes(48), "little") % bound for _ in range(N)]
    d_q = decompose(base, values, wide)
    d_bsk = decompose(tool.base_Bsk, values, wide)
    w_q = decompose(base, [v * t for v in values], wide)
    w_bsk = decompose(tool.base_Bsk, [v * t for v in values], wide)
    legacy = np.asarray(tool.fast_floor_fast_b_conv_sk(w_q, w_bsk))
    fused = np.asarray(tool.fast_floor_scale_fast_b_conv_sk(d_q, d_bsk))
    np.testing.assert_array_equal(legacy, fused)


@pytest.mark.parametrize("wide", [False, True])
def test_hps_lift_congruence(wide):
    """fast_b_conv_hps output composes to x + d*Q for d in {-1, 0, +1}."""
    tool = make_tool(wide)
    base = tool.base_q
    Q = base.prod
    values = [int.from_bytes(RNG.bytes(32), "little") % Q for _ in range(N)]
    # adversarial near-boundary values (x close to 0 and to Q)
    values[0], values[1], values[2] = 0, 1, Q - 1
    x = decompose(base, values, wide)
    y = tool.fast_b_conv_hps(x)
    composed = compose(tool.base_Bsk, y, wide)
    P = tool.base_Bsk.prod
    for c, v in enumerate(values):
        Y = composed[c]
        if Y > P // 2:
            Y -= P
        assert Y in (v - Q, v, v + Q), (c, v, Y)


@pytest.mark.parametrize("wide", [False, True])
def test_bfv_multiply_hps_matches_behz_plaintext(wide, monkeypatch):
    """encrypt -> multiply -> relinearize -> decrypt gives the same
    plaintext under both input-lift modes; noise budget stays positive."""
    q_bits = (45, 45, 45, 45) if wide else (30, 30, 30, 30)
    h = GeneralHeContext("BFV", 32, log_t=16, q_bits=q_bits)
    rk = h.keygen.create_relin_keys()
    m1, m2 = h.random_simd(RNG), h.random_simd(RNG)
    ct1, ct2 = h.encrypt(m1), h.encrypt(m2)

    results = {}
    for mode in ("hps", "behz"):
        monkeypatch.setenv("TROY_BFV_BCONV", mode)
        prod = h.evaluator.relinearize(h.evaluator.multiply(ct1, ct2), rk)
        assert h.decryptor.invariant_noise_budget(prod) > 0, mode
        results[mode] = np.asarray(h.decrypt(prod))
    np.testing.assert_array_equal(results["hps"], results["behz"])
    expected = (m1.astype(object) * m2.astype(object)) % h.t
    np.testing.assert_array_equal(results["hps"].astype(object), expected)
