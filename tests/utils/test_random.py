"""RandomGenerator tests: determinism, distributions, AES parity mode
(mirrors reference test/utils/random_generator.cu)."""

import numpy as np
import pytest

from troy_tpu.utils.random import RandomGenerator, uniform_from_seed
from troy_tpu.ops.poly import scalar_pack
from troy_tpu.core.modulus import Modulus
from troy_tpu.utils import numth
from troy_tpu import native

QTAB = scalar_pack([Modulus(p) for p in numth.get_primes(64, 30, 2)])
N = 256


def test_determinism_and_stream_separation():
    a = RandomGenerator(42)
    b = RandomGenerator(42)
    x1 = np.asarray(a.sample_uniform((2, N), QTAB))
    y1 = np.asarray(b.sample_uniform((2, N), QTAB))
    np.testing.assert_array_equal(x1, y1)
    # subsequent draws differ from the first
    x2 = np.asarray(a.sample_uniform((2, N), QTAB))
    assert (x1 != x2).any()
    # different seeds differ
    z = np.asarray(RandomGenerator(43).sample_uniform((2, N), QTAB))
    assert (x1 != z).any()


def test_domain_separation_and_seed_publication():
    """Advisor findings: published seeds must be one-way in the master seed;
    consumers sharing a context seed must get independent streams."""
    a = RandomGenerator(42, domain="encryptor")
    b = RandomGenerator(42, domain="keygen")
    xa = np.asarray(a.sample_uniform((2, N), QTAB))
    xb = np.asarray(b.sample_uniform((2, N), QTAB))
    assert (xa != xb).any()  # same seed, different domains -> different streams
    # new_seed is deterministic per (seed, domain), nonzero, and NOT the old
    # invertible affine map seed*phi + counter
    g1, g2 = RandomGenerator(42), RandomGenerator(42)
    s1, s2 = g1.new_seed(), g2.new_seed()
    assert s1 == s2 and s1 != 0
    assert s1 != (42 * 0x9E3779B97F4A7C15 + 1) & ((1 << 63) - 1)
    assert g1.new_seed() != s1  # counter advances
    # default-constructed generators draw fresh entropy (>=128-bit seeds)
    assert RandomGenerator().seed != RandomGenerator().seed


def test_wide_context_defaults_fresh_entropy():
    """Two default-seeded wide (40-bit-prime) contexts must not share key
    material (the removed compat stack once defaulted to a fixed seed —
    ADVICE r1; the unified stack draws OS entropy per context)."""
    from troy_tpu.core.params import EncryptionParameters, SchemeType
    from troy_tpu.core.context import HeContext
    from troy_tpu.core.coeff_modulus import CoeffModulus, SecurityLevel
    from troy_tpu.core.keygen import KeyGenerator

    def fresh_sk():
        parms = EncryptionParameters(SchemeType.CKKS)
        parms.set_poly_modulus_degree(32)
        parms.set_coeff_modulus(CoeffModulus.create(32, [40, 40]))
        ctx = HeContext.create(parms, False, SecurityLevel.Nil)
        return np.asarray(KeyGenerator(ctx).secret_key.data)

    assert not (fresh_sk() == fresh_sk()).all()


def test_seeded_c1_regeneration():
    s = 12345
    a = uniform_from_seed(s, (2, N), QTAB)
    b = uniform_from_seed(s, (2, N), QTAB)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_distributions():
    g = RandomGenerator(7)
    q = np.asarray(QTAB["q"])
    u = np.asarray(g.sample_uniform((2, 4096), QTAB))
    assert (u < q[:, None]).all()
    assert u.mean() > 0.3 * q.mean()  # roughly uniform
    t = np.asarray(g.sample_ternary((4096,), QTAB))
    vals = set(np.unique(t[0]).tolist())
    assert vals <= {0, 1, int(q[0]) - 1}
    e = np.asarray(g.sample_cbd((4096,), QTAB))[0].astype(np.int64)
    centered = np.where(e > int(q[0]) // 2, e - int(q[0]), e)
    assert abs(centered.mean()) < 1.0
    assert np.abs(centered).max() <= 21


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_aes_mode_deterministic_and_valid():
    a = RandomGenerator(99, mode="aes")
    b = RandomGenerator(99, mode="aes")
    x = np.asarray(a.sample_uniform((2, N), QTAB))
    y = np.asarray(b.sample_uniform((2, N), QTAB))
    np.testing.assert_array_equal(x, y)
    q = np.asarray(QTAB["q"])
    assert (x < q[:, None]).all()
    t = np.asarray(a.sample_ternary((N,), QTAB))
    assert set(np.unique(t[0]).tolist()) <= {0, 1, int(q[0]) - 1}
    e = np.asarray(a.sample_cbd((N,), QTAB))[0].astype(np.int64)
    centered = np.where(e > int(q[0]) // 2, e - int(q[0]), e)
    assert np.abs(centered).max() <= 21


def test_encryption_with_aes_prng():
    import sys
    sys.path.insert(0, "tests")
    from tests.core.fixtures import GeneralHeContext
    from troy_tpu.core.encryptor import Encryptor

    if not native.available():
        pytest.skip("native lib unavailable")
    h = GeneralHeContext("BFV", 32, log_t=20, q_bits=(30, 30, 30))
    enc_aes = Encryptor(h.context, pk=h.pk, sk=h.sk,
                        prng=RandomGenerator(5, mode="aes"))
    rng = np.random.default_rng(0)
    m = h.random_simd(rng)
    ct = enc_aes.encrypt_asymmetric(h.encoder.encode(m))
    np.testing.assert_array_equal(h.encoder.decode(h.decryptor.decrypt(ct)), m)


def test_pure_key_twins_match_stateful_samplers():
    """uniform/ternary/cbd_from_keys (the traceable twins used by the fused
    encrypt kernels, core/rlwe.py) must reproduce the stateful threefry
    stream draw-for-draw at both residue widths."""
    import jax
    from troy_tpu.utils.random import (uniform_from_keys, ternary_from_keys,
                                       cbd_from_keys)
    from troy_tpu.ops.ntt64 import NTT64Tables

    wide_qtab = NTT64Tables(9, [numth.get_prime(1 << 10, 40),
                                numth.get_prime(1 << 10, 60)]).pack()
    for qtab in (QTAB, wide_qtab):
        g_state = RandomGenerator(97)
        g_keys = RandomGenerator(97)
        keys = g_keys.next_key_pairs(3)
        want_u = np.asarray(g_state.sample_uniform((2, N), qtab))
        want_t = np.asarray(g_state.sample_ternary((N,), qtab))
        want_c = np.asarray(g_state.sample_cbd((N,), qtab))
        got_u = np.asarray(jax.jit(
            lambda k: uniform_from_keys(k, (2, N), qtab))(keys[0]))
        got_t = np.asarray(jax.jit(
            lambda k: ternary_from_keys(k, (N,), qtab))(keys[1]))
        got_c = np.asarray(jax.jit(
            lambda k: cbd_from_keys(k, (N,), qtab))(keys[2]))
        np.testing.assert_array_equal(want_u, got_u)
        np.testing.assert_array_equal(want_t, got_t)
        np.testing.assert_array_equal(want_c, got_c)


def test_reserved_counter_fold_in_matches_stateful():
    """reserve_counters + in-trace fold_in_keys (the zero-dispatch key
    derivation the fused encrypt kernels use) must reproduce the stateful
    stream, including with a TRACED uint32 counter."""
    import jax
    import jax.numpy as jnp
    from troy_tpu.utils.random import uniform_from_keys, fold_in_keys

    g_state = RandomGenerator(1234)
    g_fused = RandomGenerator(1234)
    want1 = np.asarray(g_state.sample_uniform((2, N), QTAB))
    want2 = np.asarray(g_state.sample_uniform((2, N), QTAB))
    ka, kb = g_fused.base_keys
    c0 = g_fused.reserve_counters(2)

    @jax.jit
    def draw(a, b, c):
        x1 = uniform_from_keys(fold_in_keys((a, b), c), (2, N), QTAB)
        x2 = uniform_from_keys(fold_in_keys((a, b), c + 1), (2, N), QTAB)
        return x1, x2

    got1, got2 = draw(ka, kb, np.uint32(c0))
    np.testing.assert_array_equal(want1, np.asarray(got1))
    np.testing.assert_array_equal(want2, np.asarray(got2))
    assert g_fused._counter == g_state._counter
