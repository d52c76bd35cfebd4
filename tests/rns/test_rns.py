"""RNS machinery tests vs Python-int oracles
(mirrors reference test/utils/{rns_base,rns_tool}.cu coverage)."""

import numpy as np
import jax.numpy as jnp

from troy_tpu.core.modulus import Modulus
from troy_tpu.utils import numth
from troy_tpu.rns.rns_base import RNSBase, BaseConverter
from troy_tpu.rns.rns_tool import RNSTool
from troy_tpu.rns.scaling import BFVScaler

RNG = np.random.default_rng(11)
LOG_N = 4
N = 1 << LOG_N


def make_base(L, log_n=LOG_N):
    primes = numth.get_primes(2 * (1 << log_n), 30, L)
    return RNSBase([Modulus(p) for p in primes])


def rand_ints(base, count):
    return [int.from_bytes(RNG.bytes(16), "little") % base.prod for _ in range(count)]


def test_compose_decompose():
    base = make_base(3)
    for v in rand_ints(base, 10):
        assert base.compose(base.decompose(v)) == v
    arr = base.decompose_array_host(rand_ints(base, N))
    back = base.compose_array_host(arr)
    np.testing.assert_array_equal(base.decompose_array_host(back), arr)


def test_base_converter():
    ibase = make_base(3)
    obase = RNSBase([Modulus(p) for p in numth.get_primes(2 * N, 29, 4)])
    conv = BaseConverter(ibase, obase)
    values = rand_ints(ibase, N)
    x = jnp.asarray(ibase.decompose_array_host(values))
    y = np.asarray(conv.convert(x))
    Q = ibase.prod
    for j, p in enumerate(obase.values):
        for c, v in enumerate(values):
            candidates = {(v + a * Q) % p for a in range(ibase.size + 1)}
            assert int(y[j, c]) in candidates, (j, c)


def test_sm_mrq_centered_exact():
    """sm_mrq output must be the centered representative: the composed Bsk
    integer equals x, x - Q or x + Q exactly (BEHZ Lemma 2 with rho ~ L/m_tilde)."""
    base = make_base(3)
    tool = RNSTool(LOG_N, base, Modulus(numth.get_prime(2 * N, 20)))
    values = rand_ints(base, N)
    x = jnp.asarray(base.decompose_array_host(values))
    y = np.asarray(tool.fast_b_conv_m_tilde_sm_mrq(x))
    Q = base.prod
    bsk = tool.base_Bsk
    composed = bsk.compose_array_host(y)
    for c, v in enumerate(values):
        Y = composed[c]
        if Y > bsk.prod // 2:
            Y -= bsk.prod
        assert Y in (v, v - Q, v + Q), (c, v, Y)


def test_fast_floor_fast_b_conv_sk():
    base = make_base(3)
    tool = RNSTool(LOG_N, base, Modulus(numth.get_prime(2 * N, 20)))
    Q = base.prod
    # w up to the BEHZ bound (t * n * Q ~); keep below prod(B)/4 for Shenoy
    bound = min(tool.base_B.prod // 4, Q * Q // 16)
    values = [int.from_bytes(RNG.bytes(32), "little") % bound for _ in range(N)]
    w_q = jnp.asarray(base.decompose_array_host(values))
    w_bsk = jnp.asarray(tool.base_Bsk.decompose_array_host(values))
    y = np.asarray(tool.fast_floor_fast_b_conv_sk(w_q, w_bsk))
    for c, v in enumerate(values):
        floor = v // Q
        got = [int(y[i, c]) for i in range(base.size)]
        # error in [0, L] from the approximate fast_floor conversion
        ok = any(
            all(g == (floor + e) % q for g, q in zip(got, base.values))
            for e in range(-(base.size + 1), base.size + 2)
        )
        assert ok, (c, v, floor, got)


def test_divide_and_round_q_last():
    base = make_base(4)
    tool = RNSTool(LOG_N, base, Modulus(numth.get_prime(2 * N, 20)))
    values = rand_ints(base, N)
    x = jnp.asarray(base.decompose_array_host(values))
    y = np.asarray(tool.divide_and_round_q_last(x))
    q_last = base.values[-1]
    for c, v in enumerate(values):
        want = (v + q_last // 2) // q_last
        for i, q in enumerate(base.values[:-1]):
            assert int(y[i, c]) == want % q, (c, i)


def test_decrypt_scale_and_round():
    base = make_base(3)
    t = Modulus(numth.get_prime(2 * N, 20))
    tool = RNSTool(LOG_N, base, t)
    Q = base.prod
    delta = Q // t.value
    m = RNG.integers(0, t.value, size=N)
    v = [int.from_bytes(RNG.bytes(16), "little") % (delta // 2) - delta // 4 for _ in range(N)]
    phase = [(int(m[i]) * delta + v[i]) % Q for i in range(N)]
    x = jnp.asarray(base.decompose_array_host(phase))
    got = np.asarray(tool.decrypt_scale_and_round(x))
    # round(t * phase / Q) mod t == m for small noise
    np.testing.assert_array_equal(got, m.astype(np.uint32))


def test_decrypt_mod_t():
    base = make_base(3)
    t = Modulus(numth.get_prime(2 * N, 20))
    tool = RNSTool(LOG_N, base, t)
    Q = base.prod
    e = RNG.integers(-(1 << 40), 1 << 40, size=N)
    m = RNG.integers(0, t.value, size=N)
    vals = [(int(m[i]) + t.value * int(e[i])) % Q for i in range(N)]
    x = jnp.asarray(base.decompose_array_host(vals))
    got = np.asarray(tool.decrypt_mod_t(x))
    np.testing.assert_array_equal(got, m.astype(np.uint32))


def test_scale_up_and_centralize():
    base = make_base(3)
    t = Modulus(numth.get_prime(2 * N, 20))
    scaler = BFVScaler(base, t)
    Q = base.prod
    m = RNG.integers(0, t.value, size=N).astype(np.uint32)
    up = np.asarray(scaler.scale_up(jnp.asarray(m)))
    for c in range(N):
        want = (int(m[c]) * Q + t.value // 2) // t.value  # round(m*Q/t)
        for i, q in enumerate(base.values):
            assert int(up[i, c]) == want % q, (c, i)
    cent = np.asarray(scaler.centralize(jnp.asarray(m)))
    for c in range(N):
        mc = int(m[c])
        centered = mc - t.value if mc >= (t.value + 1) // 2 else mc
        for i, q in enumerate(base.values):
            assert int(cent[i, c]) == centered % q
    back = np.asarray(scaler.decentralize(jnp.asarray(cent)))
    np.testing.assert_array_equal(back, m)


def test_base_converter_mxu_bit_identical():
    """The int8-plane MXU base conversion (round-4 joint offload experiment)
    is bit-identical to the VPU wide-accumulation dot, including a batched
    leading axis and a large input base (contraction 15)."""
    from troy_tpu.rns import rns_base as RB

    for L_in, L_out in [(3, 4), (15, 9)]:
        ibase = make_base(L_in)
        obase = RNSBase([Modulus(p)
                         for p in numth.get_primes(2 * N, 29, L_out)])
        conv = BaseConverter(ibase, obase)
        values = rand_ints(ibase, N)
        values2 = rand_ints(ibase, N)
        x = jnp.asarray(np.stack([ibase.decompose_array_host(values),
                                  ibase.decompose_array_host(values2)]))
        prev = RB.get_bconv_backend()
        try:
            RB.set_bconv_backend("vpu")
            y_vpu = np.asarray(conv.convert(x))
            RB.set_bconv_backend("mxu")
            y_mxu = np.asarray(conv.convert(x))
            RB.set_bconv_backend("pallas")  # fused kernel (interpret on CPU)
            y_pl = np.asarray(conv.convert(x))
        finally:
            RB.set_bconv_backend(prev)
        np.testing.assert_array_equal(y_vpu, y_mxu)
        np.testing.assert_array_equal(y_vpu, y_pl)


def test_behz_pipeline_with_mxu_bconv():
    """Full BEHZ multiply stages stay exact when every BaseConverter runs
    through the MXU path (sm_mrq centered-representative property)."""
    from troy_tpu.rns import rns_base as RB

    base = make_base(3)
    tool = RNSTool(LOG_N, base, Modulus(numth.get_prime(2 * N, 20)))
    values = rand_ints(base, N)
    x = jnp.asarray(base.decompose_array_host(values))
    prev = RB.get_bconv_backend()
    try:
        RB.set_bconv_backend("vpu")
        y_vpu = np.asarray(tool.fast_b_conv_m_tilde_sm_mrq(x))
        RB.set_bconv_backend("mxu")
        y_mxu = np.asarray(tool.fast_b_conv_m_tilde_sm_mrq(x))
    finally:
        RB.set_bconv_backend(prev)
    np.testing.assert_array_equal(y_vpu, y_mxu)


def test_compose_centered_f64_host_matches_bigint():
    """The f64 fixed-point fractional-CRT compose (host decode fast path)
    must match float64(big-int compose, centered) to <= 2 ulp at every
    magnitude, both widths."""
    import numpy as np
    from troy_tpu.rns.rns_base import RNSBase
    from troy_tpu.core.modulus import Modulus
    from troy_tpu.utils import numth

    rng = np.random.default_rng(77)
    for bits, L in ((30, 7), (60, 3)):
        primes = numth.get_primes(1 << 8, bits, L)
        base = RNSBase([Modulus(p) for p in primes])
        arr = np.stack([rng.integers(0, p, 256, dtype=np.uint64)
                        for p in primes])
        comp = np.array(base.compose_array_host(arr), dtype=object)
        want = np.where(comp > base.prod // 2, comp - base.prod,
                        comp).astype(np.float64)
        got = base.compose_centered_f64_host(arr)
        rel = np.abs(got - want) / np.maximum(np.abs(want), 1)
        assert rel.max() < 3 * 2 ** -52
        # magnitude edges: +-1, Q//2, tiny and huge values
        vals = [0, 1, 2, base.prod // 2, base.prod - 1, 12345]
        e = np.stack([np.array([v % q for v in vals], dtype=np.uint64)
                      for q in base.values])
        ge = base.compose_centered_f64_host(e)
        wexp = np.array([float(v if v <= base.prod // 2 else v - base.prod)
                         for v in vals])
        np.testing.assert_allclose(ge, wexp, rtol=1e-15)
