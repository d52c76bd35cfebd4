"""Large-degree coverage: the reference supports n up to 131072
(ref: src/constants.h:13 POLY_MOD_DEGREE_MAX).  Scheme-level round trips at
n=32768 pin the full pipeline; at n=131072 a table-build + encode/NTT smoke
test pins the setup path (full encryption at that size is a bench concern,
not a unit-test one)."""

import numpy as np
import pytest

from tests.core.fixtures import GeneralHeContext

RNG = np.random.default_rng(0xB16)


@pytest.fixture(scope="module")
def ctx32k():
    # 6x30-bit chain: fresh noise scales with n, so n=32768 needs a wider Q
    # than the small-n suites for multiply headroom (budget ~27 bits at 3x30)
    return GeneralHeContext("BFV", 32768, log_t=20, q_bits=(30,) * 6,
                            expand_mod_chain=False)


def test_n32768_bfv_mul_relin_roundtrip(ctx32k):
    g = ctx32k
    m1 = g.random_simd(RNG)
    m2 = g.random_simd(RNG)
    ct = g.evaluator.multiply(g.encrypt(m1), g.encrypt(m2))
    rlk = g.keygen.create_relin_keys()
    ct = g.evaluator.relinearize(ct, rlk)
    got = g.decrypt(ct)
    want = (m1.astype(object) * m2.astype(object)) % g.t
    np.testing.assert_array_equal(got.astype(object), want)


def test_n32768_rotate(ctx32k):
    g = ctx32k
    m = g.random_simd(RNG)
    gk = g.keygen.create_galois_keys()
    got = g.decrypt(g.evaluator.rotate_rows(g.encrypt(m), 1, gk))
    half = g.encoder.slot_count // 2
    want = np.concatenate([np.roll(m[:half], -1), np.roll(m[half:], -1)])
    np.testing.assert_array_equal(got, want)


def test_n131072_setup_and_ntt_smoke():
    """Table build + batch-encode + NTT/INTT round trip at the reference's
    maximum degree (ref: constants.h:13) — no keygen/encrypt (bench-scale)."""
    from troy_tpu.core.params import EncryptionParameters, SchemeType
    from troy_tpu.core.context import HeContext
    from troy_tpu.core.coeff_modulus import CoeffModulus, PlainModulus
    from troy_tpu.core.coeff_modulus import SecurityLevel
    from troy_tpu.core.batch_encoder import BatchEncoder
    from troy_tpu.ops import rp as R

    n = 131072
    parms = EncryptionParameters(SchemeType.BFV)
    parms.set_poly_modulus_degree(n)
    parms.set_coeff_modulus(CoeffModulus.create(n, [30, 30]))
    parms.set_plain_modulus(PlainModulus.batching(n, 20))
    ctx = HeContext.create(parms, False, SecurityLevel.Nil, 0x5EED)
    cd = ctx.first_context_data()
    enc = BatchEncoder(ctx)
    msg = RNG.integers(0, parms.plain_modulus.value, size=enc.slot_count,
                       dtype=np.uint64)
    pt = enc.encode(msg)
    np.testing.assert_array_equal(enc.decode(pt), msg)
    qtab = cd.qtab()
    x = pt.data[None].repeat(cd.coeff_modulus_size, axis=0)
    back = R.ntt_inverse(R.ntt_forward(x, qtab), qtab)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
