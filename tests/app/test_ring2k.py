"""Ring2k encoder tests (mirrors reference test/app coverage for
bfv_ring2k u32; examples/13_ring2k.cu)."""

import numpy as np

from tests.core.fixtures import GeneralHeContext
from troy_tpu.app.ring2k import PolynomialEncoderRing2k

RNG = np.random.default_rng(606)


def make(k):
    h = GeneralHeContext("BFV", 32, log_t=20, q_bits=(30, 30, 30, 30))
    return h, PolynomialEncoderRing2k(h.context, k)


def test_scale_up_down_roundtrip():
    for k in (8, 17, 31):
        h, enc = make(k)
        m = RNG.integers(0, 1 << k, size=h.n, dtype=np.uint64)
        pt = enc.scale_up(m)
        ct = h.encryptor.encrypt_asymmetric(pt)
        out = enc.decrypt_scale_down(h.decryptor, ct)
        np.testing.assert_array_equal(out, m, err_msg=f"k={k}")


def test_homomorphic_add():
    k = 20
    h, enc = make(k)
    mask = (1 << k) - 1
    m1 = RNG.integers(0, 1 << k, size=h.n, dtype=np.uint64)
    m2 = RNG.integers(0, 1 << k, size=h.n, dtype=np.uint64)
    ct1 = h.encryptor.encrypt_asymmetric(enc.scale_up(m1))
    ct2 = h.encryptor.encrypt_asymmetric(enc.scale_up(m2))
    s = h.evaluator.add(ct1, ct2)
    np.testing.assert_array_equal(
        enc.decrypt_scale_down(h.decryptor, s), (m1 + m2) & mask)
    # add_plain with scale-up form
    s2 = h.evaluator.add_plain(ct1, enc.scale_up(m2))
    np.testing.assert_array_equal(
        enc.decrypt_scale_down(h.decryptor, s2), (m1 + m2) & mask)


def test_wide_k_roundtrip_and_add():
    """k > 31: host big-int path (reference u64/u128 instantiations).
    k=100 needs a wider modulus chain (Q_first must exceed 2^k by the noise
    margin)."""
    for k in (48, 64, 100):
        h = GeneralHeContext("BFV", 32, log_t=20,
                             q_bits=(30,) * (6 if k > 60 else 4))
        enc = PolynomialEncoderRing2k(h.context, k)
        mask = (1 << k) - 1
        m1 = [int.from_bytes(RNG.bytes(16), "little") & mask for _ in range(h.n)]
        m2 = [int.from_bytes(RNG.bytes(16), "little") & mask for _ in range(h.n)]
        ct1 = h.encryptor.encrypt_asymmetric(enc.scale_up(m1))
        out = enc.decrypt_scale_down(h.decryptor, ct1)
        assert all(int(o) == m for o, m in zip(out, m1)), f"k={k} roundtrip"
        s = h.evaluator.add_plain(ct1, enc.scale_up(m2))
        out2 = enc.decrypt_scale_down(h.decryptor, s)
        assert all(int(o) == (a + b) & mask
                   for o, a, b in zip(out2, m1, m2)), f"k={k} add"


def test_multiply_centralized_plain():
    k = 16
    h, enc = make(k)
    mask = (1 << k) - 1
    m1 = RNG.integers(0, 1 << k, size=h.n, dtype=np.uint64)
    m2 = RNG.integers(0, 1 << k, size=h.n, dtype=np.uint64)
    ct = h.encryptor.encrypt_asymmetric(enc.scale_up(m1))
    pt = enc.centralize(m2)
    prod = h.evaluator.multiply_plain(ct, pt)
    # negacyclic polynomial product mod 2^k
    n = h.n
    want = np.zeros(n, dtype=object)
    for i in range(n):
        for j in range(n):
            idx, sgn = (i + j, 1) if i + j < n else (i + j - n, -1)
            want[idx] += sgn * int(m1[i]) * int(m2[j])
    want = np.array([w % (1 << k) for w in want], dtype=np.uint64)
    np.testing.assert_array_equal(enc.decrypt_scale_down(h.decryptor, prod), want)


def test_wide_device_matches_host_oracle():
    """31 < k: the 16-bit limb-plane device path must match the big-int
    host oracle bit for bit (scale_up; centralize vs direct lift)."""
    for k in (48, 64, 100):
        h = GeneralHeContext("BFV", 32, log_t=20,
                             q_bits=(30,) * (6 if k > 60 else 4))
        enc = PolynomialEncoderRing2k(h.context, k)
        m = [int.from_bytes(RNG.bytes(16), "little") & ((1 << k) - 1)
             for _ in range(h.n)]
        dev = np.asarray(enc.scale_up(m).data)
        host = np.asarray(enc.scale_up_host(m).data)
        np.testing.assert_array_equal(dev, host, err_msg=f"scale_up k={k}")
        cd = h.context.first_context_data()
        cent = np.asarray(enc.centralize(m).data)
        t = 1 << k
        for i, q in enumerate(cd.base_q.values):
            want = [(v - t if v >= t // 2 else v) % q for v in m]
            assert [int(c) for c in cent[i]] == want, f"centralize k={k} q={q}"


def test_wide_scale_down_device_matches_host():
    """Random phases: device {t, gamma} rounding == host big-int rounding."""
    for k in (48, 100):
        h = GeneralHeContext("BFV", 32, log_t=20,
                             q_bits=(30,) * (6 if k > 60 else 4))
        enc = PolynomialEncoderRing2k(h.context, k)
        cd = h.context.first_context_data()
        from troy_tpu.core.plaintext import Plaintext
        import jax.numpy as jnp
        phase = np.stack([
            RNG.integers(0, q, size=h.n, dtype=np.uint64).astype(np.uint32)
            for q in cd.base_q.values])
        pt = Plaintext(jnp.asarray(phase), parms_id=cd.parms_id,
                       is_ntt_form=False)
        dev = enc.scale_down(pt)
        host = enc.scale_down_host(pt)
        assert [int(a) for a in dev] == [int(b) for b in host], f"k={k}"


def test_wide_multiply_centralized_plain():
    """k=48 ct x centralized-plain product mod 2^k on the device path."""
    k = 48
    h = GeneralHeContext("BFV", 32, log_t=20, q_bits=(30,) * 5)
    enc = PolynomialEncoderRing2k(h.context, k)
    mask = (1 << k) - 1
    n = h.n
    m1 = [int.from_bytes(RNG.bytes(8), "little") & mask for _ in range(n)]
    m2 = [int.from_bytes(RNG.bytes(8), "little") & mask for _ in range(n)]
    ct = h.encryptor.encrypt_asymmetric(enc.scale_up(m1))
    prod = h.evaluator.multiply_plain(ct, enc.centralize(m2))
    want = np.zeros(n, dtype=object)
    for i in range(n):
        for j in range(n):
            idx, sgn = (i + j, 1) if i + j < n else (i + j - n, -1)
            want[idx] += sgn * m1[i] * m2[j]
    got = enc.decrypt_scale_down(h.decryptor, prod)
    assert [int(g) for g in got] == [w & mask for w in want]


def test_k32_boundary():
    """k=32 is the first wide-width value (W=2 limbs) — roundtrip + add."""
    k = 32
    h = GeneralHeContext("BFV", 32, log_t=20, q_bits=(30,) * 4)
    enc = PolynomialEncoderRing2k(h.context, k)
    mask = (1 << k) - 1
    m1 = [int.from_bytes(RNG.bytes(4), "little") for _ in range(h.n)]
    m2 = [int.from_bytes(RNG.bytes(4), "little") for _ in range(h.n)]
    ct = h.encryptor.encrypt_asymmetric(enc.scale_up(m1))
    out = enc.decrypt_scale_down(h.decryptor, ct)
    assert [int(o) for o in out] == m1
    s = h.evaluator.add_plain(ct, enc.scale_up(m2))
    out2 = enc.decrypt_scale_down(h.decryptor, s)
    assert [int(o) for o in out2] == [(a + b) & mask for a, b in zip(m1, m2)]
