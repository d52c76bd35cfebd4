"""Ring2k width matrix (mirrors reference test/app/bfv_ring2k.cu:
ScaleUpDown / CentralizeDecentralize / Encrypt / HeOperations across the
u32 / u64 / u128 template widths, plus the Batched variants; the
Host/Device doubling collapses to the one JAX path)."""

import numpy as np
import pytest

from tests.core.fixtures import GeneralHeContext
from troy_tpu.app.ring2k import PolynomialEncoderRing2k

RNG = np.random.default_rng(909)

# representative k per reference template width: u32 (k<=32), u64, u128
KS = [8, 17, 31, 32, 48, 64, 100, 128]

_ctx = {}


def make(k):
    if k not in _ctx:
        limbs = 4 if k <= 60 else (6 if k <= 100 else 8)
        h = GeneralHeContext("BFV", 32, log_t=20, q_bits=(30,) * limbs)
        _ctx[k] = (h, PolynomialEncoderRing2k(h.context, k))
    return _ctx[k]


def rand_vals(k, n):
    mask = (1 << k) - 1
    return [int.from_bytes(RNG.bytes(17), "little") & mask for _ in range(n)]


@pytest.mark.parametrize("k", KS)
def test_scale_up_down_matrix(k):
    h, enc = make(k)
    m = rand_vals(k, h.n)
    got = enc.scale_down(enc.scale_up(m))
    assert [int(g) for g in got] == m


@pytest.mark.parametrize("k", KS)
def test_centralize_decentralize_matrix(k):
    h, enc = make(k)
    m = rand_vals(k, h.n)
    got = enc.decentralize(enc.centralize(m))
    assert [int(g) for g in got] == m


@pytest.mark.parametrize("k", [17, 48, 100])
def test_centralize_decentralize_boundary(k):
    """Values at the centering threshold: 0, 1, 2^(k-1)-1, 2^(k-1), 2^k-1."""
    h, enc = make(k)
    edge = [0, 1, (1 << (k - 1)) - 1, 1 << (k - 1), (1 << k) - 1]
    m = (edge * (h.n // len(edge) + 1))[: h.n]
    got = enc.decentralize(enc.centralize(m))
    assert [int(g) for g in got] == m


@pytest.mark.parametrize("k", [20, 48, 100])
@pytest.mark.parametrize("asym", [True, False])
def test_encrypt_matrix(k, asym):
    h, enc = make(k)
    m = rand_vals(k, h.n)
    pt = enc.scale_up(m)
    ct = (h.encryptor.encrypt_asymmetric(pt) if asym
          else h.encryptor.encrypt_symmetric(pt))
    got = enc.decrypt_scale_down(h.decryptor, ct)
    assert [int(g) for g in got] == m


@pytest.mark.parametrize("k", [20, 48, 100])
def test_he_operations_matrix(k):
    """add / sub / add_plain / multiply_plain(centralized) over Z_2^k
    (ref HeOperations cases).  The plain product grows the phase error by
    n * 2^(k-1), so this needs log Q > 2k + ~14 — wider chains than the
    roundtrip tests."""
    limbs = {20: 4, 48: 5, 100: 8}[k]
    h = GeneralHeContext("BFV", 32, log_t=20, q_bits=(30,) * limbs)
    enc = PolynomialEncoderRing2k(h.context, k)
    mask = (1 << k) - 1
    n = h.n
    m1, m2 = rand_vals(k, n), rand_vals(k, n)
    c1 = h.encryptor.encrypt_asymmetric(enc.scale_up(m1))
    c2 = h.encryptor.encrypt_asymmetric(enc.scale_up(m2))
    got = enc.decrypt_scale_down(h.decryptor, h.evaluator.add(c1, c2))
    assert [int(g) for g in got] == [(a + b) & mask for a, b in zip(m1, m2)]
    got = enc.decrypt_scale_down(h.decryptor, h.evaluator.sub(c1, c2))
    assert [int(g) for g in got] == [(a - b) & mask for a, b in zip(m1, m2)]
    got = enc.decrypt_scale_down(
        h.decryptor, h.evaluator.add_plain(c1, enc.scale_up(m2)))
    assert [int(g) for g in got] == [(a + b) & mask for a, b in zip(m1, m2)]
    # negacyclic polynomial product with a centralized plain
    prod = h.evaluator.multiply_plain(c1, enc.centralize(m2))
    want = np.zeros(n, dtype=object)
    for i in range(n):
        for j in range(n):
            idx, sgn = (i + j, 1) if i + j < n else (i + j - n, -1)
            want[idx] += sgn * m1[i] * m2[j]
    got = enc.decrypt_scale_down(h.decryptor, prod)
    assert [int(g) for g in got] == [int(w) & mask for w in want]


@pytest.mark.parametrize("k", [20, 48])
def test_scale_up_batched_matrix(k):
    """Batched scale-up/centralize over a list of messages
    (ref DeviceScaleUpDownBatched / CentralizeDecentralizeBatched)."""
    h, enc = make(k)
    B = 3
    ms = [rand_vals(k, h.n) for _ in range(B)]
    pts = [enc.scale_up(m) for m in ms]
    for pt, m in zip(pts, ms):
        assert [int(g) for g in enc.scale_down(pt)] == m
    cts = h.encryptor.encrypt_asymmetric_batched(pts) \
        if hasattr(h.encryptor, "encrypt_asymmetric_batched") \
        else [h.encryptor.encrypt_asymmetric(p) for p in pts]
    for ct, m in zip(cts, ms):
        assert [int(g) for g in enc.decrypt_scale_down(h.decryptor, ct)] == m
