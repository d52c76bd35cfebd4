"""Compat-mode CKKS at SEAL-default prime sizes (scale 2^40, {60,40,40,60}
primes) — the parameter shapes the u32 fast path cannot express.
Mirrors reference test/evaluator.cu CKKS cases at 64-bit width."""

import numpy as np
import pytest

from troy_tpu.compat import (
    Ckks64Context, Ckks64Encoder, Ckks64KeyGenerator,
    Ckks64Encryptor, Ckks64Decryptor, Ckks64Evaluator,
)

RNG = np.random.default_rng(77)
SCALE = 2.0 ** 40


class H:
    def __init__(self, log_n=5, bits=(60, 40, 40, 60)):
        self.ctx = Ckks64Context(log_n, bits, SCALE, seed=123)
        self.encoder = Ckks64Encoder(self.ctx)
        self.keygen = Ckks64KeyGenerator(self.ctx)
        self.encryptor = Ckks64Encryptor(self.ctx, self.keygen)
        self.decryptor = Ckks64Decryptor(self.ctx, self.keygen, self.encoder)
        self.evaluator = Ckks64Evaluator(self.ctx)

    def msg(self):
        s = self.encoder.slot_count
        return RNG.uniform(-1, 1, s) + 1j * RNG.uniform(-1, 1, s)

    def enc(self, v, level=0):
        return self.encryptor.encrypt(self.encoder.encode(v, level))


@pytest.fixture(scope="module")
def h():
    return H()


def test_encode_decode_roundtrip(h):
    v = h.msg()
    pt = h.encoder.encode(v)
    got = h.encoder.decode(
        *__import__("troy_tpu.ops.ntt64", fromlist=["x"]).ntt_inverse64(
            pt.hi[0], pt.lo[0], h.ctx.level(0).tab), 0, SCALE)
    np.testing.assert_allclose(got, v, atol=1e-9)


def test_encrypt_decrypt(h):
    v = h.msg()
    np.testing.assert_allclose(h.decryptor.decrypt(h.enc(v)), v, atol=1e-8)


def test_add_sub_negate(h):
    v1, v2 = h.msg(), h.msg()
    c1, c2 = h.enc(v1), h.enc(v2)
    np.testing.assert_allclose(
        h.decryptor.decrypt(h.evaluator.add(c1, c2)), v1 + v2, atol=1e-8)
    np.testing.assert_allclose(
        h.decryptor.decrypt(h.evaluator.sub(c1, c2)), v1 - v2, atol=1e-8)
    np.testing.assert_allclose(
        h.decryptor.decrypt(h.evaluator.negate(c1)), -v1, atol=1e-8)


def test_multiply_size3_decrypt(h):
    v1, v2 = h.msg(), h.msg()
    prod = h.evaluator.multiply(h.enc(v1), h.enc(v2))
    assert prod.size == 3
    np.testing.assert_allclose(
        h.decryptor.decrypt(prod), v1 * v2, atol=1e-6)


def test_multiply_relinearize_rescale(h):
    v1, v2 = h.msg(), h.msg()
    rlk = h.keygen.create_relin_key()
    prod = h.evaluator.relinearize(h.evaluator.multiply(h.enc(v1), h.enc(v2)),
                                   rlk)
    assert prod.size == 2
    np.testing.assert_allclose(h.decryptor.decrypt(prod), v1 * v2, atol=1e-6)
    scaled = h.evaluator.rescale_to_next(prod)
    assert scaled.level == 1
    assert abs(scaled.scale / (SCALE * SCALE / h.ctx.data_primes[-1]) - 1) < 1e-12
    np.testing.assert_allclose(h.decryptor.decrypt(scaled), v1 * v2, atol=1e-6)


def test_depth2_chain(h):
    """(v1*v2)*v3 with rescale between — uses both data levels."""
    v1, v2, v3 = h.msg(), h.msg(), h.msg()
    rlk = h.keygen.create_relin_key()
    ev = h.evaluator
    p = ev.rescale_to_next(ev.relinearize(ev.multiply(h.enc(v1), h.enc(v2)), rlk))
    c3 = h.encryptor.encrypt(h.encoder.encode(v3, level=1, scale=p.scale))
    p2 = ev.rescale_to_next(ev.relinearize(ev.multiply(p, c3), rlk))
    assert p2.level == 2
    np.testing.assert_allclose(h.decryptor.decrypt(p2), v1 * v2 * v3, atol=1e-4)


def test_multiply_plain_add_plain(h):
    v1, v2 = h.msg(), h.msg()
    ct = h.enc(v1)
    pt = h.encoder.encode(v2)
    np.testing.assert_allclose(
        h.decryptor.decrypt(h.evaluator.multiply_plain(ct, pt)), v1 * v2,
        atol=1e-6)
    np.testing.assert_allclose(
        h.decryptor.decrypt(h.evaluator.add_plain(ct, pt)), v1 + v2, atol=1e-8)


def test_rotate_and_conjugate(h):
    from troy_tpu.ops.galois import GaloisTool

    v = h.msg()
    steps = 3
    glk = h.keygen.create_galois_key(
        GaloisTool.get_element_from_step(steps, h.ctx.n))
    rot = h.evaluator.rotate_vector(h.enc(v), steps, glk)
    np.testing.assert_allclose(
        h.decryptor.decrypt(rot), np.roll(v, -steps), atol=1e-7)
    ck = h.keygen.create_galois_key(2 * h.ctx.n - 1)
    conj = h.evaluator.complex_conjugate(h.enc(v), ck)
    np.testing.assert_allclose(h.decryptor.decrypt(conj), np.conj(v), atol=1e-7)


def test_mod_switch_drop(h):
    v = h.msg()
    down = h.evaluator.mod_switch_to_next(h.enc(v))
    assert down.level == 1
    np.testing.assert_allclose(h.decryptor.decrypt(down), v, atol=1e-8)


def test_level_scale_validation(h):
    v = h.msg()
    c0 = h.enc(v)
    c1 = h.evaluator.mod_switch_to_next(h.enc(v))
    with pytest.raises(ValueError, match="level"):
        h.evaluator.add(c0, c1)
    with pytest.raises(ValueError, match="last level"):
        h.evaluator.rescale_to_next(
            h.evaluator.mod_switch_to_next(h.evaluator.mod_switch_to_next(c0)))
