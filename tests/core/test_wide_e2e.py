"""End-to-end tests for the wide (40-60-bit prime) residue path through the
ONE public API — the reference's native SEAL-default parameter widths
(ref: test/bench/he_operations.cu:15-50 defaults n=8192 log q={60,40,40,60};
src/utils/basics.h:579 native 64-bit arithmetic).  Mirrors the
test_general_suite operator coverage at q_bits=(60,40,40,60)."""

import numpy as np
import pytest

from .fixtures import GeneralHeContext

RNG = np.random.default_rng(64646)
SCHEMES = ["BFV", "BGV", "CKKS"]
SCALE = 2.0 ** 40
Q_BITS = (60, 40, 40, 60)

_ctx_cache = {}


def ctx(scheme):
    if scheme not in _ctx_cache:
        h = GeneralHeContext(scheme, 32, log_t=20, q_bits=Q_BITS, scale=SCALE)
        h._rlk = h.keygen.create_relin_keys()
        _ctx_cache[scheme] = h
    return _ctx_cache[scheme]


def rand_msg(h):
    if h.scheme.name == "CKKS":
        n2 = h.encoder.slot_count
        return RNG.uniform(-1, 1, n2) + 1j * RNG.uniform(-1, 1, n2)
    return h.random_simd(RNG)


def enc(h, v, asym=True):
    if h.scheme.name == "CKKS":
        pt = h.encoder.encode(v, scale=SCALE)
        return (h.encryptor.encrypt_asymmetric(pt) if asym
                else h.encryptor.encrypt_symmetric(pt))
    return h.encrypt(v, asym=asym)


def dec(h, ct):
    if h.scheme.name == "CKKS":
        return h.encoder.decode(h.decryptor.decrypt(ct))
    return h.decrypt(ct)


def check(h, got, want, msg="", atol=1e-6):
    if h.scheme.name == "CKKS":
        np.testing.assert_allclose(got, want, atol=atol, err_msg=msg)
    else:
        want = np.mod(want.astype(object), h.t).astype(np.uint64)
        np.testing.assert_array_equal(np.asarray(got, dtype=np.uint64),
                                      want, err_msg=msg)


@pytest.mark.parametrize("scheme", SCHEMES)
@pytest.mark.parametrize("asym", [True, False])
def test_encrypt_decrypt(scheme, asym):
    h = ctx(scheme)
    v = rand_msg(h)
    check(h, dec(h, enc(h, v, asym)), v)


@pytest.mark.parametrize("scheme", SCHEMES)
def test_negate_add_sub(scheme):
    h = ctx(scheme)
    v1, v2 = rand_msg(h), rand_msg(h)
    c1, c2 = enc(h, v1), enc(h, v2)
    check(h, dec(h, h.evaluator.negate(c1)),
          -v1 if scheme == "CKKS" else (h.t - v1.astype(np.int64)))
    check(h, dec(h, h.evaluator.add(c1, c2)),
          v1 + v2 if scheme == "CKKS" else v1.astype(np.int64) + v2)
    check(h, dec(h, h.evaluator.sub(c1, c2)),
          v1 - v2 if scheme == "CKKS" else v1.astype(np.int64) - v2.astype(np.int64))


@pytest.mark.parametrize("scheme", SCHEMES)
def test_multiply_relinearize(scheme):
    h = ctx(scheme)
    v1, v2 = rand_msg(h), rand_msg(h)
    prod = h.evaluator.multiply(enc(h, v1), enc(h, v2))
    want = v1 * v2 if scheme == "CKKS" else v1.astype(object) * v2.astype(object)
    check(h, dec(h, prod), want, "size-3", atol=1e-5)
    rel = h.evaluator.relinearize(prod, h._rlk)
    check(h, dec(h, rel), want, "relinearized", atol=1e-5)


@pytest.mark.parametrize("scheme", SCHEMES)
def test_square(scheme):
    h = ctx(scheme)
    v = rand_msg(h)
    want = v * v if scheme == "CKKS" else v.astype(object) ** 2
    check(h, dec(h, h.evaluator.square(enc(h, v))), want, atol=1e-5)


@pytest.mark.parametrize("scheme", SCHEMES)
def test_plain_ops(scheme):
    h = ctx(scheme)
    v1, v2 = rand_msg(h), rand_msg(h)
    c1 = enc(h, v1)
    pt2 = (h.encoder.encode(v2, scale=SCALE) if scheme == "CKKS"
           else h.encoder.encode(v2))
    check(h, dec(h, h.evaluator.add_plain(c1, pt2)),
          v1 + v2 if scheme == "CKKS" else v1.astype(np.int64) + v2)
    check(h, dec(h, h.evaluator.sub_plain(c1, pt2)),
          v1 - v2 if scheme == "CKKS" else v1.astype(np.int64) - v2.astype(np.int64))
    check(h, dec(h, h.evaluator.multiply_plain(c1, pt2)),
          v1 * v2 if scheme == "CKKS" else v1.astype(object) * v2.astype(object),
          atol=1e-4)


@pytest.mark.parametrize("scheme", SCHEMES)
def test_mod_switch(scheme):
    h = ctx(scheme)
    v = rand_msg(h)
    down = h.evaluator.mod_switch_to_next(enc(h, v))
    assert down.coeff_modulus_size == len(Q_BITS) - 2
    check(h, dec(h, down), v, atol=1e-5)


def test_ckks_rescale():
    h = ctx("CKKS")
    v1, v2 = rand_msg(h), rand_msg(h)
    prod = h.evaluator.relinearize(h.evaluator.multiply(enc(h, v1), enc(h, v2)),
                                   h._rlk)
    rs = h.evaluator.rescale_to_next(prod)
    assert abs(rs.scale - SCALE * SCALE / (2 ** 40)) / rs.scale < 0.5
    np.testing.assert_allclose(dec(h, rs), v1 * v2, atol=1e-5)


@pytest.mark.parametrize("scheme", SCHEMES)
def test_rotate_conjugate(scheme):
    h = ctx(scheme)
    glk = h.keygen.create_galois_keys()
    v = rand_msg(h)
    ct = enc(h, v)
    if scheme == "CKKS":
        rot = h.evaluator.rotate_vector(ct, 1, glk)
        np.testing.assert_allclose(dec(h, rot), np.roll(v, -1), atol=1e-5)
        conj = h.evaluator.complex_conjugate(ct, glk)
        np.testing.assert_allclose(dec(h, conj), np.conj(v), atol=1e-5)
    else:
        n2 = h.encoder.slot_count // 2
        rot = h.evaluator.rotate_rows(ct, 1, glk)
        want = np.concatenate([np.roll(v[:n2], -1), np.roll(v[n2:], -1)])
        np.testing.assert_array_equal(dec(h, rot), want)
        col = h.evaluator.rotate_columns(ct, glk)
        want = np.concatenate([v[n2:], v[:n2]])
        np.testing.assert_array_equal(dec(h, col), want)


@pytest.mark.parametrize("scheme", ["BFV", "BGV"])
def test_size4_relinearize(scheme):
    h = ctx(scheme)
    rlk3 = h.keygen.create_relin_keys(max_power=3)
    ms = [h.random_simd(RNG) for _ in range(3)]
    cts = [enc(h, m) for m in ms]
    prod = h.evaluator.multiply(h.evaluator.multiply(cts[0], cts[1]), cts[2])
    assert prod.size == 4
    out = h.evaluator.relinearize(prod, rlk3)
    want = ms[0].astype(object) * ms[1].astype(object) * ms[2].astype(object)
    check(h, dec(h, out), want)


@pytest.mark.parametrize("scheme", ["BFV", "BGV"])
def test_noise_budget_positive(scheme):
    h = ctx(scheme)
    ct = enc(h, h.random_simd(RNG))
    assert h.decryptor.invariant_noise_budget(ct) > 0


@pytest.mark.parametrize("scheme", SCHEMES)
def test_serialize_roundtrip(scheme):
    from troy_tpu.utils import serialize as S

    h = ctx(scheme)
    v = rand_msg(h)
    ct = enc(h, v)
    back = S.load_ciphertext(S.save_ciphertext(ct, h.context), h.context)
    check(h, dec(h, back), v)


@pytest.mark.parametrize("scheme", SCHEMES)
def test_batched_ops(scheme):
    h = ctx(scheme)
    vs1 = [rand_msg(h) for _ in range(3)]
    vs2 = [rand_msg(h) for _ in range(3)]
    cts1 = [enc(h, v) for v in vs1]
    cts2 = [enc(h, v) for v in vs2]
    outs = h.evaluator.add_batched(cts1, cts2)
    for o, a, b in zip(outs, vs1, vs2):
        check(h, dec(h, o), a + b if scheme == "CKKS"
              else a.astype(np.int64) + b)
    prods = h.evaluator.multiply_batched(cts1, cts2)
    for o, a, b in zip(prods, vs1, vs2):
        check(h, dec(h, o), a * b if scheme == "CKKS"
              else a.astype(object) * b.astype(object), atol=1e-5)


@pytest.mark.parametrize("scheme", ["BFV", "CKKS"])
def test_stacked_mul_relin_step(scheme):
    """BatchedEvaluator's fused step (the bench/mesh kernel) must be
    width-polymorphic: a stacked (B, size, 2, L, n) wide batch through
    build_mul_relin_step equals the scalar multiply+relinearize path."""
    import jax
    from troy_tpu.parallel.batched import BatchedEvaluator

    h = ctx(scheme)
    cd = h.context.first_context_data()
    batched = BatchedEvaluator(h.evaluator, cd)
    B = 3
    vs1 = [rand_msg(h) for _ in range(B)]
    vs2 = [rand_msg(h) for _ in range(B)]
    cts1 = [enc(h, v) for v in vs1]
    cts2 = [enc(h, v) for v in vs2]
    keys = h._rlk.key(2)
    step = batched.build_mul_relin_step(keys)
    out = jax.jit(step)(batched.stack(cts1), batched.stack(cts2), keys)
    assert out.shape == (B, 2, 2, cd.coeff_modulus_size, h.n)
    for i in range(B):
        want = h.evaluator.relinearize(
            h.evaluator.multiply(cts1[i], cts2[i]), h._rlk)
        np.testing.assert_array_equal(np.asarray(out[i]),
                                      np.asarray(want.data))


def test_sixstep_e2e_n512():
    """Full BFV pipeline at wide width with n >= 256, where NTT64Tables
    packs include the six-step tables (the small-n suites above all run the
    radix-2 schedule): encrypt -> multiply -> relinearize -> decrypt must be
    exact, and the ciphertext must be bit-identical to a radix-2 run."""
    from troy_tpu.ops import ntt as NTTMOD

    h = GeneralHeContext("BFV", 512, log_t=20, q_bits=Q_BITS)
    rlk = h.keygen.create_relin_keys()
    v1, v2 = h.random_simd(RNG), h.random_simd(RNG)
    ct1, ct2 = h.encrypt(v1), h.encrypt(v2)
    out = h.evaluator.relinearize(h.evaluator.multiply(ct1, ct2), rlk)
    want = np.mod(v1.astype(object) * v2.astype(object), h.t)
    np.testing.assert_array_equal(
        np.asarray(h.decrypt(out), dtype=np.uint64),
        want.astype(np.uint64))

    # same operation through a radix-2 context is bit-identical
    prev = NTTMOD.get_ntt_backend()
    NTTMOD.set_ntt_backend("radix2")
    try:
        h2 = GeneralHeContext("BFV", 512, log_t=20, q_bits=Q_BITS)
        rlk2 = h2.keygen.create_relin_keys()
        c1, c2 = h2.encrypt(v1), h2.encrypt(v2)
        out2 = h2.evaluator.relinearize(h2.evaluator.multiply(c1, c2), rlk2)
        np.testing.assert_array_equal(np.asarray(out.data),
                                      np.asarray(out2.data))
    finally:
        NTTMOD.set_ntt_backend(prev)
