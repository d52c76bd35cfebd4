"""Batched evaluator API tests (mirrors reference test/evaluator_batched.cu:
re-running ops through the batched APIs with vectors of ciphertexts)."""

import numpy as np

from .fixtures import GeneralHeContext

RNG = np.random.default_rng(919)
B = 3


def make(scheme="BFV"):
    return GeneralHeContext(scheme, 32, log_t=20, q_bits=(30, 30, 30))


def test_batched_add_sub_negate():
    h = make()
    ms1 = [h.random_simd(RNG) for _ in range(B)]
    ms2 = [h.random_simd(RNG) for _ in range(B)]
    cts1 = [h.encrypt(m) for m in ms1]
    cts2 = [h.encrypt(m) for m in ms2]
    for out, m1, m2 in zip(h.evaluator.add_batched(cts1, cts2), ms1, ms2):
        np.testing.assert_array_equal(h.decrypt(out), (m1 + m2) % h.t)
    for out, m1, m2 in zip(h.evaluator.sub_batched(cts1, cts2), ms1, ms2):
        np.testing.assert_array_equal(
            h.decrypt(out), (m1.astype(np.int64) - m2.astype(np.int64)) % h.t)
    for out, m in zip(h.evaluator.negate_batched(cts1), ms1):
        np.testing.assert_array_equal(h.decrypt(out), (h.t - m) % h.t)


def test_batched_multiply_relinearize():
    h = make()
    rlk = h.keygen.create_relin_keys()
    ms1 = [h.random_simd(RNG) for _ in range(B)]
    ms2 = [h.random_simd(RNG) for _ in range(B)]
    cts1 = [h.encrypt(m) for m in ms1]
    cts2 = [h.encrypt(m) for m in ms2]
    prods = h.evaluator.multiply_batched(cts1, cts2)
    for out, m1, m2 in zip(prods, ms1, ms2):
        np.testing.assert_array_equal(h.decrypt(out), m1 * m2 % h.t)
    rels = h.evaluator.relinearize_batched(prods, rlk)
    for out, m1, m2 in zip(rels, ms1, ms2):
        assert out.size == 2
        np.testing.assert_array_equal(h.decrypt(out), m1 * m2 % h.t)


def test_batched_multiply_plain():
    h = make()
    ms1 = [h.random_simd(RNG) for _ in range(B)]
    ms2 = [h.random_simd(RNG) for _ in range(B)]
    cts = [h.encrypt(m) for m in ms1]
    pts = [h.encoder.encode(m) for m in ms2]
    for out, m1, m2 in zip(h.evaluator.multiply_plain_batched(cts, pts), ms1, ms2):
        np.testing.assert_array_equal(h.decrypt(out), m1 * m2 % h.t)


def test_batched_encrypt_decrypt():
    h = make()
    ms = [h.random_simd(RNG) for _ in range(B)]
    pts = [h.encoder.encode(m) for m in ms]
    cts = h.encryptor.encrypt_asymmetric_batched(pts)
    cts2 = h.encryptor.encrypt_symmetric_batched(pts, save_seed=True)
    for out, m in zip(h.decryptor.decrypt_batched(cts), ms):
        np.testing.assert_array_equal(h.encoder.decode(out), m)
    for ct, m in zip(cts2, ms):
        assert ct.seed is not None
        np.testing.assert_array_equal(h.decrypt(ct), m)


def test_add_mixed_sizes():
    """size-3 + size-2 pads the smaller operand (ref: translate with
    differing polynomial counts)."""
    h = make()
    m1, m2, m3 = (h.random_simd(RNG) for _ in range(3))
    prod = h.evaluator.multiply(h.encrypt(m1), h.encrypt(m2))  # size 3
    ct3 = h.encrypt(m3)                                        # size 2
    s = h.evaluator.add(prod, ct3)
    assert s.size == 3
    np.testing.assert_array_equal(h.decrypt(s), (m1 * m2 + m3) % h.t)
    s2 = h.evaluator.add(ct3, prod)  # commuted
    np.testing.assert_array_equal(h.decrypt(s2), (m1 * m2 + m3) % h.t)


def test_batched_bgv_multiply():
    h = make("BGV")
    ms1 = [h.random_simd(RNG) for _ in range(B)]
    ms2 = [h.random_simd(RNG) for _ in range(B)]
    cts1 = [h.encrypt(m) for m in ms1]
    cts2 = [h.encrypt(m) for m in ms2]
    for out, m1, m2 in zip(h.evaluator.multiply_batched(cts1, cts2), ms1, ms2):
        np.testing.assert_array_equal(h.decrypt(out), m1 * m2 % h.t)


def test_batched_galois_rotation_matches_scalar():
    """rotate_rows/columns/apply_galois batched == scalar per element
    (ref: evaluator.h rotate_rows_batched / apply_galois_batched)."""
    h = make()
    glk = h.keygen.create_galois_keys()
    ms = [h.random_simd(RNG) for _ in range(B)]
    cts = [h.encrypt(m) for m in ms]
    outs = h.evaluator.rotate_rows_batched(cts, 1, glk)
    for out, ct in zip(outs, cts):
        want = h.decrypt(h.evaluator.rotate_rows(ct, 1, glk))
        np.testing.assert_array_equal(h.decrypt(out), want)
    outs = h.evaluator.rotate_columns_batched(cts, glk)
    for out, ct in zip(outs, cts):
        want = h.decrypt(h.evaluator.rotate_columns(ct, glk))
        np.testing.assert_array_equal(h.decrypt(out), want)


def test_batched_keyswitching_matches_scalar():
    from troy_tpu.core.keygen import KeyGenerator
    from troy_tpu.core.encryptor import Encryptor

    h = make()
    kg2 = KeyGenerator(h.context)
    enc2 = Encryptor(h.context, sk=kg2.secret_key)
    ksk = kg2.create_keyswitching_key(h.sk)
    ms = [h.random_simd(RNG) for _ in range(B)]
    cts = [enc2.encrypt_symmetric(h.encoder.encode(m)) for m in ms]
    outs = h.evaluator.apply_keyswitching_batched(cts, ksk)
    for out, m in zip(outs, ms):
        np.testing.assert_array_equal(h.decrypt(out), m)


def test_batched_ntt_transforms_roundtrip():
    h = make()
    ms = [h.random_simd(RNG) for _ in range(B)]
    cts = [h.encrypt(m) for m in ms]
    ntts = h.evaluator.transform_to_ntt_batched(cts)
    assert all(c.is_ntt_form for c in ntts)
    back = h.evaluator.transform_from_ntt_batched(ntts)
    for out, m in zip(back, ms):
        np.testing.assert_array_equal(h.decrypt(out), m)


def test_batched_relinearize_size4():
    # depth-2 product needs a deeper chain than make()'s 2 working limbs
    h = GeneralHeContext("BFV", 32, log_t=20, q_bits=(30,) * 5)
    rlk = h.keygen.create_relin_keys(max_power=3)
    ms = [h.random_simd(RNG) for _ in range(B)]
    cts = [h.encrypt(m) for m in ms]
    sq = h.evaluator.multiply_batched(cts, cts)          # size 3
    cub = [h.evaluator.multiply(a, b) for a, b in zip(sq, cts)]  # size 4
    rels = h.evaluator.relinearize_batched(cub, rlk)
    for out, m in zip(rels, ms):
        assert out.size == 2
        np.testing.assert_array_equal(h.decrypt(out), m * m % h.t * m % h.t)


def test_mod_switch_drop_to_ckks():
    """Drop two levels without scaling; decrypt still matches
    (ref: evaluator_modswitch.cu:173 mod_switch_drop_to_internal)."""
    h = GeneralHeContext("CKKS", 32, q_bits=(30, 30, 30, 30), scale=2.0 ** 25)
    m = RNG.standard_normal(h.encoder.slot_count)
    ct = h.encrypt(m)
    cd = h.context.get_context_data(ct.parms_id)
    target = cd.next.next.parms_id
    dropped = h.evaluator.mod_switch_drop_to(ct, target)
    assert dropped.parms_id == target
    np.testing.assert_allclose(h.decrypt(dropped).real, m, atol=1e-3)
    # plaintext variant
    pt = h.encoder.encode(m, scale=h.scale)
    ptd = h.evaluator.mod_switch_drop_to_plain(pt, target)
    assert ptd.parms_id == target
    # batched variant + mod_switch_to_batched
    outs = h.evaluator.mod_switch_drop_to_batched([ct, ct], target)
    assert all(o.parms_id == target for o in outs)
    outs2 = h.evaluator.mod_switch_to_batched([ct, ct], target)
    for o in outs2:
        np.testing.assert_allclose(h.decrypt(o).real, m, atol=1e-3)


def test_mod_switch_drop_to_rejects_upward():
    h = GeneralHeContext("CKKS", 32, q_bits=(30, 30, 30))
    m = RNG.standard_normal(h.encoder.slot_count)
    ct = h.encrypt(m)
    low = h.evaluator.mod_switch_to_next(ct)
    import pytest
    with pytest.raises(ValueError):
        h.evaluator.mod_switch_drop_to(low, ct.parms_id)


def test_step_builders_match_object_api():
    """The prebuilt raw-array steps (build_rotate_rows/columns_step,
    build_square_relin_step, build_rescale_step, build_mod_switch_step) are
    bit-identical to the object API they fuse (round-4 uniform bench/mesh
    surface; ref: reference `_batched` families, src/evaluator.h)."""
    import jax
    from troy_tpu.parallel.batched import BatchedEvaluator

    h = make()
    cd = h.context.first_context_data()
    be = BatchedEvaluator(h.evaluator, cd)
    glk = h.keygen.create_galois_keys()
    rlk = h.keygen.create_relin_keys()
    ms = [h.random_simd(RNG) for _ in range(B)]
    cts = [h.encrypt(m) for m in ms]
    stacked = be.stack(cts)

    # rotate_rows(3) — NAF multi-round (elements {4, -1})
    step, elts = be.build_rotate_rows_step(3)
    keys = tuple(glk.key(e) for e in elts)
    got = jax.jit(step)(stacked, keys)
    for i, ct in enumerate(cts):
        want = h.evaluator.rotate_rows(ct, 3, glk)
        np.testing.assert_array_equal(np.asarray(got[i]), np.asarray(want.data))

    # rotate_columns (conjugation element)
    step, elts = be.build_rotate_columns_step()
    keys = tuple(glk.key(e) for e in elts)
    got = jax.jit(step)(stacked, keys)
    for i, ct in enumerate(cts):
        want = h.evaluator.rotate_columns(ct, glk)
        np.testing.assert_array_equal(np.asarray(got[i]), np.asarray(want.data))

    # square + relinearize
    kk = rlk.key(2)
    step = be.build_square_relin_step(kk)
    got = jax.jit(step)(stacked, kk)
    for i, ct in enumerate(cts):
        want = h.evaluator.relinearize(h.evaluator.square(ct), rlk)
        np.testing.assert_array_equal(np.asarray(got[i]), np.asarray(want.data))

    # BFV mod switch to next level
    step = be.build_mod_switch_step()
    got = jax.jit(step)(stacked)
    for i, ct in enumerate(cts):
        want = h.evaluator.mod_switch_to_next(ct)
        np.testing.assert_array_equal(np.asarray(got[i]), np.asarray(want.data))


def test_rescale_step_matches_object_api():
    import jax
    from troy_tpu.parallel.batched import BatchedEvaluator

    h = GeneralHeContext("CKKS", 32, q_bits=(30, 30, 30), scale=2.0 ** 25)
    cd = h.context.first_context_data()
    be = BatchedEvaluator(h.evaluator, cd)
    n2 = h.encoder.slot_count
    vs = [RNG.uniform(-1, 1, n2) for _ in range(B)]
    cts = [h.encrypt(v) for v in vs]
    prods = [h.evaluator.multiply(c, c) for c in cts]
    step = be.build_rescale_step()
    got = jax.jit(step)(be.stack(prods))
    for i, p in enumerate(prods):
        want = h.evaluator.rescale_to_next(p)
        np.testing.assert_array_equal(np.asarray(got[i]), np.asarray(want.data))


def test_galois_step_ntt_form_matches_object_api():
    """build_galois_step on an NTT-form scheme (BGV) — the permutation runs
    in the NTT domain and the keyswitch target comes from an inverse
    transform; must equal the object API bit-exactly."""
    import jax
    from troy_tpu.parallel.batched import BatchedEvaluator

    h = make("BGV")
    cd = h.context.first_context_data()
    be = BatchedEvaluator(h.evaluator, cd)
    glk = h.keygen.create_galois_keys()
    ms = [h.random_simd(RNG) for _ in range(B)]
    cts = [h.encrypt(m) for m in ms]
    step, elts = be.build_rotate_rows_step(1)
    keys = tuple(glk.key(e) for e in elts)
    got = jax.jit(step)(be.stack(cts), keys)
    for i, ct in enumerate(cts):
        want = h.evaluator.rotate_rows(ct, 1, glk)
        np.testing.assert_array_equal(np.asarray(got[i]), np.asarray(want.data))
