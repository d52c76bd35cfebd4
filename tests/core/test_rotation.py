"""Rotation / Galois tests (mirrors reference test/evaluator.cu rotate cases,
examples/6_rotation.cu)."""

import numpy as np

from .fixtures import GeneralHeContext

RNG = np.random.default_rng(4242)


def test_bfv_rotate_rows():
    h = GeneralHeContext("BFV", 64, log_t=20)
    glk = h.keygen.create_galois_keys_from_steps([1, -1, 3])
    m = h.random_simd(RNG)
    rows = m.reshape(2, -1)
    ct = h.encrypt(m)
    for step in (1, -1, 3):
        out = h.decrypt(h.evaluator.rotate_rows(ct, step, glk)).reshape(2, -1)
        want = np.roll(rows, -step, axis=1)
        np.testing.assert_array_equal(out, want, err_msg=f"step={step}")


def test_bfv_rotate_columns():
    h = GeneralHeContext("BFV", 64, log_t=20)
    glk = h.keygen.create_galois_keys_from_elements([2 * 64 - 1])
    m = h.random_simd(RNG)
    ct = h.encrypt(m)
    out = h.decrypt(h.evaluator.rotate_columns(ct, glk)).reshape(2, -1)
    want = m.reshape(2, -1)[::-1]
    np.testing.assert_array_equal(out, want)


def test_bfv_rotate_naf_fallback():
    """Rotation by a step without a direct key NAF-decomposes."""
    h = GeneralHeContext("BFV", 64, log_t=20)
    glk = h.keygen.create_galois_keys()  # power-of-two steps
    m = h.random_simd(RNG)
    ct = h.encrypt(m)
    out = h.decrypt(h.evaluator.rotate_rows(ct, 5, glk)).reshape(2, -1)
    want = np.roll(m.reshape(2, -1), -5, axis=1)
    np.testing.assert_array_equal(out, want)


def test_bgv_rotate_rows():
    h = GeneralHeContext("BGV", 64, log_t=20)
    glk = h.keygen.create_galois_keys_from_steps([2])
    m = h.random_simd(RNG)
    ct = h.encrypt(m)
    out = h.decrypt(h.evaluator.rotate_rows(ct, 2, glk)).reshape(2, -1)
    want = np.roll(m.reshape(2, -1), -2, axis=1)
    np.testing.assert_array_equal(out, want)


def test_ckks_rotate_and_conjugate():
    h = GeneralHeContext("CKKS", 64, scale=2.0 ** 25)
    glk = h.keygen.create_galois_keys_from_steps([1, -2])
    n2 = h.encoder.slot_count
    v = RNG.uniform(-1, 1, n2) + 1j * RNG.uniform(-1, 1, n2)
    ct = h.encryptor.encrypt_asymmetric(h.encoder.encode(v, scale=h.scale))
    for step in (1, -2):
        out = h.encoder.decode(
            h.decryptor.decrypt(h.evaluator.rotate_vector(ct, step, glk)))
        np.testing.assert_allclose(out, np.roll(v, -step), atol=1e-3,
                                   err_msg=f"step={step}")
    glk_c = h.keygen.create_galois_keys_from_elements([2 * 64 - 1])
    out = h.encoder.decode(
        h.decryptor.decrypt(h.evaluator.complex_conjugate(ct, glk_c)))
    np.testing.assert_allclose(out, np.conj(v), atol=1e-3)


def test_galois_coeff_vs_ntt_consistency():
    """apply_coeff and apply_ntt must agree through the NTT."""
    import jax.numpy as jnp
    from troy_tpu.ops.galois import GaloisTool
    from troy_tpu.ops import ntt as NTT

    h = GeneralHeContext("BFV", 64, log_t=20)
    cd = h.context.first_context_data()
    tool = GaloisTool.for_context(cd)
    qtab = cd.qtab()
    x = jnp.asarray(
        (RNG.integers(0, (1 << 28), size=(cd.coeff_modulus_size, 64)).astype(np.uint32)
         % np.asarray(cd.ntt_tables.host["q"])[:, None])
    )
    for g in (3, 9, 127):
        a = NTT.ntt_forward(tool.apply_coeff(x, g, qtab), qtab)
        b = tool.apply_ntt(NTT.ntt_forward(x, qtab), g)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=f"g={g}")
