"""MatmulHelper tests (mirrors reference test/app/matmul.cu; full pipeline
vs plain numpy matmul)."""

import numpy as np

import sys
sys.path.insert(0, "tests")
from tests.core.fixtures import GeneralHeContext

from troy_tpu.app.matmul import MatmulHelper, MatmulObjective
from troy_tpu.app.encoder_adapter import BatchEncoderAdapter, CKKSEncoderAdapter

RNG = np.random.default_rng(2024)


def run_bfv_matmul(pack_lwe, batch=4, in_d=5, out_d=6, n=64):
    h = GeneralHeContext("BFV", n, log_t=20, q_bits=(30, 30, 30, 30))
    adapter = BatchEncoderAdapter(h.encoder)
    helper = MatmulHelper(batch, in_d, out_d, n,
                          MatmulObjective.EncryptLeft, pack_lwe=pack_lwe)
    x = RNG.integers(0, h.t, size=(batch, in_d), dtype=np.uint64)
    w = RNG.integers(0, h.t, size=(in_d, out_d), dtype=np.uint64)
    bias = RNG.integers(0, h.t, size=(batch, out_d), dtype=np.uint64)
    x_enc = helper.encrypt_inputs(h.encryptor, adapter, x)
    w_enc = helper.encode_weights(adapter, w)
    y = helper.matmul(h.evaluator, x_enc, w_enc)
    if pack_lwe:
        auto_keys = h.keygen.create_automorphism_keys()
        y = helper.pack_outputs(h.evaluator, auto_keys, y)
    y = y.add_plain(helper.encode_outputs(adapter, bias), h.evaluator)
    dec = helper.decrypt_outputs(adapter, h.decryptor, y)
    want = (x.astype(object) @ w.astype(object) + bias) % h.t
    np.testing.assert_array_equal(dec.astype(object) % h.t, want)


def test_bfv_matmul_no_pack():
    run_bfv_matmul(False)


def test_bfv_matmul_pack_lwe():
    run_bfv_matmul(True)


def test_bfv_matmul_bigger():
    run_bfv_matmul(False, batch=3, in_d=17, out_d=9)


def test_ckks_matmul():
    n = 64
    scale = 2.0 ** 20
    h = GeneralHeContext("CKKS", n, q_bits=(30, 30, 30, 30), scale=scale)
    adapter = CKKSEncoderAdapter(h.encoder, scale)
    batch, in_d, out_d = 2, 5, 4
    helper = MatmulHelper(batch, in_d, out_d, n,
                          MatmulObjective.EncryptLeft, pack_lwe=False)
    x = RNG.uniform(-1, 1, (batch, in_d))
    w = RNG.uniform(-1, 1, (in_d, out_d))
    x_enc = helper.encrypt_inputs(h.encryptor, adapter, x)
    w_enc = helper.encode_weights(adapter, w)
    y = helper.matmul(h.evaluator, x_enc, w_enc)
    # product scale is scale^2
    class A2(CKKSEncoderAdapter):
        pass
    dec_adapter = CKKSEncoderAdapter(h.encoder, scale * scale)
    dec = helper.decrypt_outputs(dec_adapter, h.decryptor, y)
    np.testing.assert_allclose(dec, x @ w, atol=1e-2)


def test_ring2k_matmul():
    """BumbleBee matmul over Z_2^k (BASELINE.json config; reference
    test/app matmul ring2k cases)."""
    from troy_tpu.app.ring2k import PolynomialEncoderRing2k
    from troy_tpu.app.encoder_adapter import Ring2kEncoderAdapter

    n, k = 64, 20
    h = GeneralHeContext("BFV", n, log_t=20, q_bits=(30, 30, 30, 30))
    enc = PolynomialEncoderRing2k(h.context, k)
    adapter = Ring2kEncoderAdapter(enc)
    mask = (1 << k) - 1
    batch, in_d, out_d = 2, 3, 2
    helper = MatmulHelper(batch, in_d, out_d, n,
                          MatmulObjective.EncryptLeft, pack_lwe=False)
    x = RNG.integers(0, 1 << k, (batch, in_d), dtype=np.uint64)
    w = RNG.integers(0, 1 << k, (in_d, out_d), dtype=np.uint64)
    x_enc = helper.encrypt_inputs(h.encryptor, adapter, x)
    w_enc = helper.encode_weights(adapter, w)
    y = helper.matmul(h.evaluator, x_enc, w_enc)
    dec = helper.decrypt_outputs(adapter, h.decryptor, y)
    want = (x.astype(object) @ w.astype(object)) & mask
    np.testing.assert_array_equal(dec.astype(object) & mask, want)


def test_matmul_fly_matches_regular():
    n = 64
    h = GeneralHeContext("BFV", n, log_t=20, q_bits=(30, 30, 30, 30))
    adapter = BatchEncoderAdapter(h.encoder)
    batch, in_d, out_d = 2, 5, 4
    helper = MatmulHelper(batch, in_d, out_d, n,
                          MatmulObjective.EncryptLeft, pack_lwe=False)
    x = RNG.integers(0, h.t, size=(batch, in_d), dtype=np.uint64)
    w = RNG.integers(0, h.t, size=(in_d, out_d), dtype=np.uint64)
    x_enc = helper.encrypt_inputs(h.encryptor, adapter, x)
    y = helper.matmul_fly(h.evaluator, adapter, x_enc, w)
    dec = helper.decrypt_outputs(adapter, h.decryptor, y)
    want = (x.astype(object) @ w.astype(object)) % h.t
    np.testing.assert_array_equal(dec.astype(object) % h.t, want)


def test_matmul_output_serialization():
    """Server->client wire: sparse save_terms shrinks unpacked outputs."""
    from troy_tpu.utils import serialize as S

    n = 64
    h = GeneralHeContext("BFV", n, log_t=20, q_bits=(30, 30, 30, 30))
    adapter = BatchEncoderAdapter(h.encoder)
    batch, in_d, out_d = 2, 4, 3
    helper = MatmulHelper(batch, in_d, out_d, n,
                          MatmulObjective.EncryptLeft, pack_lwe=False)
    x = RNG.integers(0, h.t, size=(batch, in_d), dtype=np.uint64)
    w = RNG.integers(0, h.t, size=(in_d, out_d), dtype=np.uint64)
    x_enc = helper.encrypt_inputs(h.encryptor, adapter, x)
    w_blobs = helper.serialize_encoded_weights(helper.encode_weights(adapter, w))
    w_enc = helper.deserialize_encoded_weights(w_blobs)
    y = helper.matmul(h.evaluator, x_enc, w_enc)
    blobs = helper.serialize_outputs(h.context, y, S.CompressionMode.Zstd)
    full = [S.save_ciphertext(c, h.context) for row in y.data for c in row]
    assert sum(map(len, blobs)) < sum(map(len, full))
    y2 = helper.deserialize_outputs(h.context, blobs)
    dec = helper.decrypt_outputs(adapter, h.decryptor, y2)
    want = (x.astype(object) @ w.astype(object)) % h.t
    np.testing.assert_array_equal(dec.astype(object) % h.t, want)


def test_ckks_matmul_pack_lwe():
    n = 64
    scale = 2.0 ** 20
    h = GeneralHeContext("CKKS", n, q_bits=(30, 30, 30, 30), scale=scale)
    adapter = CKKSEncoderAdapter(h.encoder, scale)
    batch, in_d, out_d = 2, 4, 3
    helper = MatmulHelper(batch, in_d, out_d, n,
                          MatmulObjective.EncryptLeft, pack_lwe=True)
    x = RNG.uniform(-1, 1, (batch, in_d))
    w = RNG.uniform(-1, 1, (in_d, out_d))
    x_enc = helper.encrypt_inputs(h.encryptor, adapter, x)
    w_enc = helper.encode_weights(adapter, w)
    y = helper.matmul(h.evaluator, x_enc, w_enc)
    auto_keys = h.keygen.create_automorphism_keys()
    y = helper.pack_outputs(h.evaluator, auto_keys, y)
    dec = helper.decrypt_outputs(adapter, h.decryptor, y)
    np.testing.assert_allclose(dec, x @ w, atol=2e-2)


def test_bfv_matmul_seeded_inputs_wire():
    """Client sends seed-compressed inputs; server computes; terms wire back."""
    from troy_tpu.utils import serialize as S
    from troy_tpu.app.cipher2d import Cipher2d

    n = 64
    h = GeneralHeContext("BFV", n, log_t=20, q_bits=(30, 30, 30, 30))
    adapter = BatchEncoderAdapter(h.encoder)
    helper = MatmulHelper(2, 3, 2, n, MatmulObjective.EncryptLeft, pack_lwe=False)
    x = RNG.integers(0, h.t, (2, 3), dtype=np.uint64)
    w = RNG.integers(0, h.t, (3, 2), dtype=np.uint64)
    x_enc = helper.encode_inputs(adapter, x).encrypt_symmetric(
        h.encryptor, save_seed=True)
    wire = [[S.save_ciphertext(c, h.context, S.CompressionMode.Zstd)
             for c in row] for row in x_enc.data]
    x_srv = Cipher2d([[S.load_ciphertext(b, h.context) for b in row]
                      for row in wire])
    y = helper.matmul(h.evaluator, x_srv, helper.encode_weights(adapter, w))
    blobs = helper.serialize_outputs(h.context, y, S.CompressionMode.Zstd)
    dec = helper.decrypt_outputs(
        adapter, h.decryptor, helper.deserialize_outputs(h.context, blobs))
    want = (x.astype(object) @ w.astype(object)) % h.t
    np.testing.assert_array_equal(dec.astype(object) % h.t, want)


def test_bfv_matmul_encrypt_right():
    n = 64
    h = GeneralHeContext("BFV", n, log_t=20, q_bits=(30, 30, 30, 30))
    adapter = BatchEncoderAdapter(h.encoder)
    batch, in_d, out_d = 2, 4, 3
    helper = MatmulHelper(batch, in_d, out_d, n,
                          MatmulObjective.EncryptRight, pack_lwe=False)
    x = RNG.integers(0, h.t, size=(batch, in_d), dtype=np.uint64)
    w = RNG.integers(0, h.t, size=(in_d, out_d), dtype=np.uint64)
    x_plain = helper.encode_inputs(adapter, x, for_cipher=False)
    w_enc = helper.encrypt_weights(h.encryptor, adapter, w)
    y = helper.matmul_reverse(h.evaluator, x_plain, w_enc)
    dec = helper.decrypt_outputs(adapter, h.decryptor, y)
    want = (x.astype(object) @ w.astype(object)) % h.t
    np.testing.assert_array_equal(dec.astype(object) % h.t, want)


def test_ring2k_wide_matmul():
    """BumbleBee matmul over Z_2^72 — the reference's u128 template range
    (ref: bfv_ring2k.cu uint128_t instantiation; test/app matmul ring2k)."""
    from troy_tpu.app.ring2k import PolynomialEncoderRing2k
    from troy_tpu.app.encoder_adapter import Ring2kEncoderAdapter

    n, k = 64, 72
    h = GeneralHeContext("BFV", n, log_t=20, q_bits=(30,) * 6)
    enc = PolynomialEncoderRing2k(h.context, k)
    adapter = Ring2kEncoderAdapter(enc)
    mask = (1 << k) - 1
    batch, in_d, out_d = 2, 3, 2
    helper = MatmulHelper(batch, in_d, out_d, n,
                          MatmulObjective.EncryptLeft, pack_lwe=False)
    x = np.array([[int.from_bytes(RNG.bytes(16), "little") & mask
                   for _ in range(in_d)] for _ in range(batch)], dtype=object)
    w = np.array([[int.from_bytes(RNG.bytes(16), "little") & mask
                   for _ in range(out_d)] for _ in range(in_d)], dtype=object)
    x_enc = helper.encrypt_inputs(h.encryptor, adapter, x)
    w_enc = helper.encode_weights(adapter, w)
    y = helper.matmul(h.evaluator, x_enc, w_enc)
    dec = helper.decrypt_outputs(adapter, h.decryptor, y)
    want = (x @ w) & mask
    got = np.vectorize(lambda v: int(v) & mask, otypes=[object])(dec)
    np.testing.assert_array_equal(got, want)


def test_contract_then_modswitch_no_tracer_leak():
    """multiply_plain_contract must materialize the shared base_q pack
    before tracing: a later jitted op at the same level (mod_switch_to_next)
    previously exploded with UnexpectedTracerError (round-3 regression)."""
    n = 64
    h = GeneralHeContext("BFV", n, log_t=20, q_bits=(30, 30, 30, 30))
    adapter = BatchEncoderAdapter(h.encoder)
    helper = MatmulHelper(2, 3, 2, n, MatmulObjective.EncryptLeft,
                          pack_lwe=False)
    x = RNG.integers(0, h.t, (2, 3), dtype=np.uint64)
    w = RNG.integers(0, h.t, (3, 2), dtype=np.uint64)
    y = helper.matmul(h.evaluator, helper.encrypt_inputs(h.encryptor, adapter, x),
                      helper.encode_weights(adapter, w))
    y2 = [[h.evaluator.mod_switch_to_next(c) for c in row] for row in y.data]
    from troy_tpu.app.cipher2d import Cipher2d

    dec = helper.decrypt_outputs(adapter, h.decryptor, Cipher2d(y2))
    want = (x.astype(object) @ w.astype(object)) % h.t
    np.testing.assert_array_equal(dec.astype(object) % h.t, want)
