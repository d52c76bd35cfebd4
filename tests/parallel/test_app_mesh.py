"""App layer (MatmulHelper / Conv2dHelper) under a multi-chip mesh — the
TPU-native counterpart of the reference's multi-device matmul bench
(scripts/test_matmul.sh --multiple-devices, test/bench/matmul.cu): the block
contraction and the pack_outputs keyswitch tree run GSPMD-partitioned over a
('data', 'limb') mesh, bit-exact against the single-device run."""

import numpy as np
import jax
import pytest

from tests.core.fixtures import GeneralHeContext
from troy_tpu.app.matmul import MatmulHelper, MatmulObjective, ceil_div
from troy_tpu.app.conv2d import Conv2dHelper
from troy_tpu.app.encoder_adapter import BatchEncoderAdapter
from troy_tpu.parallel import mesh as M

RNG = np.random.default_rng(77)

needs_8 = pytest.mark.skipif(jax.device_count() < 8,
                             reason="needs 8 virtual devices")


def _force_blocks(helper, bb, ib, ob):
    """Pin the block grid (the cost-model default packs small test batches
    into ONE block row, which would leave the 'data' axis unsharded)."""
    assert bb * ib * ob <= helper.slot_count
    helper.batch_block, helper.input_block, helper.output_block = bb, ib, ob
    return helper


@needs_8
def test_matmul_sharded_end_to_end():
    n = 64
    h = GeneralHeContext("BFV", n, log_t=20, q_bits=(30, 30, 30, 30, 30))
    adapter = BatchEncoderAdapter(h.encoder)
    batch, in_d, out_d = 8, 5, 6
    helper = _force_blocks(
        MatmulHelper(batch, in_d, out_d, n, MatmulObjective.EncryptLeft,
                     pack_lwe=True), 2, 2, 4)
    bs = ceil_div(batch, helper.batch_block)
    assert bs == 4  # 'data' axis actually shards
    x = RNG.integers(0, h.t, size=(batch, in_d), dtype=np.uint64)
    w = RNG.integers(0, h.t, size=(in_d, out_d), dtype=np.uint64)
    x_enc = helper.encrypt_inputs(h.encryptor, adapter, x)
    w_enc = helper.encode_weights(adapter, w)
    auto_keys = h.keygen.create_automorphism_keys()

    # single-device reference
    y_ref = helper.matmul(h.evaluator, x_enc, w_enc)
    p_ref = helper.pack_outputs(h.evaluator, auto_keys, y_ref)

    # sharded: block rows over 'data' (4-way), RNS limbs over 'limb' (2-way)
    m = M.make_mesh(data=4, limb=2)
    y_sh = helper.matmul(h.evaluator, x_enc, w_enc, mesh=m)
    for b in range(len(y_ref.data)):
        for j in range(len(y_ref.data[0])):
            np.testing.assert_array_equal(np.asarray(y_sh[b][j].data),
                                          np.asarray(y_ref[b][j].data))
    # the contraction output actually lives distributed across the mesh
    assert len(y_sh[0][0].data.sharding.device_set) > 1

    p_sh = helper.pack_outputs(h.evaluator, auto_keys, y_sh, mesh=m)
    for c_ref, c_sh in zip(p_ref[0], p_sh[0]):
        np.testing.assert_array_equal(np.asarray(c_sh.data),
                                      np.asarray(c_ref.data))

    dec = helper.decrypt_outputs(adapter, h.decryptor, p_sh)
    want = (x.astype(object) @ w.astype(object)) % h.t
    np.testing.assert_array_equal(dec.astype(object) % h.t, want)


@needs_8
def test_matmul_sharded_limb_only_mesh():
    """A (1, 8) mesh — all parallelism on the limb axis (L=8): the shape a
    single-host v5e pod slice would use for one big ciphertext stream."""
    n = 64
    h = GeneralHeContext("BFV", n, log_t=20,
                         q_bits=(30,) * 9)  # 8 data limbs + special
    adapter = BatchEncoderAdapter(h.encoder)
    helper = MatmulHelper(4, 4, 4, n, MatmulObjective.EncryptLeft,
                          pack_lwe=False)
    x = RNG.integers(0, h.t, size=(4, 4), dtype=np.uint64)
    w = RNG.integers(0, h.t, size=(4, 4), dtype=np.uint64)
    x_enc = helper.encrypt_inputs(h.encryptor, adapter, x)
    w_enc = helper.encode_weights(adapter, w)
    y_ref = helper.matmul(h.evaluator, x_enc, w_enc)
    m = M.make_mesh(data=1, limb=8)
    y_sh = helper.matmul(h.evaluator, x_enc, w_enc, mesh=m)
    np.testing.assert_array_equal(np.asarray(y_sh[0][0].data),
                                  np.asarray(y_ref[0][0].data))
    dec = helper.decrypt_outputs(adapter, h.decryptor, y_sh)
    want = (x.astype(object) @ w.astype(object)) % h.t
    np.testing.assert_array_equal(dec.astype(object) % h.t, want)


@needs_8
def test_conv2d_sharded_end_to_end():
    n = 64
    h = GeneralHeContext("BFV", n, log_t=20, q_bits=(30, 30, 30, 30, 30))
    adapter = BatchEncoderAdapter(h.encoder)
    B, Ci, Co, H, W, kh, kw = 2, 2, 2, 4, 4, 2, 2
    helper = Conv2dHelper(B, Ci, Co, H, W, kh, kw, n,
                          MatmulObjective.EncryptLeft)
    x = RNG.integers(0, h.t, size=(B, Ci, H, W), dtype=np.uint64)
    w = RNG.integers(0, h.t, size=(Co, Ci, kh, kw), dtype=np.uint64)
    x_enc = helper.encrypt_inputs(h.encryptor, adapter, x)
    w_enc = helper.encode_weights(adapter, w)
    y_ref = helper.conv2d(h.evaluator, x_enc, w_enc)
    m = M.make_mesh(data=2, limb=4)
    y_sh = helper.conv2d(h.evaluator, x_enc, w_enc, mesh=m)
    for eb in range(len(y_ref.data)):
        for j in range(len(y_ref.data[0])):
            np.testing.assert_array_equal(np.asarray(y_sh[eb][j].data),
                                          np.asarray(y_ref[eb][j].data))
    got = helper.decrypt_outputs(adapter, h.decryptor, y_sh)
    xo, wo = x.astype(object), w.astype(object)
    want = np.zeros((B, Co, H - kh + 1, W - kw + 1), dtype=object)
    for i in range(H - kh + 1):
        for j in range(W - kw + 1):
            for b in range(B):
                for oc in range(Co):
                    want[b, oc, i, j] = sum(
                        (xo[b, ic, i:i + kh, j:j + kw] * wo[oc, ic]).sum()
                        for ic in range(Ci))
    np.testing.assert_array_equal(got.astype(object) % h.t, want % h.t)
