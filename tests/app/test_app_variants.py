"""Crossed/EncryptRight app-layer variants + context-chain sanity
(mirrors reference test/app coverage breadth)."""

import numpy as np

from tests.core.fixtures import GeneralHeContext
from troy_tpu.app.matmul import MatmulHelper, MatmulObjective
from troy_tpu.app.conv2d import Conv2dHelper
from troy_tpu.app.encoder_adapter import BatchEncoderAdapter

RNG = np.random.default_rng(77177)


def test_matmul_cipher_crossed():
    n = 64
    h = GeneralHeContext("BFV", n, log_t=20, q_bits=(30,) * 5)
    adapter = BatchEncoderAdapter(h.encoder)
    batch, in_d, out_d = 2, 3, 2
    helper = MatmulHelper(batch, in_d, out_d, n, MatmulObjective.Crossed,
                          pack_lwe=False)
    x = RNG.integers(0, h.t, (batch, in_d), dtype=np.uint64)
    w = RNG.integers(0, h.t, (in_d, out_d), dtype=np.uint64)
    x_enc = helper.encrypt_inputs(h.encryptor, adapter, x)
    w_enc = helper.encrypt_weights(h.encryptor, adapter, w)
    y = helper.matmul_cipher(h.evaluator, x_enc, w_enc)
    dec = helper.decrypt_outputs(adapter, h.decryptor, y)
    want = (x.astype(object) @ w.astype(object)) % h.t
    np.testing.assert_array_equal(dec.astype(object) % h.t, want)


def _conv_setup(n=64):
    h = GeneralHeContext("BFV", n, log_t=20, q_bits=(30, 30, 30, 30))
    adapter = BatchEncoderAdapter(h.encoder)
    B, Ci, Co, H, W, kh, kw = 1, 2, 2, 4, 4, 2, 2
    helper = Conv2dHelper(B, Ci, Co, H, W, kh, kw, n,
                          MatmulObjective.EncryptRight)
    x = RNG.integers(0, 64, (B, Ci, H, W), dtype=np.uint64)
    k = RNG.integers(0, 64, (Co, Ci, kh, kw), dtype=np.uint64)
    want = np.zeros((B, Co, H - kh + 1, W - kw + 1), dtype=object)
    for b in range(B):
        for oc in range(Co):
            for i in range(H - kh + 1):
                for j in range(W - kw + 1):
                    want[b, oc, i, j] = sum(
                        int((x[b, ic, i:i+kh, j:j+kw].astype(object)
                             * k[oc, ic].astype(object)).sum())
                        for ic in range(Ci)) % h.t
    return h, adapter, helper, x, k, want


def test_conv2d_reverse():
    h, adapter, helper, x, k, want = _conv_setup()
    x_plain = helper.encode_inputs(adapter, x, for_cipher=False)
    k_enc = helper.encrypt_weights(h.encryptor, adapter, k)
    y = helper.conv2d_reverse(h.evaluator, x_plain, k_enc)
    dec = helper.decrypt_outputs(adapter, h.decryptor, y)
    np.testing.assert_array_equal(dec.astype(object) % h.t, want)


def test_conv2d_cipher():
    h, adapter, helper, x, k, want = _conv_setup()
    x_enc = helper.encrypt_inputs(h.encryptor, adapter, x)
    k_enc = helper.encrypt_weights(h.encryptor, adapter, k)
    y = helper.conv2d_cipher(h.evaluator, x_enc, k_enc)
    dec = helper.decrypt_outputs(adapter, h.decryptor, y)
    np.testing.assert_array_equal(dec.astype(object) % h.t, want)


def test_context_chain_structure():
    h = GeneralHeContext("BFV", 32, log_t=20, q_bits=(30, 30, 30, 30))
    ctx = h.context
    key = ctx.key_context_data()
    first = ctx.first_context_data()
    last = ctx.last_context_data()
    assert key.coeff_modulus_size == 4
    assert first.coeff_modulus_size == 3
    assert last.coeff_modulus_size == 1
    assert key.next is first and first.prev is key
    assert ctx.using_keyswitching
    # parms_id of identical params is stable
    assert first.parms_id == ctx.get_context_data(first.parms_id).parms_id
    # walking next links reaches last
    cd, hops = first, 0
    while not cd.is_last():
        cd = cd.next
        hops += 1
    assert cd is last and hops == 2
