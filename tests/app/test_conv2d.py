"""Conv2dHelper tests (mirrors reference test/app/conv2d.cu; full pipeline
vs plain numpy valid convolution)."""

import numpy as np

from tests.core.fixtures import GeneralHeContext

from troy_tpu.app.conv2d import Conv2dHelper
from troy_tpu.app.matmul import MatmulObjective
from troy_tpu.app.encoder_adapter import BatchEncoderAdapter

RNG = np.random.default_rng(31337)


def plain_conv2d_valid(x, k, t):
    B, Ci, H, W = x.shape
    Co = k.shape[0]
    kh, kw = k.shape[2], k.shape[3]
    out = np.zeros((B, Co, H - kh + 1, W - kw + 1), dtype=object)
    for b in range(B):
        for oc in range(Co):
            for i in range(H - kh + 1):
                for j in range(W - kw + 1):
                    acc = 0
                    for ic in range(Ci):
                        acc += int(
                            (x[b, ic, i : i + kh, j : j + kw].astype(object)
                             * k[oc, ic].astype(object)).sum())
                    out[b, oc, i, j] = acc % t
    return out


def run_conv(batch=2, ci=2, co=2, H=5, W=6, kh=2, kw=3, n=64):
    h = GeneralHeContext("BFV", n, log_t=20, q_bits=(30, 30, 30, 30))
    adapter = BatchEncoderAdapter(h.encoder)
    helper = Conv2dHelper(batch, ci, co, H, W, kh, kw, n,
                          MatmulObjective.EncryptLeft)
    x = RNG.integers(0, h.t, size=(batch, ci, H, W), dtype=np.uint64)
    k = RNG.integers(0, h.t, size=(co, ci, kh, kw), dtype=np.uint64)
    bias = RNG.integers(0, h.t, size=(batch, co, H - kh + 1, W - kw + 1),
                        dtype=np.uint64)
    x_enc = helper.encrypt_inputs(h.encryptor, adapter, x)
    k_enc = helper.encode_weights(adapter, k)
    y = helper.conv2d(h.evaluator, x_enc, k_enc)
    y = y.add_plain(helper.encode_outputs(adapter, bias), h.evaluator)
    dec = helper.decrypt_outputs(adapter, h.decryptor, y)
    want = (plain_conv2d_valid(x, k, h.t) + bias.astype(object)) % h.t
    np.testing.assert_array_equal(dec.astype(object) % h.t, want)


def test_conv2d_basic():
    run_conv()


def test_conv2d_tiled():
    # forces image tiling: 8x8 image with small slot count budget
    run_conv(batch=1, ci=1, co=1, H=8, W=8, kh=3, kw=3, n=64)


def test_conv2d_channels():
    run_conv(batch=1, ci=3, co=2, H=4, W=4, kh=2, kw=2, n=64)


def test_ring2k_conv2d():
    """Cheetah conv2d over Z_2^k (reference test/app conv2d ring2k cases)."""
    from troy_tpu.app.ring2k import PolynomialEncoderRing2k
    from troy_tpu.app.encoder_adapter import Ring2kEncoderAdapter
    from troy_tpu.app.matmul import MatmulObjective

    n, k = 64, 18
    h = GeneralHeContext("BFV", n, log_t=20, q_bits=(30, 30, 30, 30))
    enc = PolynomialEncoderRing2k(h.context, k)
    adapter = Ring2kEncoderAdapter(enc)
    mask = (1 << k) - 1
    B, Ci, Co, H, W, kh, kw = 1, 2, 1, 4, 4, 2, 2
    helper = Conv2dHelper(B, Ci, Co, H, W, kh, kw, n, MatmulObjective.EncryptLeft)
    x = RNG.integers(0, 1 << k, (B, Ci, H, W), dtype=np.uint64)
    kern = RNG.integers(0, 1 << k, (Co, Ci, kh, kw), dtype=np.uint64)
    x_enc = helper.encrypt_inputs(h.encryptor, adapter, x)
    k_enc = helper.encode_weights(adapter, kern)
    y = helper.conv2d(h.evaluator, x_enc, k_enc)
    dec = helper.decrypt_outputs(adapter, h.decryptor, y)
    for b in range(B):
        for oc in range(Co):
            for i in range(H - kh + 1):
                for j in range(W - kw + 1):
                    acc = sum(int((x[b, ic, i:i+kh, j:j+kw].astype(object)
                                   * kern[oc, ic].astype(object)).sum())
                              for ic in range(Ci)) & mask
                    assert int(dec[b, oc, i, j]) & mask == acc


def test_conv2d_ring2k_wide():
    """Cheetah conv2d over Z_2^40 (wide limb-plane encoder path)."""
    from troy_tpu.app.ring2k import PolynomialEncoderRing2k
    from troy_tpu.app.encoder_adapter import Ring2kEncoderAdapter

    n, k = 64, 40
    h = GeneralHeContext("BFV", n, log_t=20, q_bits=(30,) * 4)
    enc = PolynomialEncoderRing2k(h.context, k)
    adapter = Ring2kEncoderAdapter(enc)
    mask = (1 << k) - 1
    B, Ci, Co, H, W, kh, kw = 1, 1, 1, 3, 3, 2, 2
    helper = Conv2dHelper(B, Ci, Co, H, W, kh, kw, n,
                          MatmulObjective.EncryptLeft)
    x = RNG.integers(0, 1 << 20, (B, Ci, H, W), dtype=np.uint64)
    kern = RNG.integers(0, 1 << 20, (Co, Ci, kh, kw), dtype=np.uint64)
    x_enc = helper.encrypt_inputs(h.encryptor, adapter, x)
    k_pt = helper.encode_weights(adapter, kern)
    y = helper.conv2d(h.evaluator, x_enc, k_pt)
    dec = helper.decrypt_outputs(adapter, h.decryptor, y)
    want = np.zeros((B, Co, H - kh + 1, W - kw + 1), dtype=object)
    for i in range(H - kh + 1):
        for j in range(W - kw + 1):
            want[0, 0, i, j] = int((x[0, 0, i:i+kh, j:j+kw].astype(object)
                                    * kern[0, 0].astype(object)).sum()) & mask
    got = np.vectorize(lambda v: int(v) & mask, otypes=[object])(dec)
    np.testing.assert_array_equal(got, want)


def test_conv2d_output_serialization():
    """Server->client wire: sparse save_terms round trip + size win
    (ref: conv2d.h:113-114 serialize_outputs/deserialize_outputs)."""
    from troy_tpu.utils import serialize as S

    n = 64
    h = GeneralHeContext("BFV", n, log_t=20, q_bits=(30, 30, 30, 30))
    adapter = BatchEncoderAdapter(h.encoder)
    batch, ci, co, H, W, kh, kw = 2, 2, 3, 4, 5, 2, 2
    helper = Conv2dHelper(batch, ci, co, H, W, kh, kw, n,
                          MatmulObjective.EncryptLeft)
    x = RNG.integers(0, h.t, size=(batch, ci, H, W), dtype=np.uint64)
    k = RNG.integers(0, h.t, size=(co, ci, kh, kw), dtype=np.uint64)
    x_enc = helper.encrypt_inputs(h.encryptor, adapter, x)
    y = helper.conv2d(h.evaluator, x_enc, helper.encode_weights(adapter, k))
    blobs = helper.serialize_outputs(h.context, y, S.CompressionMode.Zstd)
    full = [S.save_ciphertext(c, h.context) for row in y.data for c in row]
    assert sum(map(len, blobs)) < sum(map(len, full))
    y2 = helper.deserialize_outputs(h.context, blobs)
    dec = helper.decrypt_outputs(adapter, h.decryptor, y2)
    want = plain_conv2d_valid(x, k, h.t)
    np.testing.assert_array_equal(dec.astype(object) % h.t, want)
