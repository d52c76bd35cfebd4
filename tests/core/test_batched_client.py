"""BatchedClient: device-batched encrypt/decrypt/encode step builders
(parallel/batched.py) vs the object-API client ops and Python-int oracles
(ref device client kernels: rlwe.cu:1-477, batch_encoder.cu:169-228)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from troy_tpu.core.params import SchemeType
from troy_tpu.parallel.batched import BatchedClient

from .fixtures import GeneralHeContext

RNG = np.random.default_rng(2025)
B = 3
N = 64


def _ctx(scheme):
    return GeneralHeContext(scheme, N, log_t=20, q_bits=(30, 30, 30))


@pytest.mark.parametrize("scheme", ["BFV", "BGV", "CKKS"])
@pytest.mark.parametrize("asym", [True, False], ids=["asym", "sym"])
def test_batched_encrypt_roundtrip(scheme, asym):
    """The fused batched encrypt step must produce B DISTINCT valid
    encryptions of the message, decryptable by the object API."""
    h = _ctx(scheme)
    cd = h.context.first_context_data()
    bc = BatchedClient(h.context, cd)
    if scheme == "CKKS":
        vals = RNG.uniform(-1, 1, h.encoder.slot_count)
        pt = h.encoder.encode(vals, scale=h.scale)
    else:
        vals = RNG.integers(0, h.t, h.encoder.slot_count, dtype=np.uint64)
        pt = h.encoder.encode(vals)
    base = h.encryptor.prng.base_keys
    if asym:
        step = bc.build_encrypt_asymmetric_step(
            base, pt.data, plain_ntt=bool(pt.is_ntt_form),
            is_rns=scheme == "CKKS")
        key_arr = h.pk.data()[..., :cd.coeff_modulus_size, :]
    else:
        step = bc.build_encrypt_symmetric_step(
            base, pt.data, plain_ntt=bool(pt.is_ntt_form),
            is_rns=scheme == "CKKS")
        key_arr = h.sk.data
    proto = h.encryptor.encrypt_asymmetric(pt)
    cur0 = jnp.stack([proto.data] * B)
    out = np.asarray(jax.jit(step)(cur0, key_arr))
    # batch elements must be distinct encryptions (fresh randomness each)
    assert (out[0] != out[1]).any() and (out[1] != out[2]).any()
    for i in range(B):
        ct = proto.clone()
        ct.data = jnp.asarray(out[i])
        ct.seed = None
        got = h.encoder.decode(h.decryptor.decrypt(ct))
        if scheme == "CKKS":
            np.testing.assert_allclose(got.real, vals, atol=2e-3)
        else:
            np.testing.assert_array_equal(got, vals)


@pytest.mark.parametrize("scheme", ["BFV", "BGV", "CKKS"])
def test_batched_decrypt_matches_object_api(scheme):
    h = _ctx(scheme)
    cd = h.context.first_context_data()
    bc = BatchedClient(h.context, cd)
    cts, wants = [], []
    for _ in range(B):
        if scheme == "CKKS":
            vals = RNG.uniform(-1, 1, h.encoder.slot_count)
        else:
            vals = RNG.integers(0, h.t, h.encoder.slot_count, dtype=np.uint64)
        cts.append(h.encrypt(vals))
        wants.append(np.asarray(h.decryptor.decrypt(cts[-1]).data))
    sk_pows = [h.decryptor._power(1)]
    inv_cf = 1
    if scheme == "BGV":
        from troy_tpu.utils import numth

        inv_cf = numth.invert_mod(cts[0].correction_factor, h.t)
    step = bc.build_decrypt_step(sk_pows, size=2, inv_cf=inv_cf)
    out = np.asarray(jax.jit(step)(jnp.stack([c.data for c in cts])))
    for i in range(B):
        np.testing.assert_array_equal(out[i], wants[i].reshape(out[i].shape))


@pytest.mark.parametrize("scheme", ["BFV", "BGV"])
def test_batch_encode_decode_steps(scheme):
    h = _ctx(scheme)
    cd = h.context.first_context_data()
    bc = BatchedClient(h.context, cd)
    enc_step = jax.jit(bc.build_batch_encode_step(h.encoder))
    dec_step = jax.jit(bc.build_batch_decode_step(h.encoder))
    vals = RNG.integers(0, h.t, (B, h.encoder.slot_count), dtype=np.uint64)
    coeffs = enc_step(jnp.asarray(vals.astype(np.uint32)))
    for i in range(B):
        want = np.asarray(h.encoder.encode(vals[i]).data)[0]
        np.testing.assert_array_equal(np.asarray(coeffs[i]), want)
    back = np.asarray(dec_step(coeffs))
    np.testing.assert_array_equal(back, vals.astype(np.uint32))
