"""Cross-scheme LWE extract/pack matrix (mirrors reference test/lwe.cu:
every scenario runs for BFV, BGV and CKKS — the reference's host/device
axis collapses here since there is one device path)."""

import numpy as np
import pytest

from .fixtures import GeneralHeContext

RNG = np.random.default_rng(4242)
SCHEMES = ("BFV", "BGV", "CKKS")


def make(scheme, n=32):
    if scheme == "CKKS":
        return GeneralHeContext(scheme, n, q_bits=(30, 30, 30),
                                scale=2.0 ** 20)
    return GeneralHeContext(scheme, n, log_t=20, q_bits=(30, 30, 30))


def rand_poly(h):
    if h.scheme.name == "CKKS":
        return RNG.uniform(-4, 4, size=h.n)
    return RNG.integers(0, h.t, size=h.n, dtype=np.uint64)


def encrypt_poly(h, coeffs):
    if h.scheme.name == "CKKS":
        pt = h.encoder.encode_float64_polynomial(coeffs, scale=h.scale)
    else:
        pt = h.encoder.encode_polynomial(coeffs)
    return h.encryptor.encrypt_asymmetric(pt)


def decrypt_poly(h, ct):
    pt = h.decryptor.decrypt(ct)
    if h.scheme.name == "CKKS":
        return h.encoder.decode_float64_polynomial(pt)
    return h.encoder.decode_polynomial(pt)


def check(h, got, want, msg=""):
    if h.scheme.name == "CKKS":
        np.testing.assert_allclose(got, want, atol=2e-2, err_msg=msg)
    else:
        assert int(got) == int(want), f"{msg}: {got} != {want}"


@pytest.mark.parametrize("scheme", SCHEMES)
def test_extract_assemble(scheme):
    """(ref: lwe.cu test_extract_lwe)"""
    h = make(scheme)
    coeffs = rand_poly(h)
    ct = encrypt_poly(h, coeffs)
    for term in (0, 3, h.n - 1):
        lwe = h.evaluator.extract_lwe(ct, term)
        dec = decrypt_poly(h, h.evaluator.assemble_lwe(lwe))
        check(h, dec[0], coeffs[term], f"term {term}")


@pytest.mark.parametrize("scheme", SCHEMES)
@pytest.mark.parametrize("m", (1, 5, 8))
def test_pack_lwes(scheme, m):
    """(ref: lwe.cu test_pack_lwes; m covers single / ragged / full-stride)"""
    h = make(scheme)
    glk = h.keygen.create_automorphism_keys()
    coeffs = rand_poly(h)
    ct = encrypt_poly(h, coeffs)
    lwes = [h.evaluator.extract_lwe(ct, 2 * i) for i in range(m)]
    packed = h.evaluator.pack_lwe_ciphertexts(lwes, glk)
    dec = decrypt_poly(h, packed)
    ell = max(1, (m - 1).bit_length()) if m > 1 else 0
    stride = h.n >> ell
    for i in range(m):
        check(h, dec[i * stride], coeffs[2 * i], f"payload {i}")


@pytest.mark.parametrize("scheme", SCHEMES)
def test_pack_lwes_batched(scheme):
    """(ref: lwe.cu test_pack_lwes_batched)"""
    h = make(scheme)
    glk = h.keygen.create_automorphism_keys()
    coeffs = rand_poly(h)
    ct = encrypt_poly(h, coeffs)
    m, G = 4, 3
    groups = [[h.evaluator.extract_lwe(ct, g * m + i) for i in range(m)]
              for g in range(G)]
    batched = h.evaluator.pack_lwe_ciphertexts_batched(groups, glk)
    stride = h.n // 4
    for g in range(G):
        dec = decrypt_poly(h, batched[g])
        for i in range(m):
            check(h, dec[i * stride], coeffs[g * m + i], f"group {g} slot {i}")


@pytest.mark.parametrize("scheme", SCHEMES)
def test_pack_rlwes(scheme):
    """Pack 4 RLWE cts with payload stride 8 into one with stride 2
    (ref: lwe.cu test_pack_rlwes)."""
    h = make(scheme)
    glk = h.keygen.create_automorphism_keys()
    n = h.n
    in_iv, out_iv = 8, 2
    m = in_iv // out_iv
    polys = []
    cts = []
    for _ in range(m):
        c = rand_poly(h)
        mask = np.zeros(n, dtype=c.dtype)
        mask[::in_iv] = c[::in_iv]  # payloads on the input stride only
        polys.append(mask)
        cts.append(encrypt_poly(h, mask))
    packed = h.evaluator.pack_rlwe_ciphertexts(cts, glk, 0, in_iv, out_iv)
    dec = decrypt_poly(h, packed)
    # payload j of ct k lands at j*in_iv + k*out_iv
    for k in range(m):
        for j in range(n // in_iv):
            check(h, dec[j * in_iv + k * out_iv], polys[k][j * in_iv],
                  f"ct {k} payload {j}")


@pytest.mark.parametrize("scheme", SCHEMES)
def test_pack_rlwes_batched_matches_sequential(scheme):
    """(ref: lwe.cu test_pack_rlwes_batched)"""
    h = make(scheme)
    glk = h.keygen.create_automorphism_keys()
    n = h.n
    in_iv, out_iv = 4, 2
    m, G = 2, 2
    groups, polys = [], []
    for g in range(G):
        grp, ps = [], []
        for _ in range(m):
            c = rand_poly(h)
            mask = np.zeros(n, dtype=c.dtype)
            mask[::in_iv] = c[::in_iv]
            ps.append(mask)
            grp.append(encrypt_poly(h, mask))
        groups.append(grp)
        polys.append(ps)
    batched = h.evaluator.pack_rlwe_ciphertexts_batched(
        groups, glk, 0, in_iv, out_iv)
    assert len(batched) == G
    for g in range(G):
        dec_b = decrypt_poly(h, batched[g])
        dec_s = decrypt_poly(
            h, h.evaluator.pack_rlwe_ciphertexts(groups[g], glk, 0,
                                                 in_iv, out_iv))
        if scheme == "CKKS":
            np.testing.assert_allclose(dec_b, dec_s, atol=2e-2)
        else:
            np.testing.assert_array_equal(dec_b, dec_s)
        for k in range(m):
            for j in range(n // in_iv):
                check(h, dec_b[j * in_iv + k * out_iv],
                      polys[g][k][j * in_iv], f"g{g} ct{k} payload {j}")
