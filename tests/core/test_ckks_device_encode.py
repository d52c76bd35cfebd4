"""Device CKKS encode (double-float FFT + exact RNS rounding, ops/ddfft.py).

Reference parity target: src/ckks_encoder.cu device encode (231-355,
454-692).  The device path's only approximation is the dd FFT (~2^-48
relative); rounding + RNS reduction are exact, verified here against
Python-int oracles.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from troy_tpu.ops import ddfft as DD
from tests.core.fixtures import GeneralHeContext


def _fft_via_dd(x: np.ndarray) -> np.ndarray:
    """Run the dd FFT eagerly and recombine to complex128."""
    n = x.shape[-1]
    tw = DD.fft_twiddles(n)
    rh, rl = DD.split_f64(x.real)
    ih, il = DD.split_f64(x.imag)
    out = DD.fft_dd((jnp.asarray(rh), jnp.asarray(rl),
                     jnp.asarray(ih), jnp.asarray(il)), tw)
    perm = DD.brv_perm(n)
    comps = [np.asarray(c, dtype=np.float64)[..., perm] for c in out]
    return (comps[0] + comps[1]) + 1j * (comps[2] + comps[3])


class TestDdPrimitives:
    def test_two_sum_exact(self):
        a = jnp.float32(1.0e8)
        b = jnp.float32(3.14159)
        s, e = DD.two_sum(a, b)
        assert float(s) + float(e) == float(a) + float(b)  # exact in f64

    def test_two_prod_exact(self):
        rng = np.random.default_rng(0)
        a = jnp.asarray(rng.uniform(-1e6, 1e6, 64).astype(np.float32))
        b = jnp.asarray(rng.uniform(-1e6, 1e6, 64).astype(np.float32))
        p, e = DD.two_prod(a, b)
        # f32*f32 is exact in f64, so p + e must equal the f64 product
        exact = np.asarray(a, np.float64) * np.asarray(b, np.float64)
        got = np.asarray(p, np.float64) + np.asarray(e, np.float64)
        assert (got == exact).all()

    def test_dd_mul_precision(self):
        rng = np.random.default_rng(1)
        x = rng.uniform(-1, 1, 128)
        y = rng.uniform(-1, 1, 128)
        xh, xl = (jnp.asarray(v) for v in DD.split_f64(x))
        yh, yl = (jnp.asarray(v) for v in DD.split_f64(y))
        ph, pl = DD.dd_mul(xh, xl, yh, yl)
        got = np.asarray(ph, np.float64) + np.asarray(pl, np.float64)
        assert np.max(np.abs(got - x * y)) < 2.0 ** -44


class TestDdFFT:
    @pytest.mark.parametrize("n", [64, 256, 2048])
    def test_matches_numpy_fft(self, n):
        rng = np.random.default_rng(n)
        x = rng.uniform(-1, 1, n) + 1j * rng.uniform(-1, 1, n)
        got = _fft_via_dd(x)
        ref = np.fft.fft(x)
        rel = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
        assert rel < 1e-11  # ~2^-36 worst case; f32 alone would be ~1e-4

    def test_batched_leading_axis(self):
        rng = np.random.default_rng(9)
        x = rng.uniform(-1, 1, (3, 128)) + 1j * rng.uniform(-1, 1, (3, 128))
        got = _fft_via_dd(x)
        ref = np.fft.fft(x, axis=-1)
        assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 1e-11


class TestRoundWords:
    def test_exact_round_and_words(self):
        rng = np.random.default_rng(2)
        # dd split of a 2^44-magnitude f64 carries ~0.03 absolute error;
        # keep the fraction 0.1 clear of the .5 rounding boundary
        ints = rng.integers(-(2 ** 44), 2 ** 44, size=256)
        frac = rng.uniform(-0.4, 0.4, size=256)
        vals = ints.astype(np.float64) + frac
        h, l = DD.split_f64(vals)
        hi24, w0 = DD.dd_round_words(jnp.asarray(h), jnp.asarray(l))
        hi24 = np.asarray(hi24, dtype=np.int64)
        w0 = np.asarray(w0, dtype=np.int64)
        assert (0 <= hi24).all() and (hi24 < 2 ** 24).all()
        assert (0 <= w0).all() and (w0 < 2 ** 24).all()
        recon = hi24 * 2 ** 24 + w0 - 2 ** 47
        # the dd value is ints + frac up to split error ~2^-7 at 2^45 —
        # stay off the .5 boundary and the round must match exactly
        assert (recon == ints).all()

    def test_round_words_jit_matches_eager(self):
        """Regression: XLA's algebraic simplifier reassociates float chains
        with constant operands under jit; the integer-domain centering shift
        must make the jitted words bit-identical to eager."""
        import jax

        rng = np.random.default_rng(8)
        ints = rng.integers(-(2 ** 44), 2 ** 44, size=512)
        frac = rng.uniform(-0.4, 0.4, size=512)
        h, l = DD.split_f64(ints.astype(np.float64) + frac)
        h, l = jnp.asarray(h), jnp.asarray(l)
        eh, ew = DD.dd_round_words(h, l)
        jh, jw = jax.jit(DD.dd_round_words)(h, l)
        assert (np.asarray(eh) == np.asarray(jh)).all()
        assert (np.asarray(ew) == np.asarray(jw)).all()
        recon = (np.asarray(jh, np.int64) * 2 ** 24
                 + np.asarray(jw, np.int64) - 2 ** 47)
        assert (recon == ints).all()

    def test_rns_reduction_exact_fast(self):
        g = GeneralHeContext("CKKS", 32, q_bits=(30, 30))
        moduli = g.context.first_context_data().parms.coeff_modulus
        rng = np.random.default_rng(3)
        ints = rng.integers(-(2 ** 45), 2 ** 45, size=64)
        h, l = DD.split_f64(ints.astype(np.float64))
        words = DD.dd_to_words(jnp.asarray(h), jnp.asarray(l), 2)
        res = np.asarray(DD.words_to_rns_fast(words, list(moduli)))
        for i, m in enumerate(moduli):
            expect = [int(v) % m.value for v in ints]
            assert res[i].tolist() == expect

    def test_rns_reduction_exact_wide(self):
        g = GeneralHeContext("CKKS", 32, q_bits=(50, 40))
        moduli = g.context.first_context_data().parms.coeff_modulus
        rng = np.random.default_rng(4)
        ints = rng.integers(-(2 ** 45), 2 ** 45, size=64)
        h, l = DD.split_f64(ints.astype(np.float64))
        words = DD.dd_to_words(jnp.asarray(h), jnp.asarray(l), 2)
        res = np.asarray(DD.words_to_rns_wide(words, list(moduli)),
                         dtype=np.uint64)
        vals = (res[0] << np.uint64(32)) | res[1]
        for i, m in enumerate(moduli):
            expect = [int(v) % m.value for v in ints]
            assert vals[i].tolist() == expect

    @pytest.mark.parametrize("W", [3, 4, 5])
    def test_multiword_exact(self, W):
        """dd_to_words at W > 2: the words must reconstruct the rounded dd
        value exactly for |value| within the dd-exact range, and the RNS
        reduction of the words stays a bit-exact function of them."""
        g = GeneralHeContext("CKKS", 32, q_bits=(30, 30))
        moduli = g.context.first_context_data().parms.coeff_modulus
        rng = np.random.default_rng(40 + W)
        # values exactly representable as dd (<= 2^45 keeps split exact)
        ints = rng.integers(-(2 ** 45), 2 ** 45, size=128)
        h, l = DD.split_f64(ints.astype(np.float64))
        words = DD.dd_to_words(jnp.asarray(h), jnp.asarray(l), W)
        ws = [np.asarray(w, dtype=np.int64) for w in words]
        for w in ws:
            assert (0 <= w).all() and (w < 2 ** 24).all()
        # Python-int oracle (numpy would wrap at 2^63)
        for j in range(len(ints)):
            recon = sum(int(w[j]) * 2 ** (24 * i)
                        for i, w in enumerate(ws)) - DD.words_shift(W)
            assert recon == int(ints[j])
        res = np.asarray(DD.words_to_rns_fast(words, list(moduli)))
        for i, m in enumerate(moduli):
            expect = [int(v) % m.value for v in ints]
            assert res[i].tolist() == expect


class TestEncodeDevice:
    @pytest.mark.parametrize("q_bits", [(30, 30, 30), (60, 40, 40)])
    def test_roundtrip_and_host_parity(self, q_bits):
        g = GeneralHeContext("CKKS", 64, q_bits=q_bits, scale=2.0 ** 25)
        rng = np.random.default_rng(5)
        v = rng.uniform(-1, 1, g.encoder.slot_count) \
            + 1j * rng.uniform(-1, 1, g.encoder.slot_count)
        pt_dev = g.encoder.encode_device(v, scale=g.scale)
        pt_host = g.encoder.encode(v, scale=g.scale)
        # decoded values agree with each other and the input
        d_dev = g.encoder.decode(pt_dev)
        d_host = g.encoder.decode(pt_host)
        assert np.max(np.abs(d_dev - v)) < 1e-5
        assert np.max(np.abs(d_dev - d_host)) < 1e-5
        # the two RNS encodings differ by at most 1 rounding unit per coeff
        assert pt_dev.data.shape == pt_host.data.shape

    def test_encrypt_compute_decrypt(self):
        g = GeneralHeContext("CKKS", 64, q_bits=(30, 30, 30), scale=2.0 ** 25)
        rng = np.random.default_rng(6)
        n2 = g.encoder.slot_count
        v1 = rng.uniform(-1, 1, n2)
        v2 = rng.uniform(-1, 1, n2)
        ct1 = g.encryptor.encrypt_symmetric(
            g.encoder.encode_device(v1, scale=g.scale))
        ct2 = g.encryptor.encrypt_symmetric(
            g.encoder.encode_device(v2, scale=g.scale))
        got = g.decrypt(g.evaluator.add(ct1, ct2))
        assert np.max(np.abs(got - (v1 + v2))) < 1e-4

    def test_batched_leading_axis(self):
        g = GeneralHeContext("CKKS", 64, q_bits=(30, 30), scale=2.0 ** 25)
        rng = np.random.default_rng(7)
        vs = rng.uniform(-1, 1, (3, g.encoder.slot_count))
        pt = g.encoder.encode_device(vs, scale=g.scale)
        assert pt.data.shape[0] == 3
        from troy_tpu.core.plaintext import Plaintext

        for i in range(3):
            row = Plaintext(pt.data[i], parms_id=pt.parms_id, scale=pt.scale,
                            is_ntt_form=True)
            assert np.max(np.abs(g.encoder.decode(row) - vs[i])) < 1e-5

    def test_large_scale_tier(self):
        """scale * max|v| ~ 2^50 — beyond the W=2 exact tier (2^46), handled
        by the multi-word tier with ~2^-47 relative coefficient error (ref:
        the 128-bit tier of src/ckks_encoder.cu:454-692)."""
        g = GeneralHeContext("CKKS", 64, q_bits=(60, 60, 60), scale=2.0 ** 40)
        rng = np.random.default_rng(17)
        v = rng.uniform(-1000.0, 1000.0, g.encoder.slot_count)
        pt = g.encoder.encode_device(v, scale=2.0 ** 40)
        back = g.encoder.decode(pt)
        # error budget: FFT 2^-47 relative on coeffs ~2^50 -> ~2^3/scale
        assert np.max(np.abs(back - v)) < 1e-6

    def test_bound_gate(self):
        g = GeneralHeContext("CKKS", 64, q_bits=(30, 30, 30), scale=2.0 ** 40)
        with pytest.raises(ValueError, match="2\\^117 device bound"):
            g.encoder.encode_device(np.full(4, 2.0 ** 80), scale=2.0 ** 40)
        with pytest.raises(ValueError, match="exceed q/2"):
            # C = 2^90 clears the word-count gate but not Q = 2^90
            g.encoder.encode_device(np.full(4, 2.0 ** 50), scale=2.0 ** 40)


class TestEncodeDeviceProperties:
    def test_random_scales_and_magnitudes(self):
        """Property sweep: across random (scale, magnitude) configs —
        including non-power-of-2 scales — the device encode must decode
        back within the dd error model (~max(n/scale, 2^-40 * max|v|))."""
        g = GeneralHeContext("CKKS", 64, q_bits=(30, 30, 30),
                             scale=2.0 ** 25)
        rng = np.random.default_rng(21)
        for _ in range(12):
            log_scale = rng.uniform(18, 30)
            scale = float(2.0 ** log_scale) * rng.uniform(0.8, 1.2)
            mag = float(2.0 ** rng.uniform(-3, 8))
            if scale * mag >= 2.0 ** 45:
                continue
            v = (rng.uniform(-mag, mag, g.encoder.slot_count)
                 + 1j * rng.uniform(-mag, mag, g.encoder.slot_count))
            pt = g.encoder.encode_device(v, scale=scale)
            back = g.encoder.decode(pt)
            tol = max(64.0 / scale, mag * 2.0 ** -38) * 8
            err = np.max(np.abs(back - v))
            assert err < tol, (scale, mag, err, tol)


class TestDecodeDevice:
    def test_fast_path_last_level(self):
        g = GeneralHeContext("CKKS", 64, q_bits=(30, 30), scale=2.0 ** 25)
        rng = np.random.default_rng(11)
        v = rng.uniform(-1, 1, g.encoder.slot_count) \
            + 1j * rng.uniform(-1, 1, g.encoder.slot_count)
        pt = g.encoder.encode(v, parms_id=g.context.last_parms_id,
                              scale=g.scale)
        d_host = g.encoder.decode(pt)
        d_dev = g.encoder.decode_device(pt)
        assert np.max(np.abs(d_dev - d_host)) < 1e-8
        assert np.max(np.abs(d_dev - v)) < 1e-5

    def test_wide_path(self):
        g = GeneralHeContext("CKKS", 64, q_bits=(50, 40), scale=2.0 ** 35)
        rng = np.random.default_rng(12)
        v = rng.uniform(-1, 1, g.encoder.slot_count)
        pt = g.encoder.encode(v, parms_id=g.context.last_parms_id,
                              scale=2.0 ** 35)
        d_dev = g.encoder.decode_device(pt)
        assert np.max(np.abs(d_dev - g.encoder.decode(pt))) < 1e-6

    def test_after_homomorphic_rescale(self):
        """The serving scenario: multiply + rescale down, then device-decode
        at the reduced margin."""
        g = GeneralHeContext("CKKS", 64, q_bits=(30, 30, 30), scale=2.0 ** 26)
        rng = np.random.default_rng(13)
        n2 = g.encoder.slot_count
        a = rng.uniform(-1, 1, n2)
        b = rng.uniform(-1, 1, n2)
        rlk = g.keygen.create_relin_keys()
        ct = g.evaluator.multiply(g.encrypt(a), g.encrypt(b))
        # rescale drops to the last level: Q = 30 bits, scale ~2^22
        ct = g.evaluator.rescale_to_next(g.evaluator.relinearize(ct, rlk))
        pt = g.decryptor.decrypt(ct)
        got = g.encoder.decode_device(pt)
        assert np.max(np.abs(got - a * b)) < 1e-3
        assert np.max(np.abs(got - g.encoder.decode(pt))) < 1e-6

    def test_batched_decode(self):
        g = GeneralHeContext("CKKS", 64, q_bits=(30, 30), scale=2.0 ** 25)
        rng = np.random.default_rng(14)
        vs = rng.uniform(-1, 1, (3, g.encoder.slot_count))
        pt = g.encoder.encode_device(vs, parms_id=g.context.last_parms_id,
                                     scale=g.scale)
        got = g.encoder.decode_device(pt)
        assert got.shape == vs.shape
        assert np.max(np.abs(got - vs)) < 1e-5

    def test_large_margin_fresh_ct(self):
        """Round 3 lifts the old log2(Q/scale) <= 20 gate: the fixed-point
        fractional CRT keeps RELATIVE precision at any margin, so a fresh
        (never rescaled) plaintext decodes on device.  Q = 130 bits wide
        path, margin 95 bits."""
        g = GeneralHeContext("CKKS", 64, q_bits=(50, 40, 40), scale=2.0 ** 35)
        rng = np.random.default_rng(23)
        v = rng.uniform(-1, 1, g.encoder.slot_count) \
            + 1j * rng.uniform(-1, 1, g.encoder.slot_count)
        pt = g.encoder.encode(v, scale=2.0 ** 35)
        d_dev = g.encoder.decode_device(pt)
        d_host = g.encoder.decode(pt)
        assert np.max(np.abs(d_dev - d_host)) < 1e-9
        assert np.max(np.abs(d_dev - v)) < 1e-5


class TestMultiwordTierBound:
    def test_multiword_bound_vs_host_across_envelope(self):
        """Documented error-bound property (round-4): across the supported
        multi-word envelope — W in {3, 4, 5} word tiers, both residue
        widths, every chain level where C fits q/2 — the device-encoded
        CENTERED INTEGER coefficients differ from the host big-int path by
        at most C * 2^-45 (C = scale * max|v|).  The dd FFT carries ~48
        significant bits, so each rounded coefficient may land within
        C * 2^-47 of the host's; the word decomposition and RNS reduction
        after rounding are bit-exact integer functions (verified separately
        by test_multiword_exact / test_rns_reduction_exact_*), so the FFT
        is the ONLY divergence and the margin is 4x the model.  The
        reference's f64 device encoder carries the same-shaped bound at
        C * 2^-52 (src/ckks_encoder.cu:454-692)."""
        rng = np.random.default_rng(4747)
        checked = 0
        for q_bits, n in [((30,) * 6, 64), ((60, 60, 60), 64)]:
            g = GeneralHeContext("CKKS", n, q_bits=q_bits, scale=2.0 ** 25)
            ctx = g.context
            slots = g.encoder.slot_count
            levels = [ctx.first_parms_id,
                      ctx.get_context_data(ctx.first_parms_id).next.parms_id]
            for scale in (2.0 ** 50, 2.0 ** 72, 2.0 ** 95, 2.0 ** 110):
                v = rng.uniform(-1, 1, slots) + 1j * rng.uniform(-1, 1, slots)
                C = scale * np.max(np.abs(v))
                for pid in levels:
                    cd = ctx.get_context_data(pid)
                    if 4 * C >= 2.0 ** cd.total_coeff_modulus.bit_length():
                        continue  # outside the encoder's own q/2 gate
                    pt_dev = g.encoder.encode_device(v, pid, scale=scale)
                    pt_host = g.encoder.encode(v, pid, scale=scale)
                    from troy_tpu.core.ckks_encoder import _ntt_jit

                    def centered(pt):
                        arr = np.asarray(_ntt_jit(cd, False)(pt.data))
                        if cd.wide:
                            from troy_tpu.ops.u64 import unpack64

                            arr = unpack64(arr[0], arr[1])
                        Q = cd.base_q.prod
                        comp = np.array(cd.base_q.compose_array_host(arr),
                                        dtype=object)
                        return np.where(comp > Q // 2, comp - Q, comp)

                    diff = np.abs(centered(pt_dev) - centered(pt_host))
                    bound = int(C * 2.0 ** -45) + 2
                    assert int(diff.max()) <= bound, (
                        f"q_bits={q_bits} scale=2^{np.log2(scale):.0f} "
                        f"level={cd.chain_index}: max diff {diff.max()} "
                        f"> bound {bound}")
                    checked += 1
        assert checked >= 10  # the envelope was actually swept


def test_decode_device_margin_gate():
    """log2(Q/scale) > 120 must raise with a clear pointer to decode()
    (the dd-f32 stages cannot represent Q/scale past the f32 exponent)."""
    import pytest

    g = GeneralHeContext("CKKS", 64, q_bits=(30, 30, 30, 30, 30, 30),
                         scale=2.0 ** 20)
    rng = np.random.default_rng(31)
    v = rng.uniform(-1, 1, g.encoder.slot_count)
    pt = g.encoder.encode(v, scale=2.0 ** 20)  # margin = 150 - 20 = 130
    with pytest.raises(ValueError, match="120-bit device envelope"):
        g.encoder.decode_device(pt)
