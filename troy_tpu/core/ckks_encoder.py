"""CKKS encoder: canonical embedding encode/decode.

TPU-native rebuild of reference src/ckks_encoder.{h,cu} (1579 LoC of device
complex-double FFT).  Encode/decode are *client-side* operations, so this
build keeps them on the host in numpy complex128 (TPUs have no f64 hardware;
the reference's device FFT is a CUDA-ism), while everything homomorphic stays
in u32 RNS on device.

Math: slot k (k < n/2) is the evaluation at zeta^{e_k}, e_k = 3^k mod 2n
(zeta = exp(i*pi/n), primitive 2n-th root), with the conjugate value at -e_k.
Evaluations at all odd powers relate to coefficients by a twisted size-n FFT:
  p(zeta^(2j+1)) = sum_i (c_i * zeta^i) * omega^(i*j),  omega = exp(2i*pi/n)
so encode = scatter slots -> odd-power evaluations -> fft/n -> untwist ->
round(scale * c) -> centered RNS decompose -> NTT.  The 3^k slot ordering
matches rotate_vector/conjugate semantics (ops/galois.py).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .context import HeContext, ContextData
from .params import ParmsID, SchemeType
from .plaintext import Plaintext
from ..ops import ntt as NTT, rp as R
from ..ops import ddfft as DD


def _round_ints(scaled: np.ndarray):
    """Round float64 coefficients to integers, vectorized: int64 lanes when
    they fit (always exact — float64 has 53 mantissa bits), object otherwise."""
    if np.max(np.abs(scaled)) < 2.0 ** 62:
        return np.round(scaled).astype(np.int64)
    return np.array([int(round(x)) for x in scaled], dtype=object)


def _ntt_jit(cd: ContextData, forward: bool):
    """Whole-transform jitted NTT for the encoder, cached per level on the
    shared ContextData._jit_ops dict (one compile + one dispatch per encode
    instead of ~400 eager ops — critical through the remote-TPU tunnel)."""
    cache = getattr(cd, "_jit_ops", None)
    if cache is None:
        cache = {}
        cd._jit_ops = cache
    key = "encoder_ntt_fwd" if forward else "encoder_ntt_inv"
    if key not in cache:
        tab = cd.qtab()  # materialize BEFORE tracing (table = closure const)
        fn = R.ntt_forward if forward else R.ntt_inverse
        cache[key] = jax.jit(lambda x: fn(x, tab))
    return cache[key]


class CKKSEncoder:
    def __init__(self, context: HeContext):
        self.context = context
        cd = context.first_context_data()
        n = cd.parms.poly_modulus_degree
        self.n = n
        self.slots = n // 2
        # slot k <-> odd-power index j = (e_k - 1) / 2 and its conjugate
        m = 2 * n
        e = 1
        idx = np.empty(self.slots, dtype=np.int64)
        idx_conj = np.empty(self.slots, dtype=np.int64)
        for k in range(self.slots):
            idx[k] = (e - 1) // 2
            idx_conj[k] = (m - e - 1) // 2
            e = e * 3 % m
        self._idx, self._idx_conj = idx, idx_conj
        i = np.arange(n)
        self._twist = np.exp(1j * np.pi * i / n)        # zeta^i
        self._untwist = np.conj(self._twist)

    @property
    def slot_count(self) -> int:
        return self.slots

    # ------------------------------------------------------------------
    def _coeffs_to_rns(self, coeffs: np.ndarray, cd: ContextData) -> np.ndarray:
        """Centered integer coefficients (object array) -> (L, n) u32 residues
        or ([2,] L, n) wide pairs for 40-60-bit prime sets.  Vectorized
        (int64 lanes when coefficients fit, object-dtype otherwise — ref
        three-tier decomposition, src/ckks_encoder.cu:454-692)."""
        if cd.wide:
            res = cd.base_q.residues_host(coeffs)  # (L, n) object/int64
            res = np.asarray(res, dtype=np.uint64)
            return np.stack([(res >> np.uint64(32)).astype(np.uint32),
                             (res & np.uint64(0xFFFFFFFF)).astype(np.uint32)])
        return cd.base_q.decompose_array_host(coeffs)

    @staticmethod
    def _compose_centered(data, cd: ContextData) -> np.ndarray:
        """RNS residues -> centered float64 coefficients (host CRT; exact
        u64 multi-word fast path, rns_base.compose_centered_f64_host)."""
        arr = np.asarray(data)
        if cd.wide:
            from ..ops.u64 import unpack64

            arr = unpack64(arr[0], arr[1])
        return cd.base_q.compose_centered_f64_host(arr)

    def encode(self, values, parms_id: ParmsID | None = None,
               scale: float = 2.0 ** 40) -> Plaintext:
        """SIMD-encode complex values (ref: ckks_encoder.h:84 encode_complex64_simd)."""
        cd = self.context.get_context_data(parms_id or self.context.first_parms_id)
        v = np.zeros(self.slots, dtype=np.complex128)
        arr = np.asarray(values, dtype=np.complex128)
        v[: len(arr)] = arr
        ev = np.zeros(self.n, dtype=np.complex128)
        ev[self._idx] = v
        ev[self._idx_conj] = np.conj(v)
        coeffs = (np.fft.fft(ev) / self.n) * self._untwist
        scaled = coeffs.real * scale
        limit = cd.total_coeff_modulus / 2
        if np.max(np.abs(scaled)) >= limit:
            raise ValueError("[CKKSEncoder.encode] scaled values exceed q/2")
        rns = self._coeffs_to_rns(_round_ints(scaled), cd)
        data = _ntt_jit(cd, True)(jnp.asarray(rns))
        return Plaintext(data, parms_id=cd.parms_id, scale=scale, is_ntt_form=True)

    # ------------------------------------------------------------------
    # Device fast path: double-float FFT + exact RNS rounding (ops/ddfft.py)
    # ------------------------------------------------------------------
    def _device_tables(self):
        """Per-encoder FFT constants for the device encode pipeline (host
        numpy, built once)."""
        if not hasattr(self, "_dd_tables"):
            n = self.n
            i = np.arange(n)
            untwist = np.exp(-1j * np.pi * i / n)  # conj(zeta^i)
            self._dd_tables = {
                "twiddles": DD.fft_twiddles(n),
                "brv": jnp.asarray(DD.brv_perm(n)),
                "untwist": tuple(jnp.asarray(c)
                                 for c in DD.cdd_tables(untwist)),
            }
        return self._dd_tables

    def _encode_device_jit(self, cd: ContextData, W: int = 2):
        """One jitted pipeline per (level, word count): dd FFT -> untwist ->
        scale -> round to W 24-bit words -> RNS -> NTT.  Cached on the shared
        ContextData._jit_ops dict (one compile per key, shared across
        encoder instances)."""
        cache = getattr(cd, "_jit_ops", None)
        if cache is None:
            cache = {}
            cd._jit_ops = cache
        key = ("encoder_device_encode", W)
        if key in cache:
            return cache[key]
        tabs = self._device_tables()
        qtab = cd.qtab()  # materialize BEFORE tracing
        moduli = list(cd.parms.coeff_modulus)
        wide = cd.wide
        twiddles, brv, untwist = (tabs["twiddles"], tabs["brv"],
                                  tabs["untwist"])

        def fn(rh, rl, ih, il, f_h, f_l):
            X = DD.fft_dd((rh, rl, ih, il), twiddles)  # bit-reversed order
            X = tuple(jnp.take(c, brv, axis=-1) for c in X)
            # real(X_k * untwist_k) in dd, then * (scale / n)
            t0 = DD.dd_mul(X[0], X[1], untwist[0], untwist[1])
            t1 = DD.dd_mul(X[2], X[3], untwist[2], untwist[3])
            ch, cl = DD.dd_sub(t0[0], t0[1], t1[0], t1[1])
            ch, cl = DD.dd_mul(ch, cl, f_h, f_l)
            words = DD.dd_to_words(ch, cl, W)
            if wide:
                rns = DD.words_to_rns_wide(words, moduli)
            else:
                rns = DD.words_to_rns_fast(words, moduli)
            return R.ntt_forward(rns, qtab)

        cache[key] = jax.jit(fn)
        return cache[key]

    def encode_device(self, values, parms_id: ParmsID | None = None,
                      scale: float = 2.0 ** 40) -> Plaintext:
        """SIMD encode fully on device (double-float FFT — the TPU-native
        analog of the reference's device encoder, src/ckks_encoder.cu:231,
        with the three-tier integer conversion of ckks_encoder.cu:454-692
        generalized to W 24-bit word planes).

        Tiers (C = scale * max|value|, auto-selected):
          * C < 2^46  (W=2): the rounding + RNS stages are exact; only the
            FFT rounds at ~2^-48 relative, so a few coefficients near a .5
            boundary may round differently from `encode` — noise far below
            CKKS encoding noise.
          * C < 2^117 (W<=5): coefficients carry ~48 significant bits; the
            absolute coefficient error is <= C * 2^-47 (the reference's f64
            device encoder likewise carries C * 2^-52), i.e. a relative
            value error ~2^-47 — below the fresh-encryption noise floor for
            every standard parameter set.  The word decomposition and RNS
            reduction remain bit-exact functions of the rounded integers.
        Beyond W=5 (or C >= Q/2, which no valid encode allows) use the host
        big-int `encode`.

        A leading batch axis is supported: values (B, slots) yields a
        Plaintext whose data carries the same leading axis (for
        BatchedEvaluator pipelines)."""
        import math

        cd = self.context.get_context_data(parms_id or self.context.first_parms_id)
        arr = np.atleast_1d(np.asarray(values, dtype=np.complex128))
        vmax = float(np.max(np.abs(arr))) if arr.size else 0.0
        C = scale * max(vmax, 1.0)
        W = 2
        while (1 << (24 * (W - 1) + 21)) <= C:  # 4x headroom under the shift
            W += 1
        if W > 5:
            raise ValueError(
                "[CKKSEncoder.encode_device] scale * max|value| = "
                f"{C:.3g} exceeds the 2^117 device bound; "
                "use encode() (host big-int path)")
        if C * 2 >= math.ldexp(1.0, cd.total_coeff_modulus.bit_length() - 1):
            raise ValueError(
                "[CKKSEncoder.encode_device] scaled values exceed q/2")
        lead = arr.shape[:-1]
        if arr.shape[-1] > self.slots:
            raise ValueError("[CKKSEncoder.encode_device] too many values")
        v = np.zeros(lead + (self.slots,), dtype=np.complex128)
        v[..., : arr.shape[-1]] = arr
        ev = np.zeros(lead + (self.n,), dtype=np.complex128)
        ev[..., self._idx] = v
        ev[..., self._idx_conj] = np.conj(v)
        rh, rl = DD.split_f64(ev.real)
        ih, il = DD.split_f64(ev.imag)
        f_h, f_l = DD.split_f64(np.float64(scale / self.n))
        data = self._encode_device_jit(cd, W)(
            jnp.asarray(rh), jnp.asarray(rl), jnp.asarray(ih),
            jnp.asarray(il), jnp.asarray(f_h), jnp.asarray(f_l))
        return Plaintext(data, parms_id=cd.parms_id, scale=scale,
                         is_ntt_form=True)

    def _decode_device_jit(self, cd: ContextData, ntt_form: bool, K: int):
        """Jitted device decode per (level, form, fixed-point width K):
        INTT -> punctured-inverse multiply -> fixed-point fractional CRT
        (ops/ddfft.frac_crt_fixed) -> * (Q/scale) -> twist -> inverse
        embedding FFT -> slot gather.  Returns the 4 dd component arrays."""
        cache = getattr(cd, "_jit_ops", None)
        if cache is None:
            cache = {}
            cd._jit_ops = cache
        key = ("encoder_device_decode", ntt_form, K)
        if key in cache:
            return cache[key]
        import math

        tabs = self._device_tables()
        qtab = cd.qtab()
        moduli = list(cd.parms.coeff_modulus)
        base = cd.base_q
        wide = cd.wide
        twiddles, brv = tabs["twiddles"], tabs["brv"]
        i = np.arange(self.n)
        tw = tuple(jnp.asarray(c)
                   for c in DD.cdd_tables(np.exp(1j * np.pi * i / self.n)))
        r_word_cols = DD.frac_crt_words(moduli, K)
        idx_slots = jnp.asarray(self._idx)
        if wide:
            from ..ops import u64 as U64
            from ..ops import u32 as U32

            w_hi = jnp.asarray(np.array(
                [w >> 32 for w in base.inv_punctured], dtype=np.uint32))[:, None]
            w_lo = jnp.asarray(np.array(
                [w & 0xFFFFFFFF for w in base.inv_punctured],
                dtype=np.uint32))[:, None]
            ws = [U64.shoup_word64(w, m.value)
                  for w, m in zip(base.inv_punctured, moduli)]
            ws_hi = jnp.asarray(np.array([int(w[1]) for w in ws],
                                         dtype=np.uint32))[:, None]
            ws_lo = jnp.asarray(np.array([int(w[0]) for w in ws],
                                         dtype=np.uint32))[:, None]
            q_hi = jnp.asarray(np.array([m.value >> 32 for m in moduli],
                                        dtype=np.uint32))[:, None]
            q_lo = jnp.asarray(np.array([m.value & 0xFFFFFFFF for m in moduli],
                                        dtype=np.uint32))[:, None]
        else:
            bp = base.pack()

        def fn(data, qs_h, qs_l):
            x = R.ntt_inverse(data, qtab) if ntt_form else data
            if wide:
                from ..ops import u64 as U64

                y = U64.shoup_mul64(x[..., 0, :, :], x[..., 1, :, :],
                                    w_hi, w_lo, ws_hi, ws_lo, q_hi, q_lo)
            else:
                from ..ops import u32 as U32

                y = U32.shoup_mul(x, bp["inv_punctured"][:, None],
                                  bp["inv_punctured_shoup"][:, None],
                                  bp["q"][:, None])
            fh, fl = DD.frac_crt_fixed(y, r_word_cols, K)
            ch, cl = DD.dd_mul(fh, fl, qs_h, qs_l)
            yr = DD.dd_mul(ch, cl, tw[0], tw[1])
            yi = DD.dd_mul(ch, cl, tw[2], tw[3])
            X = DD.fft_dd((yr[0], yr[1], -yi[0], -yi[1]), twiddles)
            X = tuple(jnp.take(c, brv, axis=-1) for c in X)
            return tuple(jnp.take(c, idx_slots, axis=-1)
                         for c in (X[0], X[1], -X[2], -X[3]))

        cache[key] = jax.jit(fn)
        return cache[key]

    def decode_device(self, plain: Plaintext) -> np.ndarray:
        """Decode fully on device — the serving fast path, valid at any
        level/scale state with log2(Q/scale) <= 120 (fresh or rescaled).

        Selection rule: use decode_device whenever the margin fits the
        120-bit envelope (it raises a ValueError otherwise) — i.e. for
        every post-rescale/serving plaintext; use `decode` (host, exact
        big-int CRT via rns_base.compose_centered_f64_host) for fresh
        plaintexts at deep chains or when bit-exact round-half-away
        rounding of the composed integers matters.

        The round-2 implementation summed y_i/q_i in dd floats, whose O(1)
        terms cancel down to the tiny fraction value/Q, leaving ~2^-48
        ABSOLUTE error — hence the old log2(Q/scale) <= 20 gate.  Round 3
        does the cancellation in exact integer fixed point (frac_crt_fixed:
        sum y_i*floor(2^(32K)/q_i) mod 2^(32K)) and only then converts the
        centered fraction to dd, so precision is RELATIVE: output error
        ~ |value| * 2^-47 + (Q/scale) * 2^-(32(K-4)), with K chosen from the
        level's margin.  Use `decode` (host big-int) when bit-exact
        round-half-away rounding matters.

        TPU-native replacement for the reference's device decode
        (src/ckks_encoder.cu:1092 + fft_inverse_...): same pipeline, with
        the CRT compose replaced by the fixed-point fractional-CRT so no
        big-int arithmetic is needed on device."""
        import math

        cd = self.context.get_context_data(plain.parms_id)
        Q = cd.total_coeff_modulus
        margin = max(0.0, Q.bit_length() - math.log2(plain.scale))
        if margin > 120:
            # The dd-f32 stages cannot represent Q/scale (f32 exponent caps
            # at 2^127) nor the centered fraction value/Q below ~2^-126.
            # This is the serving envelope: post-rescale plaintexts always
            # sit far below it; a FRESH never-rescaled plaintext at a deep
            # chain may exceed it — decode() (host path) handles those.
            raise ValueError(
                "[CKKSEncoder.decode_device] log2(Q/scale) = "
                f"{margin:.0f} exceeds the 120-bit device envelope; "
                "use decode() (host path) at this level/scale")
        # truncation term (Q/scale)*2^-(32(K-4)) kept below 2^-40
        K = max(5, 4 + math.ceil((margin + 40) / 32))
        qs_h, qs_l = DD.ratio_dd(Q, plain.scale)
        out = self._decode_device_jit(cd, plain.is_ntt_form, K)(
            plain.data, jnp.asarray(qs_h), jnp.asarray(qs_l))
        comps = [np.asarray(c, dtype=np.float64) for c in out]
        return (comps[0] + comps[1]) + 1j * (comps[2] + comps[3])

    def encode_float64_polynomial(self, coeffs, parms_id: ParmsID | None = None,
                                  scale: float = 2.0 ** 40) -> Plaintext:
        """Encode raw real coefficients (no embedding)
        (ref: ckks_encoder.h encode_float64_polynomial)."""
        cd = self.context.get_context_data(parms_id or self.context.first_parms_id)
        c = np.zeros(self.n)
        arr = np.asarray(coeffs, dtype=np.float64)
        c[: len(arr)] = arr
        rns = self._coeffs_to_rns(_round_ints(c * scale), cd)
        data = _ntt_jit(cd, True)(jnp.asarray(rns))
        return Plaintext(data, parms_id=cd.parms_id, scale=scale, is_ntt_form=True)

    def encode_float64_single(self, value: float, parms_id: ParmsID | None = None,
                              scale: float = 2.0 ** 40) -> Plaintext:
        """A constant: value in every slot = constant coefficient c_0."""
        return self.encode_float64_polynomial([value], parms_id, scale)

    def encode_complex64_single(self, value: complex,
                                parms_id: ParmsID | None = None,
                                scale: float = 2.0 ** 40) -> Plaintext:
        """A complex constant in every slot (ref: ckks_encoder.h
        encode_complex64_single)."""
        return self.encode(np.full(self.slots, value, dtype=np.complex128),
                           parms_id, scale)

    def encode_integer64_single(self, value: int,
                                parms_id: ParmsID | None = None) -> Plaintext:
        """Exact integer constant with scale 1 (ref: ckks_encoder.h
        encode_integer64_single): multiplying by it scales without noise."""
        cd = self.context.get_context_data(parms_id or self.context.first_parms_id)
        ints = [value] + [0] * (self.n - 1)
        rns = self._coeffs_to_rns(np.array(ints, dtype=object), cd)
        data = _ntt_jit(cd, True)(jnp.asarray(rns))
        return Plaintext(data, parms_id=cd.parms_id, scale=1.0, is_ntt_form=True)

    def decode_float64_polynomial(self, plain: Plaintext) -> np.ndarray:
        """Raw coefficient decode (inverse of encode_float64_polynomial)."""
        cd = self.context.get_context_data(plain.parms_id)
        data = plain.data
        if plain.is_ntt_form:
            data = _ntt_jit(cd, False)(data)
        centered = self._compose_centered(data, cd)
        return centered / plain.scale

    # ------------------------------------------------------------------
    def decode(self, plain: Plaintext) -> np.ndarray:
        """(ref: ckks_encoder.cu:1092 decode)"""
        cd = self.context.get_context_data(plain.parms_id)
        data = plain.data
        if plain.is_ntt_form:
            data = _ntt_jit(cd, False)(data)
        centered = self._compose_centered(data, cd)
        coeffs = centered / plain.scale
        ev = np.fft.ifft(coeffs * self._twist) * self.n
        return ev[self._idx]
