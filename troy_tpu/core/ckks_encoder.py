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
        """RNS residues -> centered float64 coefficients (host CRT)."""
        arr = np.asarray(data)
        if cd.wide:
            from ..ops.u64 import unpack64

            arr = unpack64(arr[0], arr[1])
        Q = cd.base_q.prod
        composed = np.array(cd.base_q.compose_array_host(arr), dtype=object)
        return np.where(composed > Q // 2, composed - Q, composed
                        ).astype(np.float64)

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
