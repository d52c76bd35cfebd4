"""Ring2k polynomial encoder: BFV with plain modulus t = 2^k.

TPU-native rebuild of reference src/app/bfv_ring2k.{h,cu} (1207 LoC,
PolynomialEncoderRing2k<T> with per-level PolynomialEncoderRNSHelper).
Messages live in Z_{2^k}; the context's own plain modulus is bypassed — this
encoder carries its own per-level scaling machinery with an auxiliary prime
gamma for the exact {t=2^k, gamma} decrypt rounding:

  scale_up   : m -> round(m * Q / 2^k) in RNS (add-to-c0 / encrypt form);
               the power-of-two t makes the rounding fix a shift
  centralize : centered lift of m mod 2^k (multiply_plain operand form)
  scale_down : BEHZ {t, gamma} rounding of t*phase/Q, masked to k bits

This build supports k <= 31 (u32 messages); u64/u128 message words (k <= 128,
pybind exposes u32/u64 in the reference) decompose into 32-bit planes and are
planned for a follow-up round — see README roadmap.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.context import HeContext, ContextData
from ..core.params import ParmsID
from ..core.plaintext import Plaintext
from ..core.modulus import Modulus
from ..core.decryptor import Decryptor
from ..core.ciphertext import Ciphertext
from ..utils import numth
from ..ops import u32 as U
from ..rns.rns_base import RNSBase, BaseConverter
from ..rns.rns_tool import _aux_primes, _shoup_arr, _col


class _Ring2kLevelHelper:
    """Per-level constants (ref: bfv_ring2k.h:24-78 PolynomialEncoderRNSHelper)."""

    def __init__(self, cd: ContextData, k: int):
        self.k = k
        self.cd = cd
        t = 1 << k
        Q = cd.base_q.prod
        qv = cd.base_q.values
        used = set(qv)
        gamma = _aux_primes(cd.parms.poly_modulus_degree, used, 1, need_ntt=False)[0]
        self.gamma = Modulus(gamma)
        self.t_mask = U.u32(t - 1)
        self.half = U.u32(1 << (k - 1)) if k >= 1 else U.u32(0)
        # scale_up: round(m*Q/t) = m*floor(Q/t) + (m*(Q mod t) + t/2) >> k
        delta = Q >> k
        w, ws = _shoup_arr([delta % q for q in qv], qv)
        self.delta_mod_q, self.delta_mod_q_shoup = _col(w), _col(ws)
        self.q_mod_t = U.u32(Q & (t - 1))
        # centralize: increment [-t]_{q_i} for upper-half messages
        self.neg_t_mod_q = _col(
            np.array([(-t) % q for q in qv], dtype=np.uint32))
        # {t, gamma} decrypt constants
        self.base_t_gamma = RNSBase([Modulus(t), Modulus(gamma)])
        self.conv_q_to_t_gamma = BaseConverter(cd.base_q, self.base_t_gamma)
        w, ws = _shoup_arr([(t * gamma) % q for q in qv], qv)
        self.prod_t_gamma_mod_q, self.prod_t_gamma_mod_q_shoup = _col(w), _col(ws)
        tg = [t, gamma]
        w, ws = _shoup_arr([(-numth.invert_mod(Q % m, m)) % m for m in tg], tg)
        self.neg_inv_q_mod_t_gamma, self.neg_inv_q_mod_t_gamma_shoup = _col(w), _col(ws)
        self.inv_gamma_mod_t = U.u32(numth.invert_mod(gamma % t, t))
        self.gamma_mod_t = U.u32(gamma & (t - 1))
        # materialize packs eagerly (tracer-leak safety)
        cd.base_q.pack()
        self.base_t_gamma.pack()

    def _qtabs(self, x):
        p = self.cd.base_q.pack()
        lead = (1,) * (x.ndim - 2)
        return (p["q"].reshape(lead + (-1, 1)),
                p["ratio_hi"].reshape(lead + (-1, 1)),
                p["ratio_lo"].reshape(lead + (-1, 1)))

    # ------------------------------------------------------------------
    def scale_up(self, m: jnp.ndarray) -> jnp.ndarray:
        """m: (..., n) in [0, 2^k) -> (..., L, n) = round(m*Q/2^k) mod q
        (ref: bfv_ring2k.cu scale_up)."""
        k = self.k
        hi, lo = U.mul32_wide(m, self.q_mod_t)
        hi, lo = U.add64(hi, lo, jnp.zeros_like(hi),
                         jnp.broadcast_to(self.half, lo.shape))
        fix = ((hi << (32 - k)) | (lo >> k)) if k < 32 else hi
        mm = m[..., None, :]
        fixx = fix[..., None, :]
        q, qhi, qlo = self._qtabs(mm)
        prod = U.shoup_mul(mm, self.delta_mod_q, self.delta_mod_q_shoup, q)
        fix_mod = U.barrett_reduce_u32(
            jnp.broadcast_to(fixx, prod.shape), q, qhi, qlo)
        return U.add_mod(prod, fix_mod, q)

    def centralize(self, m: jnp.ndarray) -> jnp.ndarray:
        """Centered lift (ref: bfv_ring2k.cu centralize)."""
        mm = m[..., None, :]
        L = self.cd.base_q.size
        mm = jnp.broadcast_to(mm, mm.shape[:-2] + (L, mm.shape[-1]))
        q, qhi, qlo = self._qtabs(mm)
        lifted = jnp.where(mm >= self.half, mm + self.neg_t_mod_q, mm)
        return U.barrett_reduce_u32(lifted, q, qhi, qlo)

    def scale_down(self, phase: jnp.ndarray) -> jnp.ndarray:
        """(..., L, n) phase -> (..., n) = round(t*phase/Q) mod 2^k
        (ref: bfv_ring2k.cu scale_down; BEHZ {t, gamma} with mask-mod t)."""
        gv = self.gamma.value
        mask = self.t_mask
        q, _, _ = self._qtabs(phase)
        tmp = U.shoup_mul(phase, self.prod_t_gamma_mod_q,
                          self.prod_t_gamma_mod_q_shoup, q)
        s = self.conv_q_to_t_gamma.convert(tmp)
        tg, tghi, tglo = (None, None, None)
        p = self.base_t_gamma.pack()
        lead = (1,) * (s.ndim - 2)
        tg = p["q"].reshape(lead + (-1, 1))
        s = U.shoup_mul(s, self.neg_inv_q_mod_t_gamma,
                        self.neg_inv_q_mod_t_gamma_shoup, tg)
        s_t = s[..., 0, :]
        s_g = s[..., 1, :]
        corrected = jnp.where(
            s_g > U.U32(gv >> 1),
            (s_t + (self.gamma_mod_t - s_g)) & mask,
            (s_t - s_g) & mask,
        )
        return (corrected * self.inv_gamma_mod_t) & mask


class PolynomialEncoderRing2k:
    """ref: bfv_ring2k.h PolynomialEncoderRing2k<T>.

    k <= 31: fully device-resident u32 fast path (_Ring2kLevelHelper).
    32 <= k <= 128: host big-int path (client-side encode/decode only; the
    homomorphic server side is unchanged u32 RNS) — covers the reference's
    u64/u128 template instantiations.
    """

    def __init__(self, context: HeContext, k: int):
        if not 2 <= k <= 128:
            raise ValueError("[PolynomialEncoderRing2k] need 2 <= k <= 128")
        self.context = context
        self.k = k
        self.n = context.first_context_data().parms.poly_modulus_degree
        self._helpers: dict[ParmsID, _Ring2kLevelHelper] = {}

    def helper(self, parms_id: ParmsID | None = None) -> _Ring2kLevelHelper:
        pid = parms_id or self.context.first_parms_id
        if pid not in self._helpers:
            self._helpers[pid] = _Ring2kLevelHelper(
                self.context.get_context_data(pid), self.k)
        return self._helpers[pid]

    def _vec(self, values) -> jnp.ndarray:
        v = np.zeros(self.n, dtype=np.uint32)
        arr = np.asarray(values, dtype=np.uint64) & ((1 << self.k) - 1)
        v[: len(arr)] = arr.astype(np.uint32)
        return jnp.asarray(v)

    def _vec_int(self, values) -> list[int]:
        mask = (1 << self.k) - 1
        out = [0] * self.n
        for i, v in enumerate(values):
            out[i] = int(v) & mask
        return out

    def scale_up(self, values, parms_id: ParmsID | None = None) -> Plaintext:
        if self.k <= 31:
            h = self.helper(parms_id)
            return Plaintext(h.scale_up(self._vec(values)),
                             parms_id=h.cd.parms_id, is_ntt_form=False)
        # host big-int path (ref: bfv_ring2k.cu u64/u128 instantiations)
        pid = parms_id or self.context.first_parms_id
        cd = self.context.get_context_data(pid)
        Q = cd.base_q.prod
        t = 1 << self.k
        if Q >> self.k < (1 << 16):
            raise ValueError(
                f"[PolynomialEncoderRing2k] k={self.k} leaves under 16 bits "
                f"of noise margin at this level (log Q = {Q.bit_length()})")
        scaled = [(m * Q + t // 2) // t for m in self._vec_int(values)]
        return Plaintext(jnp.asarray(cd.base_q.decompose_array_host(scaled)),
                         parms_id=pid, is_ntt_form=False)

    def centralize(self, values, parms_id: ParmsID | None = None) -> Plaintext:
        if self.k <= 31:
            h = self.helper(parms_id)
            return Plaintext(h.centralize(self._vec(values)),
                             parms_id=h.cd.parms_id, is_ntt_form=False)
        pid = parms_id or self.context.first_parms_id
        cd = self.context.get_context_data(pid)
        t = 1 << self.k
        centered = [m - t if m >= t // 2 else m for m in self._vec_int(values)]
        arr = np.empty((cd.base_q.size, self.n), dtype=np.uint32)
        for i, q in enumerate(cd.base_q.values):
            arr[i] = np.array([c % q for c in centered], dtype=np.uint32)
        return Plaintext(jnp.asarray(arr), parms_id=pid, is_ntt_form=False)

    def scale_down(self, phase: Plaintext) -> np.ndarray:
        if self.k <= 31:
            h = self.helper(phase.parms_id)
            return np.asarray(h.scale_down(phase.data)).astype(np.uint64)
        cd = self.context.get_context_data(phase.parms_id)
        Q = cd.base_q.prod
        t = 1 << self.k
        composed = cd.base_q.compose_array_host(np.asarray(phase.data))
        out = [((v * t + Q // 2) // Q) % t for v in composed]
        if self.k <= 64:
            return np.array(out, dtype=np.uint64)
        return np.array(out, dtype=object)

    def decrypt_scale_down(self, decryptor: Decryptor, ct: Ciphertext) -> np.ndarray:
        return self.scale_down(decryptor.bfv_decrypt_without_scaling_down(ct))
