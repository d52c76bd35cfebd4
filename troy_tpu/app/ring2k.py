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

k <= 31 messages ride the u32 fast path directly; 31 < k <= 128 (the
reference's u64/u128 template instantiations, pybind exposes u32/u64)
decompose into 16-bit limb planes and run the same scale_up / centralize /
scale_down pipeline fully on device (ops/limb.py multiword arithmetic).
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
from ..ops import limb as LB
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
        # decentralize: CRT terms mod 2^32 (wrapping u32 products then a
        # k-bit mask give the exact value mod 2^k)
        self.punc_mod_2_32 = [U.u32(p & 0xFFFFFFFF)
                              for p in cd.base_q.punctured]
        self.q_mod_2_32 = U.u32(Q & 0xFFFFFFFF)
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

    def decentralize(self, x: jnp.ndarray) -> jnp.ndarray:
        """Inverse of centralize: (..., L, n) centered-lift residues ->
        (..., n) value mod 2^k (ref: bfv_ring2k.cu decentralize<T>).
        Exact CRT recomposition mod 2^32 with the 96-bit fixed-point alpha
        (exact because |centered| < 2^(k-1) << Q/2)."""
        q, _, _ = self._qtabs(x)
        ip = self.cd.base_q.pack()
        lead = (1,) * (x.ndim - 2)
        v = U.shoup_mul(x, ip["inv_punctured"].reshape(lead + (-1, 1)),
                        ip["inv_punctured_shoup"].reshape(lead + (-1, 1)), q)
        alpha = self.cd.rns_tool._exact_alpha(v)
        s = None
        for i in range(self.cd.base_q.size):
            term = v[..., i, :] * self.punc_mod_2_32[i]  # wraps mod 2^32
            s = term if s is None else s + term
        return (s - alpha * self.q_mod_2_32) & self.t_mask

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


class _Ring2kWideLevelHelper:
    """Per-level constants and device kernels for 31 < k <= 128
    (ref: bfv_ring2k.cu u64/u128 template instantiations; here a k-bit word
    is W = ceil(k/16) 16-bit limb planes, ops/limb.py)."""

    def __init__(self, cd: ContextData, k: int):
        self.k = k
        self.cd = cd
        self.W = LB.width(k)
        t = 1 << k
        Q = cd.base_q.prod
        qv = cd.base_q.values
        if Q >> k < (1 << 16):
            raise ValueError(
                f"[PolynomialEncoderRing2k] k={k} leaves under 16 bits of "
                f"noise margin at this level (log Q = {Q.bit_length()})")
        used = set(qv)
        gamma = _aux_primes(cd.parms.poly_modulus_degree, used, 1,
                            need_ntt=False)[0]
        self.gamma = Modulus(gamma)
        # scale_up: round(m*Q/t) = m*(Q>>k) + (m*(Q mod t) + t/2) >> k
        delta = Q >> k
        w, ws = _shoup_arr([delta % q for q in qv], qv)
        self.delta_mod_q, self.delta_mod_q_shoup = _col(w), _col(ws)
        self.r_limbs = LB.const_limbs(Q & (t - 1), self.W)
        # 2^(16w) mod q_i columns for folding limbs into RNS residues
        self.pow16 = [
            _col(np.array([pow(2, 16 * i, q) for q in qv], dtype=np.uint32))
            for i in range(self.W)
        ]
        self.neg_t_mod_q = _col(
            np.array([(-t) % q for q in qv], dtype=np.uint32))
        # {t, gamma} decrypt constants (t side in limbs, gamma side u32)
        w, ws = _shoup_arr([(t * gamma) % q for q in qv], qv)
        self.prod_t_gamma_mod_q, self.prod_t_gamma_mod_q_shoup = _col(w), _col(ws)
        self.mat_gamma = [p % gamma for p in cd.base_q.punctured]
        self.mat_t = [LB.const_limbs(p & (t - 1), self.W)
                      for p in cd.base_q.punctured]
        nig = (-numth.invert_mod(Q % gamma, gamma)) % gamma
        self.neg_inv_q_mod_gamma = U.u32(nig)
        self.neg_inv_q_mod_gamma_shoup = U.u32((nig << 32) // gamma)
        self.neg_inv_q_mod_t = LB.const_limbs(
            (-numth.invert_mod(Q % t, t)) % t, self.W)
        self.gamma_limbs = LB.const_limbs(gamma, self.W)
        self.inv_gamma_mod_t = LB.const_limbs(
            numth.invert_mod(gamma, t), self.W)
        self.half_gamma = U.u32(gamma >> 1)
        cd.base_q.pack()

    _qtabs = _Ring2kLevelHelper._qtabs

    # ------------------------------------------------------------------
    def scale_up(self, m: jnp.ndarray) -> jnp.ndarray:
        """m: (..., W, n) limbs in [0, 2^k) -> (..., L, n) round(m*Q/2^k)
        mod q (ref: bfv_ring2k.cu scale_up<T>)."""
        q, qhi, qlo = self._qtabs(m)
        m_mod = LB.fold_mod_q(m, self.pow16, q, qhi, qlo)
        prod = U.shoup_mul(m_mod, self.delta_mod_q, self.delta_mod_q_shoup, q)
        full = LB.mul_const_full(m, self.r_limbs)
        fix = LB.shift_right(LB.add_bit(full, self.k - 1), self.k)
        fix_mod = LB.fold_mod_q(fix[..., : self.W, :], self.pow16, q, qhi, qlo)
        return U.add_mod(prod, fix_mod, q)

    def centralize(self, m: jnp.ndarray) -> jnp.ndarray:
        """Centered lift of (..., W, n) limbs (ref: centralize<T>)."""
        q, qhi, qlo = self._qtabs(m)
        m_mod = LB.fold_mod_q(m, self.pow16, q, qhi, qlo)
        is_upper = LB.get_bit(m, self.k - 1)[..., None, :] != 0
        return jnp.where(is_upper, U.add_mod(m_mod, self.neg_t_mod_q, q), m_mod)

    def decentralize(self, x: jnp.ndarray) -> jnp.ndarray:
        """Inverse of centralize: (..., L, n) centered-lift residues ->
        (..., W, n) k-bit limbs (ref: bfv_ring2k.cu decentralize<T> u64/u128
        instantiations).  Exact CRT in limb-plane arithmetic with the
        96-bit fixed-point alpha."""
        k = self.k
        q, _, _ = self._qtabs(x)
        ip = self.cd.base_q.pack()
        lead = (1,) * (x.ndim - 2)
        v = U.shoup_mul(x, ip["inv_punctured"].reshape(lead + (-1, 1)),
                        ip["inv_punctured_shoup"].reshape(lead + (-1, 1)), q)
        alpha = self.cd.rns_tool._exact_alpha(v)
        L = self.cd.base_q.size
        s = LB.dot_const_low([v[..., i, :] for i in range(L)],
                             self.mat_t, k)
        corr = LB.mul_const_low(LB.u32_split(alpha), self.r_limbs, k)
        return LB.sub_low(s, corr, k)

    def scale_down(self, phase: jnp.ndarray) -> jnp.ndarray:
        """(..., L, n) phase -> (..., W, n) limbs of round(2^k*phase/Q) mod
        2^k (ref: scale_down<T>; BEHZ {t, gamma} with t = 2^k so mod-t
        arithmetic is limb masking)."""
        k = self.k
        q, _, _ = self._qtabs(phase)
        tmp = U.shoup_mul(phase, self.prod_t_gamma_mod_q,
                          self.prod_t_gamma_mod_q_shoup, q)
        ip = self.cd.base_q.pack()
        lead = (1,) * (phase.ndim - 2)
        v = U.shoup_mul(tmp, ip["inv_punctured"].reshape(lead + (-1, 1)),
                        ip["inv_punctured_shoup"].reshape(lead + (-1, 1)), q)
        L = self.cd.base_q.size
        # gamma residue: plain u32 dot mod the aux prime
        g = U.u32(self.gamma.value)
        pairs = [(v[..., i : i + 1, :], U.u32(self.mat_gamma[i]))
                 for i in range(L)]
        s_g = U.dot_mod(pairs, g, U.u32(self.gamma.ratio64_hi),
                        U.u32(self.gamma.ratio64_lo))[..., 0, :]
        s_g = U.shoup_mul(s_g, self.neg_inv_q_mod_gamma,
                          self.neg_inv_q_mod_gamma_shoup, g)
        # t residue: limb dot mod 2^k
        s_t = LB.dot_const_low([v[..., i, :] for i in range(L)],
                               self.mat_t, k)
        s_t = LB.mul_const_low(s_t, self.neg_inv_q_mod_t, k)
        # correct the gamma share and divide by gamma mod 2^k
        sg_limbs = LB.u32_split(s_g)
        upper = LB.sub_low(LB.add_const_low(s_t, self.gamma_limbs, k),
                           sg_limbs, k)
        lower = LB.sub_low(s_t, sg_limbs, k)
        res = jnp.where((s_g > self.half_gamma)[..., None, :], upper, lower)
        return LB.mul_const_low(res, self.inv_gamma_mod_t, k)


class PolynomialEncoderRing2k:
    """ref: bfv_ring2k.h PolynomialEncoderRing2k<T>.

    k <= 31: u32 fast path (_Ring2kLevelHelper).
    31 < k <= 128: 16-bit limb-plane device path (_Ring2kWideLevelHelper) —
    covers the reference's u64/u128 template instantiations; a host big-int
    oracle (`*_host` methods) backs the parity tests.
    """

    def __init__(self, context: HeContext, k: int):
        if not 2 <= k <= 128:
            raise ValueError("[PolynomialEncoderRing2k] need 2 <= k <= 128")
        self.context = context
        self.k = k
        self.n = context.first_context_data().parms.poly_modulus_degree
        self._helpers: dict[ParmsID, _Ring2kLevelHelper] = {}

    def helper(self, parms_id: ParmsID | None = None):
        pid = parms_id or self.context.first_parms_id
        if pid not in self._helpers:
            cls = _Ring2kLevelHelper if self.k <= 31 else _Ring2kWideLevelHelper
            self._helpers[pid] = cls(self.context.get_context_data(pid), self.k)
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

    def _vec_limbs(self, values) -> jnp.ndarray:
        """Pad/mask message ints to n and split into (W, n) 16-bit limbs."""
        return jnp.asarray(LB.from_ints(self._vec_int(values), self.k))

    def scale_up(self, values, parms_id: ParmsID | None = None) -> Plaintext:
        h = self.helper(parms_id)
        m = self._vec(values) if self.k <= 31 else self._vec_limbs(values)
        return Plaintext(h.scale_up(m), parms_id=h.cd.parms_id,
                         is_ntt_form=False)

    def centralize(self, values, parms_id: ParmsID | None = None) -> Plaintext:
        h = self.helper(parms_id)
        m = self._vec(values) if self.k <= 31 else self._vec_limbs(values)
        return Plaintext(h.centralize(m), parms_id=h.cd.parms_id,
                         is_ntt_form=False)

    def scale_down(self, phase: Plaintext) -> np.ndarray:
        h = self.helper(phase.parms_id)
        if self.k <= 31:
            return np.asarray(h.scale_down(phase.data)).astype(np.uint64)
        return LB.to_ints(np.asarray(h.scale_down(phase.data)), self.k)

    def decentralize(self, pt: Plaintext) -> np.ndarray:
        """Inverse of centralize: recover values mod 2^k from a
        centered-lift RNS plaintext (ref: bfv_ring2k.h:223
        decentralize_slice)."""
        h = self.helper(pt.parms_id)
        if self.k <= 31:
            return np.asarray(h.decentralize(pt.data)).astype(np.uint64)
        return LB.to_ints(np.asarray(h.decentralize(pt.data)), self.k)

    # -- host big-int oracle (parity tests; matches the device path bit
    #    for bit — ref semantics: bfv_ring2k.cu scale_up/scale_down) --------
    def scale_up_host(self, values, parms_id: ParmsID | None = None) -> Plaintext:
        pid = parms_id or self.context.first_parms_id
        cd = self.context.get_context_data(pid)
        Q = cd.base_q.prod
        t = 1 << self.k
        scaled = [(m * Q + t // 2) // t for m in self._vec_int(values)]
        return Plaintext(jnp.asarray(cd.base_q.decompose_array_host(scaled)),
                         parms_id=pid, is_ntt_form=False)

    def scale_down_host(self, phase: Plaintext) -> np.ndarray:
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
