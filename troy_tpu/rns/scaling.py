"""BFV plaintext <-> ciphertext scaling.

TPU-native rebuild of reference src/utils/scaling_variant.{h,cu}:
  scale_up     : m in [0,t)  ->  round(m * Q / t) in RNS base q (+ fused add)
  centralize   : m in [0,t)  ->  centered lift [m]_t -> RNS base q
  decentralize : inverse of centralize for small centered values
(the decrypt-side scale_down lives in RNSTool.decrypt_scale_and_round).

round(m*Q/t) is decomposed per limb as
  m * [floor(Q/t)]_{q_i} + fix,   fix = floor((m * (Q mod t) + t/2) / t),
and the 64-bit-by-t floor division is done exactly without hardware division:
the remainder comes from Barrett reduction, and (z - r)/t = (z - r) * t^{-1}
(mod 2^32) since t is odd (t a prime plain modulus; power-of-two plain moduli
are handled by the ring2k encoder instead, ref: src/app/bfv_ring2k).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.modulus import Modulus
from ..utils import numth
from ..ops import u32 as U
from .rns_base import RNSBase


class BFVScaler:
    """Per-level scaling constants (ref: context_data.h coeff_div_plain_modulus,
    plain_upper_half_threshold / increment)."""

    def __init__(self, base_q: RNSBase, t: Modulus):
        self.base_q = base_q
        self.t = t
        tv = t.value
        if tv % 2 == 0:
            raise ValueError("[BFVScaler] plain modulus must be odd (use ring2k for 2^k)")
        Q = base_q.prod
        qv = base_q.values
        delta = Q // tv  # floor(Q/t)
        w = np.array([delta % q for q in qv], dtype=np.uint32)
        ws = np.array([((delta % q) << 32) // q for q in qv], dtype=np.uint64).astype(np.uint32)
        self.coeff_div_plain = jnp.asarray(w)[:, None]
        self.coeff_div_plain_shoup = jnp.asarray(ws)[:, None]
        self.q_mod_t = U.u32(Q % tv)
        self.t_half = U.u32((tv + 1) >> 1)
        self.t_inv_2_32 = U.u32(pow(tv, -1, 1 << 32))
        # centered lift: increment (-t) mod q_i for upper-half plain coeffs
        self.plain_upper_half_increment = jnp.asarray(
            np.array([(-tv) % q for q in qv], dtype=np.uint32)
        )[:, None]

    def _qtabs(self, x):
        p = self.base_q.pack()
        lead = (1,) * (x.ndim - 2)
        return (
            p["q"].reshape(lead + (-1, 1)),
            p["ratio_hi"].reshape(lead + (-1, 1)),
            p["ratio_lo"].reshape(lead + (-1, 1)),
        )

    def scale_up(self, m: jnp.ndarray) -> jnp.ndarray:
        """m: (..., n) in [0, t) -> (..., L, n) = round(m * Q / t) mod q
        (ref: scaling_variant.cu scale_up)."""
        tm = self.t
        tv = U.u32(tm.value)
        # fix = floor((m * (Q mod t) + (t+1)/2 ... t/2) / t), exact via odd-t inverse
        hi, lo = U.mul32_wide(m, self.q_mod_t)
        half = U.u32(tm.value >> 1)
        hi, lo = U.add64(hi, lo, jnp.zeros_like(hi), jnp.broadcast_to(half, lo.shape))
        rem = U.barrett_reduce_u64(hi, lo, tv, U.u32(tm.ratio64_hi), U.u32(tm.ratio64_lo))
        # (z - rem) / t mod 2^32 = (lo - rem) * t^-1 mod 2^32 (low word suffices)
        fix = (lo - rem) * self.t_inv_2_32
        mm = m[..., None, :]
        fixx = fix[..., None, :]
        q, qhi, qlo = self._qtabs(mm)
        # Shoup multiply accepts any u32 x, so m needs no pre-reduction.
        prod = U.shoup_mul(mm, self.coeff_div_plain, self.coeff_div_plain_shoup, q)
        fix_mod = U.barrett_reduce_u32(jnp.broadcast_to(fixx, prod.shape), q, qhi, qlo)
        return U.add_mod(prod, fix_mod, q)

    def centralize(self, m: jnp.ndarray) -> jnp.ndarray:
        """m: (..., n) in [0, t) -> (..., L, n) centered lift [m]_t mod q_i
        (ref: scaling_variant.cu centralize)."""
        mm = m[..., None, :]
        L = self.base_q.size
        mm = jnp.broadcast_to(mm, mm.shape[:-2] + (L, mm.shape[-1]))
        q, qhi, qlo = self._qtabs(mm)
        lifted = jnp.where(
            mm >= self.t_half, mm + self.plain_upper_half_increment, mm
        )
        return U.barrett_reduce_u32(lifted, q, qhi, qlo)

    def decentralize(self, x: jnp.ndarray) -> jnp.ndarray:
        """Inverse of centralize for values with |centered| < min(q)/2:
        (..., L, n) -> (..., n) mod t (ref: scaling_variant.cu decentralize)."""
        tm = self.t
        q0 = self.base_q.values[0]
        x0 = x[..., 0, :]
        t_u = U.u32(tm.value)
        thi, tlo = U.u32(tm.ratio64_hi), U.u32(tm.ratio64_lo)
        pos = U.barrett_reduce_u32(x0, t_u, thi, tlo)
        neg_mag = U.u32(q0) - x0  # magnitude of negative value
        neg = U.neg_mod(U.barrett_reduce_u32(neg_mag, t_u, thi, tlo), t_u)
        return jnp.where(x0 > U.U32(q0 >> 1), neg, pos)


class BFVScaler64:
    """Wide-width (40-61-bit prime) BFV plaintext scaling on (..., 2, L, n)
    pair arrays (ref: scaling_variant.{h,cu} at the reference's native
    64-bit width).  The plain modulus t stays < 2^31 (< every wide prime),
    so mod-t inputs/outputs remain single u32 lanes."""

    def __init__(self, base_q: RNSBase, t: Modulus):
        from ..ops import u64 as W
        from .rns_base import _pair_cols

        self.base_q = base_q
        self.t = t
        tv = t.value
        if tv % 2 == 0:
            raise ValueError("[BFVScaler64] plain modulus must be odd (use ring2k for 2^k)")
        if tv >= min(base_q.values):
            raise ValueError("[BFVScaler64] t must be below every coeff modulus")
        Q = base_q.prod
        qv = base_q.values
        delta = Q // tv
        self.coeff_div_plain = _pair_cols([delta % q for q in qv])
        self.coeff_div_plain_shoup = _pair_cols(
            [((delta % q) << 64) // q for q in qv])
        self.q_mod_t = U.u32(Q % tv)
        self.t_half = U.u32((tv + 1) >> 1)
        self.t_inv_2_32 = U.u32(pow(tv, -1, 1 << 32))
        self.q_cols = _pair_cols(qv)
        ratios = [(1 << 128) // q for q in qv]
        self.q_ratio = tuple(
            jnp.asarray(np.array([(r >> (32 * w)) & 0xFFFFFFFF for r in ratios],
                                 dtype=np.uint32))[:, None]
            for w in (3, 2, 1, 0)
        )
        # centered lift: q_i - t for upper-half plain coefficients
        self.upper_half_increment = _pair_cols([q - tv for q in qv])

    def scale_up(self, m: jnp.ndarray) -> jnp.ndarray:
        """m: (..., n) u32 in [0, t) -> (..., 2, L, n) = round(m*Q/t) mod q."""
        from ..ops import u64 as W
        from ..ops import rp as R

        tm = self.t
        tv = U.u32(tm.value)
        # fix = floor((m*(Q mod t) + t/2) / t), exact via the odd-t inverse
        hi, lo = U.mul32_wide(m, self.q_mod_t)
        half = U.u32(tm.value >> 1)
        hi, lo = U.add64(hi, lo, jnp.zeros_like(hi),
                         jnp.broadcast_to(half, lo.shape))
        rem = U.barrett_reduce_u64(hi, lo, tv, U.u32(tm.ratio64_hi),
                                   U.u32(tm.ratio64_lo))
        fix = (lo - rem) * self.t_inv_2_32  # < t < 2^31
        mm = m[..., None, :]
        fixx = fix[..., None, :]
        qh, ql = self.q_cols
        ph, pl = W.shoup_mul64(jnp.zeros_like(mm), mm,
                               self.coeff_div_plain[0], self.coeff_div_plain[1],
                               self.coeff_div_plain_shoup[0],
                               self.coeff_div_plain_shoup[1], qh, ql)
        oh, ol = W.add_mod64(ph, pl, jnp.zeros_like(fixx),
                             jnp.broadcast_to(fixx, pl.shape), qh, ql)
        return R.pair(oh, ol)

    def centralize(self, m: jnp.ndarray) -> jnp.ndarray:
        """m: (..., n) u32 in [0, t) -> (..., 2, L, n) centered lift."""
        from ..ops import u64 as W
        from ..ops import rp as R

        mm = m[..., None, :]
        L = self.base_q.size
        mm = jnp.broadcast_to(mm, mm.shape[:-2] + (L, mm.shape[-1]))
        # upper half: m - t + q_i (in [0, q_i) since m < t <= q_i)
        ih, il = self.upper_half_increment
        uh, ul = W.add64(jnp.broadcast_to(ih, mm.shape),
                         jnp.broadcast_to(il, mm.shape),
                         jnp.zeros_like(mm), mm)
        upper = mm >= self.t_half
        return R.pair(jnp.where(upper, uh, jnp.zeros_like(mm)),
                      jnp.where(upper, ul, mm))

    def decentralize(self, x: jnp.ndarray) -> jnp.ndarray:
        """(..., 2, L, n) -> (..., n) u32 mod t for small centered values."""
        from ..ops import u64 as W
        from ..ops import rp as R

        tm = self.t
        q0 = self.base_q.values[0]
        h, l = R.hi_lo(x)
        x0h, x0l = h[..., 0, :], l[..., 0, :]
        t_u = U.u32(tm.value)
        thi, tlo = U.u32(tm.ratio64_hi), U.u32(tm.ratio64_lo)
        # mod-t reduction of a 64-bit value via two u32 Barrett steps:
        # x mod t = ((x_hi mod t) * (2^32 mod t) + x_lo) mod t
        two32_mod_t = U.u32((1 << 32) % tm.value)
        def mod_t(ah, al):
            hm = U.barrett_reduce_u32(ah, t_u, thi, tlo)
            hm = U.mul_mod(hm, two32_mod_t, t_u, thi, tlo)
            lm = U.barrett_reduce_u32(al, t_u, thi, tlo)
            return U.add_mod(hm, lm, t_u)
        pos = mod_t(x0h, x0l)
        nh, nl = W.sub64(U.u32(q0 >> 32), U.u32(q0 & 0xFFFFFFFF), x0h, x0l)
        neg = U.neg_mod(mod_t(nh, nl), t_u)
        q0h = (q0 >> 1) + 1  # x0 > q0/2
        big = W.geq64(x0h, x0l, U.u32(q0h >> 32), U.u32(q0h & 0xFFFFFFFF))
        return jnp.where(big, neg, pos)
