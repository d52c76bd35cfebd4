"""Per-level BEHZ/SEAL RNS toolbox at WIDE (40-61-bit prime) width.

The wide-width counterpart of rns/rns_tool.py, rebuilding reference
src/utils/rns_tool.{h,cu} at the reference's NATIVE prime width
(rns_tool.cu:1834 runs BEHZ on <=61-bit primes; basics.h:579 is the 64x64->128
multiply every step leans on).  All residues are (hi, lo) u32 pairs in the
(..., 2, L, n) wide layout (ops/rp.py); 128-bit intermediates use the
four-word accumulation primitives of ops/u64.py.

Implements over wide arrays:
  * BFV multiply machinery (BEHZ16): lift q -> Bsk (+ m_tilde Montgomery
    small-reduction), floor-division by q, Shenoy-Kumaresan back-conversion,
  * divide_and_round_q_last (+ NTT variant): CKKS rescale & modswitch,
  * BGV mod_t_and_divide_q_last_ntt,
  * BFV decrypt_scale_and_round via {t, gamma} (integer-exact),
  * BGV decrypt_mod_t via exact conversion with 96-bit fixed-point alpha.

Design notes:
  - aux primes B, m_sk, gamma are ~59-bit (fewer limbs than the u32 path's
    30-bit aux primes for the same BEHZ bound),
  - m_tilde stays 2^16 (the BEHZ bound needs only m_tilde > 2*|base q|),
  - plain modulus t stays < 2^31 (PlainModulus.batching cap); all mod-t
    outputs therefore fit the lo word.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.modulus import Modulus
from ..utils import numth
from ..ops import u32 as U
from ..ops import u64 as W
from ..ops import rp as R
from ..ops.ntt64 import NTT64Tables
from .rns_base import RNSBase, BaseConverter64, _pair_cols

M_TILDE = 1 << 16
_M32 = (1 << 32) - 1


def _aux_primes_wide(n: int, exclude: set[int], count: int,
                     need_ntt: bool = True, bits: int = 59) -> list[int]:
    """~59-bit primes (≡ 1 mod 2n if need_ntt) distinct from `exclude`."""
    out: list[int] = []
    factor = 2 * n if need_ntt else 2
    value = ((1 << bits) - 1) // factor * factor + 1
    floor = 1 << (bits - 1)
    while len(out) < count and value > floor:
        if value not in exclude and numth.is_prime(value):
            out.append(value)
            exclude.add(value)
        value -= factor
    if len(out) < count:
        raise ValueError("[RNSTool64] not enough auxiliary primes")
    return out


def _shoup_pair_cols(values: list[int], moduli: list[int]):
    """((2-tuple of (L,1) word cols) value, same for floor(v*2^64/q))."""
    w = _pair_cols(values)
    ws = _pair_cols([(v << 64) // q for v, q in zip(values, moduli)])
    return w, ws


def _ratio_cols(values: list[int]):
    """floor(2^128/q) as four (L,1) u32 word columns (r3, r2, r1, r0)."""
    ratios = [(1 << 128) // q for q in values]
    return tuple(
        jnp.asarray(np.array([(r >> (32 * w)) & _M32 for r in ratios],
                             dtype=np.uint32))[:, None]
        for w in (3, 2, 1, 0)
    )


class RNSTool64:
    """Wide-width BEHZ toolbox for one modulus-chain level
    (ref: rns_tool.h:11-151)."""

    def __init__(self, log_n: int, base_q: RNSBase, t: Modulus | None):
        self.log_n = log_n
        self.n = n = 1 << log_n
        self.base_q = base_q
        self.t = t
        L = base_q.size
        q_values = base_q.values
        Q = base_q.prod
        used = set(q_values)
        if t is not None and not t.is_zero:
            used.add(t.value)

        self.q_cols = _pair_cols(q_values)
        self.q_ratio = _ratio_cols(q_values)

        # ---- aux base sizing (BEHZ §4; ref: rns_tool.cu constructor) ------
        t_val = t.value if (t is not None and not t.is_zero) else 1
        bound = 16 * n * max(t_val, 4) * Q * (L + 3)
        b_primes: list[int] = []
        prod_b = 1
        pool = _aux_primes_wide(n, used, L + 2)
        i = 0
        while prod_b <= bound:
            if i >= len(pool):
                pool += _aux_primes_wide(n, used, 2)
            prod_b *= pool[i]
            b_primes.append(pool[i])
            i += 1
        m_sk = pool[i] if i < len(pool) else _aux_primes_wide(n, used, 1)[0]
        self.base_B = RNSBase([Modulus(p) for p in b_primes])
        self.base_Bsk = RNSBase([Modulus(p) for p in b_primes + [m_sk]])
        self.m_sk = m_sk
        self.base_Bsk_m_tilde = RNSBase(
            [Modulus(p) for p in b_primes + [m_sk, M_TILDE]]
        )

        self.conv_q_to_Bsk_m_tilde = BaseConverter64(base_q, self.base_Bsk_m_tilde)
        self.conv_q_to_Bsk = BaseConverter64(base_q, self.base_Bsk)
        self.conv_B_to_q = BaseConverter64(self.base_B, base_q)
        self.conv_B_to_m_sk = BaseConverter64(self.base_B, RNSBase([Modulus(m_sk)]))

        self.bsk_ntt = NTT64Tables(log_n, self.base_Bsk.values)

        bsk_vals = self.base_Bsk.values
        B_prod = self.base_B.prod
        self.bsk_cols = _pair_cols(bsk_vals)
        self.bsk_ratio = _ratio_cols(bsk_vals)

        # ---- sm_mrq constants (ref: rns_tool.cu sm_mrq) -------------------
        self.neg_inv_prod_q_mod_m_tilde = U.U32(
            (-numth.invert_mod(Q % M_TILDE, M_TILDE)) % M_TILDE
        )
        self.prod_q_mod_Bsk = _pair_cols([Q % b for b in bsk_vals])
        self.prod_q_m_tilde_mod_Bsk = _pair_cols(
            [(Q * M_TILDE) % b for b in bsk_vals])
        self.inv_m_tilde_mod_Bsk, self.inv_m_tilde_mod_Bsk_shoup = \
            _shoup_pair_cols(
                [numth.invert_mod(M_TILDE % b, b) for b in bsk_vals], bsk_vals)

        # ---- fast_floor constants -----------------------------------------
        self.inv_prod_q_mod_Bsk, self.inv_prod_q_mod_Bsk_shoup = \
            _shoup_pair_cols(
                [numth.invert_mod(Q % b, b) for b in bsk_vals], bsk_vals)

        # ---- fastbconv_sk constants ---------------------------------------
        ibm = numth.invert_mod(B_prod % m_sk, m_sk)
        self.inv_prod_B_mod_m_sk = _pair_cols([ibm])
        self.inv_prod_B_mod_m_sk_shoup = _pair_cols([(ibm << 64) // m_sk])
        self.m_sk_cols = _pair_cols([m_sk])
        self.prod_B_mod_q = _pair_cols([B_prod % q for q in q_values])
        self.prod_B_m_sk_mod_q = _pair_cols(
            [(B_prod * m_sk) % q for q in q_values])

        # ---- HPS-style lift constants (fast_b_conv_hps) -------------------
        self.hps_neg_q_mod_Bsk = _pair_cols([(b - Q % b) % b for b in bsk_vals])
        self.hps_inv_q_hi_f32 = jnp.asarray(np.array(
            [float(1 << 32) / q for q in q_values], dtype=np.float32))[:, None]
        self.hps_inv_q_lo_f32 = jnp.asarray(np.array(
            [1.0 / q for q in q_values], dtype=np.float32))[:, None]

        # ---- t-folded fast_floor constants (see rns_tool.py
        # fast_floor_scale_fast_b_conv_sk — same fold at pair width) --------
        if t is not None and not t.is_zero:
            tv = t.value
            self.ff_inv_punc_t, self.ff_inv_punc_t_shoup = _shoup_pair_cols(
                [(tv * ip) % q for ip, q in
                 zip(base_q.inv_punctured, q_values)], q_values)
            self.ff_t_qinv_mod_Bsk, self.ff_t_qinv_mod_Bsk_shoup = \
                _shoup_pair_cols(
                    [(tv * numth.invert_mod(Q % b, b)) % b for b in bsk_vals],
                    bsk_vals)
            self.ff_mat_qinv = [
                _pair_cols([(punc % b) * numth.invert_mod(Q % b, b) % b
                            for b in bsk_vals])
                for punc in base_q.punctured
            ]

        # ---- q_last division (modswitch / rescale) ------------------------
        if L > 1:
            q_last = q_values[-1]
            rest = q_values[:-1]
            self.q_last_cols = _pair_cols([q_last])
            self.q_last_half_cols = _pair_cols([q_last >> 1])
            self.inv_q_last_mod_q, self.inv_q_last_mod_q_shoup = \
                _shoup_pair_cols(
                    [numth.invert_mod(q_last % q, q) for q in rest], rest)
            self.q_last_half_mod_q = _pair_cols(
                [(q_last >> 1) % q for q in rest])
            self.q_last_mod_q = _pair_cols([q_last % q for q in rest])
            self.rest_cols = _pair_cols(rest)
            self.rest_ratio = _ratio_cols(rest)

        # ---- {t, gamma} decrypt (BFV) + BGV t constants -------------------
        if t is not None and not t.is_zero:
            tv = t.value
            gamma = _aux_primes_wide(n, used, 1, need_ntt=False)[0]
            while numth.gcd(gamma, tv) != 1:
                gamma = _aux_primes_wide(n, used, 1, need_ntt=False)[0]
            self.gamma = gamma
            self.base_t_gamma = RNSBase([Modulus(tv), Modulus(gamma)])
            self.conv_q_to_t_gamma = BaseConverter64(base_q, self.base_t_gamma)
            tg_vals = [tv, gamma]
            self.tg_cols = _pair_cols(tg_vals)
            self.prod_t_gamma_mod_q, self.prod_t_gamma_mod_q_shoup = \
                _shoup_pair_cols([(tv * gamma) % q for q in q_values], q_values)
            self.neg_inv_q_mod_t_gamma, self.neg_inv_q_mod_t_gamma_shoup = \
                _shoup_pair_cols(
                    [(-numth.invert_mod(Q % m, m)) % m for m in tg_vals], tg_vals)
            ig = numth.invert_mod(gamma % tv, tv)
            self.inv_gamma_mod_t = U.U32(ig)
            self.inv_gamma_mod_t_shoup = U.U32((ig << 32) // tv)
            self.gamma_half = gamma >> 1
            self.gamma_mod_t = U.U32(gamma % tv)
            # exact conversion q -> t (BGV decrypt)
            self.punc_mod_t = jnp.asarray(
                np.array([p % tv for p in base_q.punctured], dtype=np.uint32)
            )[:, None]
            self.q_mod_t = U.U32(Q % tv)
            # 128-bit fixed-point reciprocals floor(2^128/q_i): FOUR u32
            # words per limb, least-significant first.  Per-term error
            # v_i * (2^128/q - floor) / 2^128 < 2^-64 — strictly tighter
            # than the reference's f64 accumulation (~2^-52, rns_base.cu
            # exact_convey_array)
            r128 = [(1 << 128) // q for q in q_values]
            self.r128_words = tuple(
                jnp.asarray(np.array([(r >> (32 * w)) & _M32 for r in r128],
                                     dtype=np.uint32))[:, None]
                for w in range(4)
            )
            self.base_q_pack = None  # inv_punctured pairs, built in materialize
            self.inv_punctured, self.inv_punctured_shoup = _shoup_pair_cols(
                base_q.inv_punctured, q_values)
            if L > 1:
                q_last = q_values[-1]
                self.inv_q_last_mod_t = U.U32(numth.invert_mod(q_last % tv, tv))
                self.q_last_mod_t = U.U32(q_last % tv)
                self.inv_t_mod_q_last = _pair_cols(
                    [numth.invert_mod(tv % q_last, q_last)])
                self.q_last_ratio = _ratio_cols([q_last])

    # ------------------------------------------------------------------
    def materialize(self):
        """All device tables are built eagerly in __init__; this keeps the
        RNSTool API (tracer-safety contract) uniform across widths."""
        self.bsk_ntt.pack()
        return self

    # ------------------------------------------------------------------
    # BFV multiply: BEHZ steps 1-2 (ref: rns_tool.cu fast_b_conv_m_tilde_sm_mrq)
    # ------------------------------------------------------------------
    def fast_b_conv_m_tilde_sm_mrq(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (..., 2, L, n) in base q -> (..., 2, |Bsk|, n)."""
        h, l = R.hi_lo(x)
        # step 1: scale by m_tilde and convert to Bsk ∪ {m_tilde}
        sh, sl = W.mul_mod64(h, l, U.U32(0), U.U32(M_TILDE),
                             *self.q_cols, *self.q_ratio)
        conv = self.conv_q_to_Bsk_m_tilde.convert(R.pair(sh, sl))
        x_bsk = conv[..., :-1, :]
        x_mt = conv[..., 1, -1:, :] & U.U32(M_TILDE - 1)  # lo word mod 2^16
        # step 2 (sm_mrq): r = [-x * Q^-1]_{m_tilde}
        r = (x_mt * self.neg_inv_prod_q_mod_m_tilde) & U.U32(M_TILDE - 1)
        bh, bl = self.bsk_cols
        xh, xl = R.hi_lo(x_bsk)
        th, tl = W.mul_mod64(self.prod_q_mod_Bsk[0], self.prod_q_mod_Bsk[1],
                             jnp.zeros_like(r), r, bh, bl, *self.bsk_ratio)
        yh, yl = W.add_mod64(xh, xl, th, tl, bh, bl)
        # centering: r >= m_tilde/2 means the true correction is r - m_tilde
        ch, cl = W.sub_mod64(yh, yl, self.prod_q_m_tilde_mod_Bsk[0],
                             self.prod_q_m_tilde_mod_Bsk[1], bh, bl)
        big = r >= U.U32(M_TILDE // 2)
        yh = jnp.where(big, ch, yh)
        yl = jnp.where(big, cl, yl)
        return R.pair(*W.shoup_mul64(
            yh, yl, self.inv_m_tilde_mod_Bsk[0], self.inv_m_tilde_mod_Bsk[1],
            self.inv_m_tilde_mod_Bsk_shoup[0], self.inv_m_tilde_mod_Bsk_shoup[1],
            bh, bl))

    # ------------------------------------------------------------------
    # BFV multiply, HPS-style lift (fills the role of BEHZ steps 1-2;
    # see rns_tool.py fast_b_conv_hps — same scheme at pair width)
    # ------------------------------------------------------------------
    def fast_b_conv_hps(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (..., 2, L, n) in base q -> (..., 2, |Bsk|, n) representing
        x + d*q, d in {-1, 0, +1}: plain fast conversion with the overflow
        count alpha estimated in f32 from the (hi, lo) words and folded into
        the 128-bit accumulation dot as one extra term (HPS17 §4)."""
        conv = self.conv_q_to_Bsk
        h, l = R.hi_lo(x)
        th, tl = W.shoup_mul64(
            h, l, conv.inv_punc[0], conv.inv_punc[1],
            conv.inv_punc_shoup[0], conv.inv_punc_shoup[1],
            conv.iq[0], conv.iq[1])
        lead = (1,) * (th.ndim - 2)
        est = jnp.sum(
            th.astype(jnp.float32) * self.hps_inv_q_hi_f32.reshape(lead + (-1, 1))
            + tl.astype(jnp.float32) * self.hps_inv_q_lo_f32.reshape(lead + (-1, 1)),
            axis=-2, keepdims=True)
        alpha = jnp.round(est).astype(jnp.uint32)
        pairs = [
            ((th[..., i : i + 1, :], tl[..., i : i + 1, :]), conv.mat[i])
            for i in range(self.base_q.size)
        ] + [((jnp.zeros_like(alpha), alpha), self.hps_neg_q_mod_Bsk)]
        acc = W.dot_mod64(pairs, conv.oq[0], conv.oq[1], *conv.oratio,
                          conv.max_terms)
        return R.pair(*acc)

    # ------------------------------------------------------------------
    # BFV multiply: BEHZ steps 6-8 (ref: rns_tool.cu fast_floor_fast_b_conv_sk)
    # ------------------------------------------------------------------
    def fast_floor_fast_b_conv_sk(self, w_q: jnp.ndarray, w_bsk: jnp.ndarray) -> jnp.ndarray:
        bh, bl = self.bsk_cols
        conv = self.conv_q_to_Bsk.convert(w_q)
        yh, yl = W.sub_mod64(*R.hi_lo(w_bsk), *R.hi_lo(conv), bh, bl)
        yh, yl = W.shoup_mul64(
            yh, yl, self.inv_prod_q_mod_Bsk[0], self.inv_prod_q_mod_Bsk[1],
            self.inv_prod_q_mod_Bsk_shoup[0], self.inv_prod_q_mod_Bsk_shoup[1],
            bh, bl)
        return self._b_conv_sk(R.pair(yh, yl))

    def fast_floor_scale_fast_b_conv_sk(self, d_q: jnp.ndarray,
                                        d_bsk: jnp.ndarray) -> jnp.ndarray:
        """Fused BEHZ steps 5b-8 with the ×t scale folded into constants —
        pair-width twin of rns_tool.py fast_floor_scale_fast_b_conv_sk
        (bit-identical outputs; saves the full multiply_scalar pair pass
        over both bases)."""
        bh, bl = self.bsk_cols
        h, l = R.hi_lo(d_q)
        qh, ql = self.q_cols
        yh, yl = W.shoup_mul64(
            h, l, self.ff_inv_punc_t[0], self.ff_inv_punc_t[1],
            self.ff_inv_punc_t_shoup[0], self.ff_inv_punc_t_shoup[1], qh, ql)
        pairs = [
            ((yh[..., i : i + 1, :], yl[..., i : i + 1, :]), self.ff_mat_qinv[i])
            for i in range(self.base_q.size)
        ]
        xdh, xdl = W.dot_mod64(pairs, bh, bl, *self.bsk_ratio,
                               self.conv_q_to_Bsk.max_terms)
        wh, wl = W.shoup_mul64(
            *R.hi_lo(d_bsk), self.ff_t_qinv_mod_Bsk[0], self.ff_t_qinv_mod_Bsk[1],
            self.ff_t_qinv_mod_Bsk_shoup[0], self.ff_t_qinv_mod_Bsk_shoup[1],
            bh, bl)
        return self._b_conv_sk(R.pair(*W.sub_mod64(wh, wl, xdh, xdl, bh, bl)))

    def _b_conv_sk(self, y: jnp.ndarray) -> jnp.ndarray:
        """fastbconv_sk: Shenoy-Kumaresan exact conversion Bsk -> q
        (ref: rns_tool.cu fast_b_conv_sk)."""
        yh, yl = R.hi_lo(y)
        y_B = y[..., :-1, :]
        y_msk_h = yh[..., -1:, :]
        y_msk_l = yl[..., -1:, :]
        u = self.conv_B_to_q.convert(y_B)
        c_msk = self.conv_B_to_m_sk.convert(y_B)
        mh, ml = self.m_sk_cols
        ah, al = W.sub_mod64(*R.hi_lo(c_msk), y_msk_h, y_msk_l, mh, ml)
        ah, al = W.shoup_mul64(
            ah, al, self.inv_prod_B_mod_m_sk[0], self.inv_prod_B_mod_m_sk[1],
            self.inv_prod_B_mod_m_sk_shoup[0], self.inv_prod_B_mod_m_sk_shoup[1],
            mh, ml)
        qh, ql = self.q_cols
        th, tl = W.mul_mod64(self.prod_B_mod_q[0], self.prod_B_mod_q[1],
                             ah, al, qh, ql, *self.q_ratio)
        uh, ul = R.hi_lo(u)
        rh, rl = W.sub_mod64(uh, ul, th, tl, qh, ql)
        # alpha centered: alpha >= m_sk/2 means the true alpha is alpha - m_sk
        ch, cl = W.add_mod64(rh, rl, self.prod_B_m_sk_mod_q[0],
                             self.prod_B_m_sk_mod_q[1], qh, ql)
        msk_half_hi = U.U32(self.m_sk >> 33)
        msk_half_lo = U.U32((self.m_sk >> 1) & _M32)
        big = W.geq64(ah, al, msk_half_hi, msk_half_lo)
        return R.pair(jnp.where(big, ch, rh), jnp.where(big, cl, rl))

    # ------------------------------------------------------------------
    # modswitch / rescale (ref: rns_tool.cu divide_and_round_q_last:421)
    # ------------------------------------------------------------------
    def divide_and_round_q_last(self, x: jnp.ndarray) -> jnp.ndarray:
        """(..., 2, L, n) coeff domain -> (..., 2, L-1, n) ~ round(x/q_last)."""
        h, l = R.hi_lo(x)
        lh, ll = h[..., -1:, :], l[..., -1:, :]
        rh, rl = h[..., :-1, :], l[..., :-1, :]
        ph, pl = W.add_mod64(lh, ll, self.q_last_half_cols[0],
                             self.q_last_half_cols[1], *self.q_last_cols)
        qh, ql = self.rest_cols
        sh = jnp.broadcast_to(ph, rh.shape)
        sl = jnp.broadcast_to(pl, rl.shape)
        th, tl = W.barrett_reduce_u64(sh, sl, qh, ql, *self.rest_ratio)
        th, tl = W.sub_mod64(th, tl, self.q_last_half_mod_q[0],
                             self.q_last_half_mod_q[1], qh, ql)
        dh, dl = W.sub_mod64(rh, rl, th, tl, qh, ql)
        return R.pair(*W.shoup_mul64(
            dh, dl, self.inv_q_last_mod_q[0], self.inv_q_last_mod_q[1],
            self.inv_q_last_mod_q_shoup[0], self.inv_q_last_mod_q_shoup[1],
            qh, ql))

    def divide_and_round_q_last_ntt(self, x: jnp.ndarray, qtab: dict) -> jnp.ndarray:
        """NTT-domain variant (CKKS rescale).  Output has L-1 limbs, NTT."""
        from ..ops import ntt as NTT

        L = self.base_q.size
        last_tab = NTT.slice_tables(qtab, L - 1, L)
        down_tab = NTT.slice_tables(qtab, 0, L - 1)
        last = R.ntt_inverse(x[..., -1:, :], last_tab)
        ph, pl = W.add_mod64(*R.hi_lo(last), self.q_last_half_cols[0],
                             self.q_last_half_cols[1], *self.q_last_cols)
        qh, ql = self.rest_cols
        rest = x[..., :-1, :]
        rh, rl = R.hi_lo(rest)
        sh = jnp.broadcast_to(ph, rh.shape)
        sl = jnp.broadcast_to(pl, rl.shape)
        th, tl = W.barrett_reduce_u64(sh, sl, qh, ql, *self.rest_ratio)
        th, tl = W.sub_mod64(th, tl, self.q_last_half_mod_q[0],
                             self.q_last_half_mod_q[1], qh, ql)
        tmp = R.ntt_forward(R.pair(th, tl), down_tab)
        dh, dl = W.sub_mod64(rh, rl, *R.hi_lo(tmp), qh, ql)
        return R.pair(*W.shoup_mul64(
            dh, dl, self.inv_q_last_mod_q[0], self.inv_q_last_mod_q[1],
            self.inv_q_last_mod_q_shoup[0], self.inv_q_last_mod_q_shoup[1],
            qh, ql))

    # ------------------------------------------------------------------
    # BGV modswitch (ref: rns_tool.cu mod_t_and_divide_q_last_ntt)
    # ------------------------------------------------------------------
    def mod_t_and_divide_q_last_ntt(self, x: jnp.ndarray, qtab: dict) -> jnp.ndarray:
        from ..ops import ntt as NTT

        L = self.base_q.size
        tv = self.t.value
        last_tab = NTT.slice_tables(qtab, L - 1, L)
        down_tab = NTT.slice_tables(qtab, 0, L - 1)
        last = R.ntt_inverse(x[..., -1:, :], last_tab)
        # h = [r * t^-1]_{q_last}, centered; delta = t*h ≡ r (mod q_last), ≡ 0 (mod t)
        hh, hl = W.mul_mod64(*R.hi_lo(last), self.inv_t_mod_q_last[0],
                             self.inv_t_mod_q_last[1], *self.q_last_cols,
                             *self.q_last_ratio)
        qh, ql = self.rest_cols
        rest = x[..., :-1, :]
        rh, rl = R.hi_lo(rest)
        bh = jnp.broadcast_to(hh, rh.shape)
        bl = jnp.broadcast_to(hl, rl.shape)
        mh, ml = W.barrett_reduce_u64(bh, bl, qh, ql, *self.rest_ratio)
        ch, cl = W.sub_mod64(mh, ml, self.q_last_mod_q[0], self.q_last_mod_q[1],
                             qh, ql)
        qlh = (self.base_q.values[-1] >> 1) + 1  # h > q_last/2 (centering)
        big = W.geq64(bh, bl, U.U32(qlh >> 32), U.U32(qlh & _M32))
        hch = jnp.where(big, ch, mh)
        hcl = jnp.where(big, cl, ml)
        dh, dl = W.mul_mod64(hch, hcl, U.U32(0), U.U32(tv), qh, ql,
                             *self.rest_ratio)
        delta_ntt = R.ntt_forward(R.pair(dh, dl), down_tab)
        sh, sl = W.sub_mod64(rh, rl, *R.hi_lo(delta_ntt), qh, ql)
        return R.pair(*W.shoup_mul64(
            sh, sl, self.inv_q_last_mod_q[0], self.inv_q_last_mod_q[1],
            self.inv_q_last_mod_q_shoup[0], self.inv_q_last_mod_q_shoup[1],
            qh, ql))

    # ------------------------------------------------------------------
    # BFV decrypt (ref: rns_tool.cu decrypt_scale_and_round:1334)
    # ------------------------------------------------------------------
    def decrypt_scale_and_round(self, phase: jnp.ndarray) -> jnp.ndarray:
        """phase (..., 2, L, n) -> (..., n) u32 mod t via {t, gamma}."""
        tv = self.t.value
        qh, ql = self.q_cols
        h, l = R.hi_lo(phase)
        th, tl = W.shoup_mul64(
            h, l, self.prod_t_gamma_mod_q[0], self.prod_t_gamma_mod_q[1],
            self.prod_t_gamma_mod_q_shoup[0], self.prod_t_gamma_mod_q_shoup[1],
            qh, ql)
        s = self.conv_q_to_t_gamma.convert(R.pair(th, tl))
        sh, sl = W.shoup_mul64(
            *R.hi_lo(s), self.neg_inv_q_mod_t_gamma[0],
            self.neg_inv_q_mod_t_gamma[1], self.neg_inv_q_mod_t_gamma_shoup[0],
            self.neg_inv_q_mod_t_gamma_shoup[1], *self.tg_cols)
        s_t = sl[..., 0, :]                     # < t < 2^31: lo word only
        sg_h, sg_l = sh[..., 1, :], sl[..., 1, :]
        # center gamma residue and correct mod t
        t_u = U.U32(tv)
        tm = Modulus(tv)
        thi, tlo = U.U32(tm.ratio64_hi), U.U32(tm.ratio64_lo)
        s_g_mod_t = U.barrett_reduce_u64(sg_h, sg_l, t_u, thi, tlo)
        ghp1 = self.gamma_half + 1  # s_g > gamma/2  <=>  s_g >= gamma/2 + 1
        big = W.geq64(sg_h, sg_l, U.U32(ghp1 >> 32), U.U32(ghp1 & _M32))
        corrected = jnp.where(
            big,
            U.add_mod(s_t, U.sub_mod(self.gamma_mod_t, s_g_mod_t, t_u), t_u),
            U.sub_mod(s_t, s_g_mod_t, t_u),
        )
        return U.shoup_mul(corrected, self.inv_gamma_mod_t,
                           self.inv_gamma_mod_t_shoup, t_u)

    # ------------------------------------------------------------------
    # BGV decrypt (ref: decryptor.h decrypt_mod_t via exact base conversion)
    # ------------------------------------------------------------------
    def _exact_alpha(self, vh: jnp.ndarray, vl: jnp.ndarray) -> jnp.ndarray:
        """alpha = round(sum_i v_i / q_i) in 128-bit fixed point: per-term
        error v_i*(2^128/q_i - floor)/2^128 < 2^-64, deterministic and
        strictly tighter than the reference's f64 accumulation
        (ref: rns_base.cu exact_convey_array; fast-path analog
        rns_tool.py uses 96-bit words for q < 2^30)."""
        words = self.r128_words
        L = self.base_q.size
        a = [None] * 7

        def acc_add(idx, val):
            if a[idx] is None:
                a[idx] = val
                return
            s = a[idx] + val
            carry = (s < val).astype(U.U32)
            a[idx] = s
            i = idx + 1
            while i < 7:
                if a[i] is None:
                    a[i] = carry
                    break
                s = a[i] + carry
                carry = (s < carry).astype(U.U32)
                a[i] = s
                i += 1

        for i in range(L):
            hi_i = vh[..., i, :]
            lo_i = vl[..., i, :]
            for wi, wcol in enumerate(words):
                wv = wcol[i, 0]
                h, lo_p = U.mul32_wide(lo_i, wv)
                acc_add(wi, lo_p)
                acc_add(wi + 1, h)
                h, lo_p = U.mul32_wide(hi_i, wv)
                acc_add(wi + 1, lo_p)
                acc_add(wi + 2, h)
        for i in range(7):
            if a[i] is None:
                a[i] = jnp.zeros_like(a[0])
        # alpha = floor((acc + 2^127) / 2^128); alpha < L so word 4 suffices
        return a[4] + (a[3] >> 31)

    def decrypt_mod_t(self, phase: jnp.ndarray) -> jnp.ndarray:
        """Exact [centered(phase)]_t: (..., 2, L, n) -> (..., n) u32."""
        tv = self.t.value
        qh, ql = self.q_cols
        vh, vl = W.shoup_mul64(
            *R.hi_lo(phase), self.inv_punctured[0], self.inv_punctured[1],
            self.inv_punctured_shoup[0], self.inv_punctured_shoup[1], qh, ql)
        alpha = self._exact_alpha(vh, vl)
        tm = Modulus(tv)
        t_u, thi, tlo = U.U32(tv), U.U32(tm.ratio64_hi), U.U32(tm.ratio64_lo)
        tr = _ratio_cols([tv])
        acc = None
        L = self.base_q.size
        for i in range(L):
            th_, tl_ = W.mul_mod64(
                vh[..., i, :], vl[..., i, :],
                U.U32(0), self.punc_mod_t[i, 0],
                U.U32(0), t_u, tr[0][0, 0], tr[1][0, 0], tr[2][0, 0], tr[3][0, 0])
            acc = tl_ if acc is None else U.add_mod(acc, tl_, t_u)
        corr = U.mul_mod(alpha, self.q_mod_t, t_u, thi, tlo)
        return U.sub_mod(acc, corr, t_u)
