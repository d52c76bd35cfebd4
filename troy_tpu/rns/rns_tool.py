"""Per-level BEHZ/SEAL RNS toolbox.

TPU-native rebuild of reference src/utils/rns_tool.{h,cu} (1834 LoC, the
math-heaviest file) + src/fgk/rns_tool.cu fused variants.  Implements, over
(..., L, n) uint32 residue arrays:

  * BFV multiply machinery (BEHZ16): lift base q -> Bsk (+ m_tilde Montgomery
    small-reduction), floor-division by q, Shenoy-Kumaresan back-conversion,
  * divide_and_round_q_last (+ NTT-domain variant): CKKS rescale & BFV/CKKS
    modulus switching,
  * BGV mod_t_and_divide_q_last_ntt (modswitch keeping the mod-t payload),
  * BFV decrypt_scale_and_round via the {t, gamma} trick (exact, integer-only),
  * BGV decrypt_mod_t via exact base conversion with float32 alpha rounding.

Design notes vs the reference:
  - m_tilde is 2^16 (reference uses 2^32 with 64-bit lanes); the BEHZ bound
    only needs m_tilde > 2 * |base q|, and 2^16 keeps products in u32 range.
  - Aux bases B, m_sk use 30-bit NTT primes like base q (the reference uses
    up to 61-bit primes); |B| is sized dynamically so prod(Bsk) bounds the
    post-floor value with margin.
  - gamma is a 30-bit prime coprime to q and t.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.modulus import Modulus
from ..utils import numth
from ..ops import u32 as U
from ..ops.ntt import NTTTables
from .rns_base import RNSBase, BaseConverter

M_TILDE = 1 << 16


def _aux_primes(n: int, exclude: set[int], count: int, need_ntt: bool = True) -> list[int]:
    """30-bit primes (≡ 1 mod 2n if need_ntt) distinct from `exclude`."""
    out: list[int] = []
    factor = 2 * n if need_ntt else 2
    value = ((1 << 30) - 1) // factor * factor + 1
    while len(out) < count and value > (1 << 29):
        if value not in exclude and numth.is_prime(value):
            out.append(value)
            exclude.add(value)
        value -= factor
    if len(out) < count:
        raise ValueError("[RNSTool] not enough auxiliary primes")
    return out


def _shoup_arr(values: list[int], moduli: list[int]) -> tuple[np.ndarray, np.ndarray]:
    w = np.array(values, dtype=np.uint32)
    ws = np.array([(v << 32) // q for v, q in zip(values, moduli)], dtype=np.uint64)
    return w, ws.astype(np.uint32)


def _col(a: np.ndarray) -> jnp.ndarray:
    """(L,) host array -> (L, 1) device column for broadcasting over n."""
    return jnp.asarray(a)[:, None]


class RNSTool:
    """BEHZ toolbox for one modulus-chain level (ref: rns_tool.h:11-151)."""

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

        # ---- aux base sizing: prod(Bsk) must exceed the post-floor bound
        # ~ t * n * Q * (L+3) with margin (BEHZ §4) -------------------------
        t_val = t.value if (t is not None and not t.is_zero) else 1
        bound = 16 * n * max(t_val, 4) * Q * (L + 3)
        b_primes: list[int] = []
        prod_b = 1
        pool_needed = L + 4
        pool = _aux_primes(n, used, pool_needed + 2)
        i = 0
        while prod_b <= bound:
            if i >= len(pool):
                pool += _aux_primes(n, used, 4)
            prod_b *= pool[i]
            b_primes.append(pool[i])
            i += 1
        m_sk = pool[i]
        self.base_B = RNSBase([Modulus(p) for p in b_primes])
        self.base_Bsk = RNSBase([Modulus(p) for p in b_primes + [m_sk]])
        self.m_sk = Modulus(m_sk)
        self.m_tilde = Modulus(M_TILDE)
        self.base_Bsk_m_tilde = RNSBase(
            [Modulus(p) for p in b_primes + [m_sk, M_TILDE]]
        )

        # converters (ref: rns_tool.h base_q_to_Bsk_conv etc.)
        self.conv_q_to_Bsk_m_tilde = BaseConverter(base_q, self.base_Bsk_m_tilde)
        self.conv_q_to_Bsk = BaseConverter(base_q, self.base_Bsk)
        self.conv_B_to_q = BaseConverter(self.base_B, base_q)
        self.conv_B_to_m_sk = BaseConverter(self.base_B, RNSBase([self.m_sk]))

        # NTT tables for Bsk (BEHZ step 3 runs NTT under the aux base)
        self.bsk_ntt = NTTTables(log_n, self.base_Bsk.moduli)

        bsk_vals = self.base_Bsk.values
        B_prod = self.base_B.prod

        # ---- sm_mrq constants (ref: rns_tool.cu sm_mrq) --------------------
        self.neg_inv_prod_q_mod_m_tilde = U.u32(
            (-numth.invert_mod(Q % M_TILDE, M_TILDE)) % M_TILDE
        )
        w, ws = _shoup_arr([Q % b for b in bsk_vals], bsk_vals)
        self.prod_q_mod_Bsk, self.prod_q_mod_Bsk_shoup = _col(w), _col(ws)
        w, ws = _shoup_arr([(Q * M_TILDE) % b for b in bsk_vals], bsk_vals)
        self.prod_q_m_tilde_mod_Bsk, self.prod_q_m_tilde_mod_Bsk_shoup = _col(w), _col(ws)
        w, ws = _shoup_arr(
            [numth.invert_mod(M_TILDE % b, b) for b in bsk_vals], bsk_vals
        )
        self.inv_m_tilde_mod_Bsk, self.inv_m_tilde_mod_Bsk_shoup = _col(w), _col(ws)

        # ---- fast_floor constants (ref: rns_tool.cu fast_floor) ------------
        w, ws = _shoup_arr(
            [numth.invert_mod(Q % b, b) for b in bsk_vals], bsk_vals
        )
        self.inv_prod_q_mod_Bsk, self.inv_prod_q_mod_Bsk_shoup = _col(w), _col(ws)

        # ---- fastbconv_sk constants (ref: rns_tool.cu fast_b_conv_sk) ------
        self.inv_prod_B_mod_m_sk = U.u32(numth.invert_mod(B_prod % m_sk, m_sk))
        self.inv_prod_B_mod_m_sk_shoup = U.u32(
            (int(numth.invert_mod(B_prod % m_sk, m_sk)) << 32) // m_sk
        )
        w, ws = _shoup_arr([B_prod % q for q in q_values], q_values)
        self.prod_B_mod_q, self.prod_B_mod_q_shoup = _col(w), _col(ws)
        w, ws = _shoup_arr([(B_prod * m_sk) % q for q in q_values], q_values)
        self.prod_B_m_sk_mod_q, self.prod_B_m_sk_mod_q_shoup = _col(w), _col(ws)

        # ---- HPS-style lift constants (fast_b_conv_hps) --------------------
        # -Q mod b_j folded as the alpha-correction dot term; 1/q_i as f32
        # for the alpha estimate (error < L * 2^-23 << the q-fraction margin).
        self.hps_neg_q_mod_Bsk = _col(
            np.array([(b - Q % b) % b for b in bsk_vals], dtype=np.uint32))
        self.hps_inv_q_f32 = jnp.asarray(
            np.array([1.0 / q for q in q_values], dtype=np.float32))[:, None]

        # ---- t-folded fast_floor constants (fast_floor_scale_fast_b_conv_sk:
        # the evaluator's explicit "multiply by t" pass over both bases folds
        # into these tables; outputs stay bit-identical) ---------------------
        if t is not None and not t.is_zero:
            tv = t.value
            w, ws = _shoup_arr(
                [(tv * ip) % q for ip, q in
                 zip(base_q.inv_punctured, q_values)], q_values)
            self.ff_inv_punc_t, self.ff_inv_punc_t_shoup = _col(w), _col(ws)
            w, ws = _shoup_arr(
                [(tv * numth.invert_mod(Q % b, b)) % b for b in bsk_vals],
                bsk_vals)
            self.ff_t_qinv_mod_Bsk, self.ff_t_qinv_mod_Bsk_shoup = _col(w), _col(ws)
            ffm = np.empty((len(bsk_vals), L), dtype=np.uint32)
            for j, bv in enumerate(bsk_vals):
                qinv = numth.invert_mod(Q % bv, bv)
                for i, punc in enumerate(base_q.punctured):
                    ffm[j, i] = (punc % bv) * qinv % bv
            self.ff_mat_qinv = jnp.asarray(ffm)

        # ---- q_last division (modswitch / rescale) -------------------------
        if L > 1:
            q_last = q_values[-1]
            rest = q_values[:-1]
            self.q_last_half = U.u32(q_last >> 1)
            w, ws = _shoup_arr(
                [numth.invert_mod(q_last % q, q) for q in rest], rest
            )
            self.inv_q_last_mod_q, self.inv_q_last_mod_q_shoup = _col(w), _col(ws)
            self.q_last_half_mod_q = _col(
                np.array([(q_last >> 1) % q for q in rest], dtype=np.uint32)
            )

        # ---- {t, gamma} decrypt (BFV) + BGV t constants --------------------
        if t is not None and not t.is_zero:
            tv = t.value
            gamma = _aux_primes(n, used, 1, need_ntt=False)[0]
            while numth.gcd(gamma, tv) != 1:
                gamma = _aux_primes(n, used, 1, need_ntt=False)[0]
            self.gamma = Modulus(gamma)
            self.base_t_gamma = RNSBase([Modulus(tv), Modulus(gamma)])
            self.conv_q_to_t_gamma = BaseConverter(base_q, self.base_t_gamma)
            tg_vals = [tv, gamma]
            w, ws = _shoup_arr([(tv * gamma) % q for q in q_values], q_values)
            self.prod_t_gamma_mod_q, self.prod_t_gamma_mod_q_shoup = _col(w), _col(ws)
            w, ws = _shoup_arr(
                [(-numth.invert_mod(Q % m, m)) % m for m in tg_vals], tg_vals
            )
            self.neg_inv_q_mod_t_gamma, self.neg_inv_q_mod_t_gamma_shoup = _col(w), _col(ws)
            ig = numth.invert_mod(gamma % tv, tv)
            self.inv_gamma_mod_t = U.u32(ig)
            self.inv_gamma_mod_t_shoup = U.u32((ig << 32) // tv)
            # exact conversion q -> t (BGV decrypt; ref: rns_base exact_convey_array)
            self.conv_matrix_q_to_t = _col(
                np.array([p % tv for p in base_q.punctured], dtype=np.uint32)
            )
            self.q_mod_t = U.u32(Q % tv)
            # 96-bit fixed-point reciprocals floor(2^96 / q_i) for the exact
            # alpha rounding in decrypt_mod_t (three u32 words per limb)
            r96 = [(1 << 96) // q for q in q_values]
            self.r96_words = tuple(
                _col(np.array([(r >> (32 * w)) & 0xFFFFFFFF for r in r96],
                              dtype=np.uint32))
                for w in range(3)
            )
            if L > 1:
                q_last = q_values[-1]
                self.inv_q_last_mod_t = U.u32(numth.invert_mod(q_last % tv, tv))
                self.q_last_mod_t = U.u32(q_last % tv)
                # BGV modswitch: delta = [r * t * (t^-1 mod q_last)] centered
                self.inv_t_mod_q_last = U.u32(numth.invert_mod(tv % q_last, q_last))

    # ------------------------------------------------------------------
    # helpers
    # ------------------------------------------------------------------
    def materialize(self):
        """Force-build every device table eagerly.  Must be called before
        tracing a jitted function that uses this tool — building packs inside
        a trace would store tracers into these long-lived caches."""
        convs = [self.conv_q_to_Bsk_m_tilde, self.conv_q_to_Bsk,
                 self.conv_B_to_q, self.conv_B_to_m_sk]
        if self.t is not None:
            convs.append(self.conv_q_to_t_gamma)
        for conv in convs:
            conv.ibase.pack()
            conv.obase.pack()
        self.bsk_ntt.pack()
        return self

    def _tab(self, base: RNSBase, x):
        p = base.pack()
        lead = (1,) * (x.ndim - 2)
        return (
            p["q"].reshape(lead + (-1, 1)),
            p["ratio_hi"].reshape(lead + (-1, 1)),
            p["ratio_lo"].reshape(lead + (-1, 1)),
        )

    # ------------------------------------------------------------------
    # BFV multiply: BEHZ steps 1-2 (ref: rns_tool.cu
    # fast_b_conv_m_tilde_sm_mrq, fgk/rns_tool.cu fused variant)
    # ------------------------------------------------------------------
    def fast_b_conv_m_tilde_sm_mrq(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (..., L, n) in base q -> (..., |Bsk|, n) residues of (a value
        congruent to x with bounded overflow) in base Bsk."""
        qp = self.base_q.pack()
        lead = (1,) * (x.ndim - 2)
        q = qp["q"].reshape(lead + (-1, 1))
        qhi = qp["ratio_hi"].reshape(lead + (-1, 1))
        qlo = qp["ratio_lo"].reshape(lead + (-1, 1))
        # step 1: scale by m_tilde and convert to Bsk ∪ {m_tilde}
        x_scaled = U.mul_mod(x, U.u32(M_TILDE), q, qhi, qlo)
        conv = self.conv_q_to_Bsk_m_tilde.convert(x_scaled)
        x_bsk = conv[..., :-1, :]
        x_mt = conv[..., -1:, :] & U.U32(M_TILDE - 1)  # reduce mod 2^16
        # step 2 (sm_mrq): r = [-x * Q^-1]_{m_tilde}
        r = (x_mt * self.neg_inv_prod_q_mod_m_tilde) & U.U32(M_TILDE - 1)
        b, bhi, blo = self._tab(self.base_Bsk, x_bsk)
        term = U.mul_mod(self.prod_q_mod_Bsk, r, b, bhi, blo)
        y = U.add_mod(x_bsk, term, b)
        # centering: r >= m_tilde/2 means the true correction is r - m_tilde
        y = jnp.where(
            r >= U.U32(M_TILDE // 2),
            U.sub_mod(y, self.prod_q_m_tilde_mod_Bsk, b),
            y,
        )
        return U.shoup_mul(
            y, self.inv_m_tilde_mod_Bsk, self.inv_m_tilde_mod_Bsk_shoup, b
        )

    # ------------------------------------------------------------------
    # BFV multiply, HPS-style lift (fills the role of BEHZ steps 1-2;
    # ref intent: rns_tool.cu fast_b_conv_m_tilde_sm_mrq, replaced by the
    # HPS17 §4 approximate conversion)
    # ------------------------------------------------------------------
    def fast_b_conv_hps(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (..., L, n) in base q -> (..., |Bsk|, n): a plain fast
        conversion with the q-overflow count alpha estimated in f32 and
        folded into the accumulation dot as ONE extra term, instead of the
        BEHZ m_tilde scale + Montgomery (sm_mrq) passes.  Output residues
        represent x + d*q with d in {-1, 0, +1}: the f32 estimate of
        alpha = floor(sum_i y_i/q_i) has error < L*2^-23, so the rounded
        alpha is off by at most one; the residual q-multiple is absorbed
        as bounded ciphertext noise (HPS17 §4 / Lattigo BFV), while every
        downstream BEHZ magnitude bound (inputs < 2q) is preserved.

        VPU-only by design: this path always runs the wide-accumulation
        VPU dot (reaching into conv_q_to_Bsk._mat) and deliberately
        ignores TROY_BCONV_BACKEND — the mxu/pallas bconv variants are
        documented measured negatives (BENCH.md), and the alpha term
        must join the same accumulation dot to stay one fused pass."""
        qp = self.base_q.pack()
        lead = (1,) * (x.ndim - 2)
        tmp = U.shoup_mul(
            x,
            qp["inv_punctured"].reshape(lead + (-1, 1)),
            qp["inv_punctured_shoup"].reshape(lead + (-1, 1)),
            qp["q"].reshape(lead + (-1, 1)),
        )
        est = jnp.sum(
            tmp.astype(jnp.float32) * self.hps_inv_q_f32.reshape(lead + (-1, 1)),
            axis=-2, keepdims=True)
        alpha = jnp.round(est).astype(jnp.uint32)
        mat = self.conv_q_to_Bsk._mat
        pairs = [
            (tmp[..., i : i + 1, :], mat[:, i].reshape(lead + (-1, 1)))
            for i in range(self.base_q.size)
        ] + [(alpha, self.hps_neg_q_mod_Bsk.reshape(lead + (-1, 1)))]
        b, bhi, blo = self._tab(self.base_Bsk, x)
        return U.dot_mod(pairs, b, bhi, blo)

    # ------------------------------------------------------------------
    # BFV multiply: BEHZ steps 6-8 (ref: rns_tool.cu fast_floor_fast_b_conv_sk)
    # ------------------------------------------------------------------
    def fast_floor_fast_b_conv_sk(self, w_q: jnp.ndarray, w_bsk: jnp.ndarray) -> jnp.ndarray:
        """Inputs hold t*(c1*c2) in base q (w_q) and base Bsk (w_bsk), coeff
        domain.  Returns round-ish floor(w / q) mod q — the BFV product."""
        b, bhi, blo = self._tab(self.base_Bsk, w_bsk)
        # fast_floor: y = (w_bsk - conv(w_q)) * Q^-1 mod Bsk
        conv = self.conv_q_to_Bsk.convert(w_q)
        y = U.sub_mod(w_bsk, conv, b)
        y = U.shoup_mul(y, self.inv_prod_q_mod_Bsk, self.inv_prod_q_mod_Bsk_shoup, b)
        return self._b_conv_sk(y)

    def fast_floor_scale_fast_b_conv_sk(self, d_q: jnp.ndarray,
                                        d_bsk: jnp.ndarray) -> jnp.ndarray:
        """Fused BEHZ steps 5b-8 with the ×t scale folded into constants.

        Inputs are the RAW tensor residues d = c1*c2 (coeff domain, both
        bases); computes floor(t*d/Q) and Shenoy-converts to q.  The
        separate multiply_scalar(t) pass over both bases (BEHZ "multiply by
        t", ref evaluator.cu:29-117) is absorbed into (t*q̂_i^-1 mod q_i)
        and (t*Q^-1 mod b_j) Shoup tables, and the fast_floor division by Q
        into the conversion matrix ((Q/q_i)*Q^-1 mod b_j) — computing the
        SAME integer (t*D - X)/Q, so outputs are bit-identical to the
        unfused path at zero added arithmetic."""
        b, bhi, blo = self._tab(self.base_Bsk, d_bsk)
        qp = self.base_q.pack()
        lead = (1,) * (d_q.ndim - 2)
        y = U.shoup_mul(
            d_q, self.ff_inv_punc_t, self.ff_inv_punc_t_shoup,
            qp["q"].reshape(lead + (-1, 1)))
        pairs = [
            (y[..., i : i + 1, :], self.ff_mat_qinv[:, i].reshape(lead + (-1, 1)))
            for i in range(self.base_q.size)
        ]
        x_div = U.dot_mod(pairs, b, bhi, blo)
        w = U.shoup_mul(
            d_bsk, self.ff_t_qinv_mod_Bsk, self.ff_t_qinv_mod_Bsk_shoup, b)
        return self._b_conv_sk(U.sub_mod(w, x_div, b))

    def _b_conv_sk(self, y: jnp.ndarray) -> jnp.ndarray:
        """fastbconv_sk: Shenoy-Kumaresan exact conversion Bsk -> q
        (ref: rns_tool.cu fast_b_conv_sk)."""
        y_B = y[..., :-1, :]
        y_msk = y[..., -1:, :]
        u = self.conv_B_to_q.convert(y_B)
        c_msk = self.conv_B_to_m_sk.convert(y_B)
        msk = self.m_sk.value
        mk = U.u32(msk)
        alpha = U.sub_mod(c_msk, y_msk, mk)
        alpha = U.shoup_mul(alpha, self.inv_prod_B_mod_m_sk, self.inv_prod_B_mod_m_sk_shoup, mk)
        q, qhi, qlo = self._tab(self.base_q, u)
        term = U.mul_mod(self.prod_B_mod_q, alpha, q, qhi, qlo)
        res = U.sub_mod(u, term, q)
        # alpha centered: alpha >= m_sk/2 means true alpha is alpha - m_sk
        res = jnp.where(
            alpha >= U.U32(msk >> 1),
            U.add_mod(res, self.prod_B_m_sk_mod_q, q),
            res,
        )
        return res

    # ------------------------------------------------------------------
    # modswitch / rescale (ref: rns_tool.cu divide_and_round_q_last:421)
    # ------------------------------------------------------------------
    def divide_and_round_q_last(self, x: jnp.ndarray) -> jnp.ndarray:
        """(..., L, n) coeff domain -> (..., L-1, n) ≈ round(x / q_last)."""
        L = self.base_q.size
        q_last_mod = self.base_q.moduli[-1]
        last = x[..., -1:, :]
        rest = x[..., :-1, :]
        last_plus = U.add_mod(last, self.q_last_half, U.u32(q_last_mod.value))
        q, qhi, qlo = self._tab(self.base_q, rest)
        q, qhi, qlo = q[..., : L - 1, :], qhi[..., : L - 1, :], qlo[..., : L - 1, :]
        tmp = U.barrett_reduce_u32(jnp.broadcast_to(last_plus, rest.shape), q, qhi, qlo)
        tmp = U.sub_mod(tmp, self.q_last_half_mod_q, q)
        diff = U.sub_mod(rest, tmp, q)
        return U.shoup_mul(diff, self.inv_q_last_mod_q, self.inv_q_last_mod_q_shoup, q)

    def divide_and_round_q_last_ntt(self, x: jnp.ndarray, qtab: dict) -> jnp.ndarray:
        """NTT-domain variant (CKKS rescale / BGV-CKKS modswitch).  qtab is the
        level's NTT table pack (L limbs); output has L-1 limbs, NTT domain."""
        from ..ops import ntt as NTT

        L = self.base_q.size
        last_tab = NTT.slice_tables(qtab, L - 1, L)
        down_tab = NTT.slice_tables(qtab, 0, L - 1)
        last = NTT.ntt_inverse(x[..., -1:, :], last_tab)
        q_last = U.u32(self.base_q.values[-1])
        last_plus = U.add_mod(last, self.q_last_half, q_last)
        q, qhi, qlo = self._tab(self.base_q, x)
        q, qhi, qlo = q[..., : L - 1, :], qhi[..., : L - 1, :], qlo[..., : L - 1, :]
        rest = x[..., :-1, :]
        tmp = U.barrett_reduce_u32(
            jnp.broadcast_to(last_plus, rest.shape), q, qhi, qlo
        )
        tmp = U.sub_mod(tmp, self.q_last_half_mod_q, q)
        tmp = NTT.ntt_forward(tmp, down_tab)
        diff = U.sub_mod(rest, tmp, q)
        return U.shoup_mul(diff, self.inv_q_last_mod_q, self.inv_q_last_mod_q_shoup, q)

    # ------------------------------------------------------------------
    # BGV modswitch (ref: rns_tool.cu mod_t_and_divide_q_last_ntt)
    # ------------------------------------------------------------------
    def mod_t_and_divide_q_last_ntt(self, x: jnp.ndarray, qtab: dict) -> jnp.ndarray:
        """Divide by q_last while preserving the payload mod t: subtract a
        delta ≡ x (mod q_last), ≡ 0 (mod t), then exact-divide."""
        from ..ops import ntt as NTT

        L = self.base_q.size
        tv = self.t.value
        q_last_v = self.base_q.values[-1]
        last_tab = NTT.slice_tables(qtab, L - 1, L)
        down_tab = NTT.slice_tables(qtab, 0, L - 1)
        last = NTT.ntt_inverse(x[..., -1:, :], last_tab)  # r = [x]_{q_last}, [0, q_last)
        # center r, then delta = t * [r * t^-1]_{q_last} reconstructed per limb:
        # delta ≡ r (mod q_last), delta ≡ 0 (mod t), |delta| <= t * q_last.
        q_last_u = U.u32(q_last_v)
        qlm = Modulus(q_last_v)
        rh = U.mul_mod(
            last, self.inv_t_mod_q_last, q_last_u,
            U.u32(qlm.ratio64_hi), U.u32(qlm.ratio64_lo),
        )  # h = [r * t^-1]_{q_last} in [0, q_last)
        # delta = t*h - (h >= ? ) ... we use centered h: h_c in (-q_last/2, q_last/2]
        q, qhi, qlo = self._tab(self.base_q, x)
        q, qhi, qlo = q[..., : L - 1, :], qhi[..., : L - 1, :], qlo[..., : L - 1, :]
        h_b = jnp.broadcast_to(rh, x[..., :-1, :].shape)
        h_mod = U.barrett_reduce_u32(h_b, q, qhi, qlo)
        # [q_last]_{q_i} correction when centering: h_c = h - q_last if h > q_last/2
        q_last_mod_qi = U.barrett_reduce_u32(
            jnp.broadcast_to(q_last_u, h_mod.shape), q, qhi, qlo
        )
        h_c = jnp.where(
            h_b > U.U32(q_last_v >> 1), U.sub_mod(h_mod, q_last_mod_qi, q), h_mod
        )
        delta = U.mul_mod(h_c, U.u32(tv), q, qhi, qlo)
        delta_ntt = NTT.ntt_forward(delta, down_tab)
        diff = U.sub_mod(x[..., :-1, :], delta_ntt, q)
        return U.shoup_mul(diff, self.inv_q_last_mod_q, self.inv_q_last_mod_q_shoup, q)

    # ------------------------------------------------------------------
    # BFV decrypt (ref: rns_tool.cu decrypt_scale_and_round:1334)
    # ------------------------------------------------------------------
    def decrypt_scale_and_round(self, phase: jnp.ndarray) -> jnp.ndarray:
        """phase: (..., L, n) = Delta*m + v mod q (coeff domain) -> (..., n) mod t.

        BEHZ {t, gamma} trick: exact integer-only rounding of t*phase/q.
        """
        tv = self.t.value
        gv = self.gamma.value
        q, qhi, qlo = self._tab(self.base_q, phase)
        # step 1: multiply by t*gamma mod q
        tmp = U.shoup_mul(phase, self.prod_t_gamma_mod_q, self.prod_t_gamma_mod_q_shoup, q)
        # step 2: convert to {t, gamma}
        s = self.conv_q_to_t_gamma.convert(tmp)
        # step 3: multiply by -Q^-1 mod {t, gamma}
        tg, tghi, tglo = self._tab(self.base_t_gamma, s)
        s = U.shoup_mul(s, self.neg_inv_q_mod_t_gamma, self.neg_inv_q_mod_t_gamma_shoup, tg)
        s_t = s[..., 0, :]
        s_g = s[..., 1, :]
        # step 4-5: center gamma residue and correct mod t
        t_u = U.u32(tv)
        tm = self.t
        g_mod_t = U.u32(gv % tv)
        s_g_mod_t = U.barrett_reduce_u32(
            s_g, t_u, U.u32(tm.ratio64_hi), U.u32(tm.ratio64_lo)
        )
        corrected = jnp.where(
            s_g > U.U32(gv >> 1),
            U.add_mod(s_t, U.sub_mod(g_mod_t, s_g_mod_t, t_u), t_u),
            U.sub_mod(s_t, s_g_mod_t, t_u),
        )
        return U.shoup_mul(corrected, self.inv_gamma_mod_t, self.inv_gamma_mod_t_shoup, t_u)

    # ------------------------------------------------------------------
    # BGV decrypt (ref: decryptor.h decrypt_mod_t via exact base conversion)
    # ------------------------------------------------------------------
    def _exact_alpha(self, v: jnp.ndarray) -> jnp.ndarray:
        """alpha = round(sum_i v_i / q_i) for v: (..., L, n) residues in
        [0, q_i), computed in 96-bit fixed point (floor(2^96/q_i) words):
        per-term error < 2^-66, so rounding is exact whenever the centered
        phase is not within ~L*2^-66 * Q of +-Q/2 — deterministic and
        strictly tighter than the reference's f64 accumulation
        (ref: rns_base.cu exact_convey_array step1/2, 52-bit mantissa)."""
        w0, w1, w2 = self.r96_words
        L = self.base_q.size
        # acc (4 u32 words, little-endian) = sum_i v_i * floor(2^96/q_i)
        a = [None, None, None, None]

        def acc_add(idx, val):
            if a[idx] is None:
                a[idx] = val
                return
            s = a[idx] + val
            carry = (s < val).astype(U.U32)
            a[idx] = s
            i = idx + 1
            while i < 4:
                if a[i] is None:
                    a[i] = carry
                    break
                s = a[i] + carry
                carry = (s < carry).astype(U.U32)
                a[i] = s
                i += 1

        for i in range(L):
            vi = v[..., i, :]
            h0, l0 = U.mul32_wide(vi, w0[i, 0])
            h1, l1 = U.mul32_wide(vi, w1[i, 0])
            h2, l2 = U.mul32_wide(vi, w2[i, 0])
            acc_add(0, l0)
            acc_add(1, h0)
            acc_add(1, l1)
            acc_add(2, h1)
            acc_add(2, l2)
            acc_add(3, h2)
        for i in range(4):
            if a[i] is None:
                a[i] = jnp.zeros_like(a[0])
        # alpha = floor((acc + 2^95) / 2^96): carry from word 2's top bit
        return a[3] + (a[2] >> 31)

    def decrypt_mod_t(self, phase: jnp.ndarray) -> jnp.ndarray:
        """Exact [centered(phase)]_t via integer fixed-point alpha rounding
        (ref: rns_base exact_convey_array)."""
        qp = self.base_q.pack()
        lead = (1,) * (phase.ndim - 2)
        q = qp["q"].reshape(lead + (-1, 1))
        v = U.shoup_mul(
            phase,
            qp["inv_punctured"].reshape(lead + (-1, 1)),
            qp["inv_punctured_shoup"].reshape(lead + (-1, 1)),
            q,
        )
        alpha = self._exact_alpha(v)
        tv = self.t.value
        tm = self.t
        t_u, thi, tlo = U.u32(tv), U.u32(tm.ratio64_hi), U.u32(tm.ratio64_lo)
        acc = None
        L = self.base_q.size
        for i in range(L):
            term = U.mul_mod(v[..., i, :], self.conv_matrix_q_to_t[i, 0], t_u, thi, tlo)
            acc = term if acc is None else U.add_mod(acc, term, t_u)
        corr = U.mul_mod(alpha, self.q_mod_t, t_u, thi, tlo)
        return U.sub_mod(acc, corr, t_u)
