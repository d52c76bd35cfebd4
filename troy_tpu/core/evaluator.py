"""Evaluator: homomorphic operations for BFV / CKKS / BGV.

TPU-native rebuild of reference src/evaluator*.cu (~5 kLoC over 8 files):
translate (add/sub/negate, ct+-plain), multiply (BEHZ BFV multiply, NTT-domain
CKKS/BGV dyadic products), keyswitching (relinearize / apply_galois /
rotations over single-special-prime GHS keys), modswitch/rescale, and NTT
transforms.  LWE extract/pack lives in core/lwe_ops.py; batched variants are
leading-axis broadcasts of the same code paths.

Every op is a pure function and runs at either residue width through the
width-polymorphic ops layer (ops/rp.py): fast-path ciphertexts hold
(size, L, n) u32 arrays, wide-path (SEAL-default 40-60-bit prime) ciphertexts
hold (size, 2, L, n) u32-pair arrays — one Evaluator serves both, like the
reference's single <=61-bit width (src/utils/basics.h:579).  Per-level
constants come from ContextData (lazily built, cached); jit compilation is
cached by array shape, so each (level, size) pair compiles once — the XLA
analog of the reference's per-level precomputed device tables (SURVEY.md §7
hard part (f)).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .context import HeContext, ContextData
from .params import SchemeType, ParmsID, PARMS_ID_ZERO
from .plaintext import Plaintext
from .ciphertext import Ciphertext
from .keys import KSwitchKeys, RelinKeys, GaloisKeys
from ..ops import ntt as NTT, poly as P, u32 as U, u64 as W, rp as R
from ..ops.jitu import safe_stack
from ..ops.galois import GaloisTool
from ..utils import numth

from .lwe_ops import LweOpsMixin

import os as _os

from ..rns import rns_base as _rns_base


def _bfv_bconv_mode() -> str:
    """BFV input-lift variant: 'hps' (default; plain fast conversion with
    f32 alpha correction — fewer modmul passes, bounded extra noise) or
    'behz' (reference-exact m_tilde/sm_mrq Montgomery pass).  Read at trace
    time; the per-level jit cache is keyed by the mode.  Unknown values
    raise rather than silently selecting the approximate lift."""
    v = _os.environ.get("TROY_BFV_BCONV", "hps").strip().lower()
    if v not in ("hps", "behz"):
        raise ValueError(
            f"[Evaluator] TROY_BFV_BCONV={v!r} — expected 'hps' or 'behz'")
    return v


def _make_centralizer(cd: ContextData):
    """Width-appropriate scaler used for BGV centered lifts."""
    from ..rns.scaling import BFVScaler, BFVScaler64

    cls = BFVScaler64 if cd.wide else BFVScaler
    return cls(cd.base_q, cd.parms.plain_modulus)


class Evaluator(LweOpsMixin):
    def __init__(self, context: HeContext):
        self.context = context

    # ==================================================================
    # helpers
    # ==================================================================
    def _cd(self, ct: Ciphertext | Plaintext) -> ContextData:
        return self.context.get_context_data(ct.parms_id)

    @staticmethod
    def _jit(cd: ContextData, name: str, builder):
        """Per-level compiled-kernel cache: `builder()` returns a pure
        function of arrays (tables are closure constants); it is jitted once
        per (level, op) and re-specialized per argument shape — the XLA
        analog of the reference's per-level precomputed device programs."""
        cache = getattr(cd, "_jit_ops", None)
        if cache is None:
            cache = {}
            cd._jit_ops = cache
        if name not in cache:
            cache[name] = jax.jit(builder())
        return cache[name]

    @staticmethod
    def _check_same(ct1: Ciphertext, ct2: Ciphertext, op: str):
        if ct1.parms_id != ct2.parms_id:
            raise ValueError(f"[Evaluator.{op}] operands at different levels")
        if ct1.is_ntt_form != ct2.is_ntt_form:
            raise ValueError(f"[Evaluator.{op}] NTT form mismatch")

    def _centralizer(self, cd: ContextData):
        s = getattr(cd, "_bgv_centralizer", None)
        if s is None:
            s = _make_centralizer(cd)
            cd._bgv_centralizer = s
        return s

    # ==================================================================
    # translate: negate / add / sub (ref: evaluator_translate.cu)
    # ==================================================================
    def negate(self, ct: Ciphertext) -> Ciphertext:
        cd = self._cd(ct)
        out = ct.clone()
        out.data = R.negate(ct.data, cd.qtab())
        return out

    def _balance_bgv(self, ct1: Ciphertext, ct2: Ciphertext, cd: ContextData):
        """Equalize BGV correction factors (ref: evaluator_translate.cu
        balance_correction_factors).  Scaling ct_i by e_i multiplies its
        noise by e_i, so scale by the smallest exact multipliers
        e1 = f2/g, e2 = f1/g with g = gcd(f1, f2)."""
        if ct1.correction_factor == ct2.correction_factor:
            return ct1, ct2, ct1.correction_factor
        t = cd.parms.plain_modulus.value
        f1, f2 = ct1.correction_factor, ct2.correction_factor
        g = numth.gcd(f1, f2)
        e1, e2 = f2 // g, f1 // g
        a = ct1.clone()
        b = ct2.clone()
        a.data = R.multiply_scalar(ct1.data, e1 % t, cd.qtab())
        b.data = R.multiply_scalar(ct2.data, e2 % t, cd.qtab())
        f = f1 * e1 % t
        a.correction_factor = b.correction_factor = f
        return a, b, f

    def add(self, ct1: Ciphertext, ct2: Ciphertext) -> Ciphertext:
        self._check_same(ct1, ct2, "add")
        cd = self._cd(ct1)
        if cd.parms.scheme == SchemeType.CKKS:
            if abs(ct1.scale - ct2.scale) > 0.5 * max(ct1.scale, ct2.scale) * 1e-9:
                raise ValueError("[Evaluator.add] CKKS scale mismatch")
        if cd.parms.scheme == SchemeType.BGV:
            ct1, ct2, cf = self._balance_bgv(ct1, ct2, cd)
        if ct1.size != ct2.size:
            big, small = (ct1, ct2) if ct1.size > ct2.size else (ct2, ct1)
            pad = jnp.zeros(
                (big.size - small.size,) + small.data.shape[1:], jnp.uint32
            )
            small = small.clone()
            small.data = jnp.concatenate([small.data, pad])
            ct1, ct2 = big, small
        out = ct1.clone()
        out.data = R.add(ct1.data, ct2.data, cd.qtab())
        return out

    def sub(self, ct1: Ciphertext, ct2: Ciphertext) -> Ciphertext:
        return self.add(ct1, self.negate(ct2))

    # ==================================================================
    # plaintext translate (ref: evaluator_translate_plain.cu)
    # ==================================================================
    def _plain_to_level(self, plain: Plaintext, cd: ContextData, ntt: bool):
        """Lift a plaintext to RNS at cd's level (centered), optionally NTT
        form.  Plaintexts already in RNS form (CKKS, or ring2k scale-up /
        centralize outputs with a non-zero parms_id) pass through."""
        scheme = cd.parms.scheme
        if scheme == SchemeType.CKKS or self._is_rns_plain(plain, cd):
            data = plain.data
            if ntt and not plain.is_ntt_form:
                data = R.ntt_forward(data, cd.qtab())
            if not ntt and plain.is_ntt_form:
                data = R.ntt_inverse(data, cd.qtab())
            return data
        lifted = self._centralizer(cd).centralize(plain.data[0])
        return R.ntt_forward(lifted, cd.qtab()) if ntt else lifted

    def _is_rns_plain(self, plain: Plaintext, cd: ContextData) -> bool:
        """True for RNS-form plaintexts (CKKS / ring2k scale-up), False for
        single-limb mod-t coefficient form."""
        if cd.wide:
            return plain.data.ndim >= 3
        return plain.coeff_modulus_size > 1

    def _translate_plain_impl(self, cd: ContextData, data, plain_data,
                              cf_u32, subtract: bool, rns: bool,
                              plain_ntt: bool):
        """Pure traceable ct +- plain on raw arrays (jitted per level/form)."""
        scheme = cd.parms.scheme
        qtab = cd.qtab()
        if scheme == SchemeType.BFV:
            if rns:  # ring2k / bfv_scale_up form
                m = plain_data
            else:
                m = cd.scaler.scale_up(plain_data[0])
        elif scheme == SchemeType.CKKS:
            m = plain_data
            if not plain_ntt:
                m = R.ntt_forward(m, qtab)
        else:  # BGV (ref: evaluator_translate.cu plain correction)
            t = cd.parms.plain_modulus
            pm = U.mul_mod(plain_data[0], cf_u32, U.u32(t.value),
                           U.u32(t.ratio64_hi), U.u32(t.ratio64_lo))
            m = R.ntt_forward(self._centralizer(cd).centralize(pm), qtab)
        op = R.sub if subtract else R.add
        return data.at[0].set(op(data[0], m, qtab))

    def _translate_plain(self, ct: Ciphertext, plain: Plaintext,
                         subtract: bool) -> Ciphertext:
        cd = self._cd(ct)
        scheme = cd.parms.scheme
        cd.rns_tool.materialize()
        cd.qtab()
        # materialize lazy table holders BEFORE tracing (tracer-leak safety)
        if not cd.wide:
            cd.base_q.pack()  # u32 pack; wide scalers carry pair columns
        if scheme == SchemeType.BFV:
            cd.scaler
        elif scheme == SchemeType.BGV:
            self._centralizer(cd)
        rns = self._is_rns_plain(plain, cd)
        if rns and plain.parms_id is not None \
                and plain.parms_id != ct.parms_id:
            raise ValueError("[Evaluator.add_plain] plaintext level "
                             "mismatch (mod_switch_plain_to first)")
        plain_ntt = bool(plain.is_ntt_form)
        if (scheme == SchemeType.BFV and plain_ntt != bool(ct.is_ntt_form)):
            # BFV supports both forms, but the domains must match — an
            # NTT-form plain added to a coeff-form ct (or vice versa) would
            # silently mix domains (ref: evaluator_translate_plain.cu checks)
            raise ValueError("[Evaluator.add_plain] NTT form mismatch")
        cf = (ct.correction_factor % cd.parms.plain_modulus.value
              if scheme == SchemeType.BGV else 1)
        key = f"tplain{int(subtract)}{int(rns)}{int(plain_ntt)}"
        fn = self._jit(cd, key, lambda: (
            lambda d, p, c: self._translate_plain_impl(
                cd, d, p, c, subtract, rns, plain_ntt)))
        out = ct.clone()
        out.data = fn(ct.data, plain.data, U.u32(cf))
        return out

    def add_plain(self, ct: Ciphertext, plain: Plaintext) -> Ciphertext:
        return self._translate_plain(ct, plain, subtract=False)

    def sub_plain(self, ct: Ciphertext, plain: Plaintext) -> Ciphertext:
        return self._translate_plain(ct, plain, subtract=True)

    def _multiply_plain_impl(self, cd: ContextData, data, plain_data,
                             rns: bool, plain_ntt: bool, ct_ntt: bool):
        """Pure traceable ct * plain on raw arrays (jitted per level/form;
        ref: evaluator_multiply_plain.cu)."""
        qtab = cd.qtab()
        if rns or cd.parms.scheme == SchemeType.CKKS:
            m_ntt = plain_data if plain_ntt else R.ntt_forward(plain_data, qtab)
        else:
            lifted = self._centralizer(cd).centralize(plain_data[0])
            m_ntt = R.ntt_forward(lifted, qtab)
        if cd.parms.scheme == SchemeType.BFV and not ct_ntt:
            d_ntt = R.ntt_forward(data, qtab)
            prod = R.dyadic_broadcast_product(d_ntt, m_ntt, qtab)
            return R.ntt_inverse(prod, qtab)
        return R.dyadic_broadcast_product(data, m_ntt, qtab)

    def multiply_plain(self, ct: Ciphertext, plain: Plaintext) -> Ciphertext:
        """NTT-domain broadcast product (ref: evaluator_multiply_plain.cu)."""
        cd = self._cd(ct)
        cd.rns_tool.materialize()
        cd.qtab()
        if not cd.wide:
            cd.base_q.pack()
        rns = self._is_rns_plain(plain, cd)
        if rns and plain.parms_id is not None \
                and plain.parms_id != ct.parms_id:
            raise ValueError("[Evaluator.multiply_plain] plaintext level "
                             "mismatch (mod_switch_plain_to first)")
        if not rns and cd.parms.scheme != SchemeType.CKKS:
            self._centralizer(cd)  # materialize before tracing
        plain_ntt = bool(plain.is_ntt_form)
        ct_ntt = bool(ct.is_ntt_form)
        key = f"mplain{int(rns)}{int(plain_ntt)}{int(ct_ntt)}"
        fn = self._jit(cd, key, lambda: (
            lambda d, p: self._multiply_plain_impl(
                cd, d, p, rns, plain_ntt, ct_ntt)))
        out = ct.clone()
        out.data = fn(ct.data, plain.data)
        if cd.parms.scheme == SchemeType.CKKS:
            out.scale = ct.scale * plain.scale
        return out

    # ==================================================================
    # multiply (ref: evaluator.cu:29-366)
    # ==================================================================
    def multiply(self, ct1: Ciphertext, ct2: Ciphertext) -> Ciphertext:
        self._check_same(ct1, ct2, "multiply")
        cd = self._cd(ct1)
        scheme = cd.parms.scheme
        if scheme == SchemeType.BFV:
            return self._bfv_multiply(ct1, ct2, cd)
        qtab = cd.qtab()
        out = ct1.clone()
        out.data = R.dyadic_convolute(ct1.data, ct2.data, qtab)
        if scheme == SchemeType.CKKS:
            out.scale = ct1.scale * ct2.scale
        else:  # BGV (ref: evaluator.cu:146 correction-factor bookkeeping)
            t = cd.parms.plain_modulus.value
            out.correction_factor = ct1.correction_factor * ct2.correction_factor % t
        return out

    def square(self, ct: Ciphertext) -> Ciphertext:
        cd = self._cd(ct)
        if cd.parms.scheme == SchemeType.BFV:
            return self._bfv_multiply(ct, ct, cd)
        qtab = cd.qtab()
        out = ct.clone()
        out.data = R.dyadic_square(ct.data, qtab)
        if cd.parms.scheme == SchemeType.CKKS:
            out.scale = ct.scale * ct.scale
        else:
            t = cd.parms.plain_modulus.value
            out.correction_factor = ct.correction_factor ** 2 % t
        return out

    def _bfv_multiply(self, ct1: Ciphertext, ct2: Ciphertext, cd: ContextData) -> Ciphertext:
        """BEHZ 8-step multiply (ref: evaluator.cu:29-117)."""
        if ct1.is_ntt_form or ct2.is_ntt_form:
            raise ValueError("[Evaluator.multiply] BFV operands must be coeff form")
        square = ct1 is ct2
        # materialize lazy tables before tracing (tracer-leak safety)
        cd.rns_tool.materialize()
        cd.qtab()

        def builder():
            if square:
                return lambda x: self.bfv_multiply_impl(cd, x, None)
            return lambda x1, x2: self.bfv_multiply_impl(cd, x1, x2)

        tag = "bfv_square" if square else "bfv_multiply"
        fn = self._jit(
            cd,
            f"{tag}:{_bfv_bconv_mode()}:{_rns_base.get_bconv_backend()}",
            builder)
        res = fn(ct1.data) if square else fn(ct1.data, ct2.data)
        out = ct1.clone()
        out.data = res
        out.seed = None
        return out

    def bfv_multiply_impl(self, cd: ContextData, x1: jnp.ndarray,
                          x2: jnp.ndarray | None) -> jnp.ndarray:
        """Pure traceable BEHZ multiply on raw (..., size, [2,] L, n) arrays;
        x2=None squares x1.  Shared by the jitted per-level kernel and the
        batched/parallel composites (parallel/batched.py)."""
        tool = cd.rns_tool
        qtab = cd.qtab()
        btab = tool.bsk_ntt.pack()
        t = cd.parms.plain_modulus.value
        mode = _bfv_bconv_mode()

        def prep(x):
            x_q = R.ntt_forward(x, qtab)                    # step 3 (q)
            if mode == "hps":
                x_b = tool.fast_b_conv_hps(x)               # HPS lift
            else:
                x_b = tool.fast_b_conv_m_tilde_sm_mrq(x)    # steps 1-2
            return x_q, R.ntt_forward(x_b, btab)            # step 3 (Bsk)

        a_q, a_b = prep(x1)
        if x2 is None:
            d_q, d_b = R.dyadic_square(a_q, qtab), R.dyadic_square(a_b, btab)
        else:
            b_q, b_b = prep(x2)
            d_q = R.dyadic_convolute(a_q, b_q, qtab)        # step 4
            d_b = R.dyadic_convolute(a_b, b_b, btab)
        d_q = R.ntt_inverse(d_q, qtab)                      # step 5
        d_b = R.ntt_inverse(d_b, btab)
        if _rns_base.get_bconv_backend() == "vpu":
            # ×t (BEHZ "multiply by t") folds into fast_floor's constant
            # tables — bit-identical output, one full modmul pass saved
            return tool.fast_floor_scale_fast_b_conv_sk(d_q, d_b)
        d_q = R.multiply_scalar(d_q, t, qtab)                   # x t
        d_b = R.multiply_scalar(d_b, t, btab)
        return tool.fast_floor_fast_b_conv_sk(d_q, d_b)         # steps 6-8

    # ==================================================================
    # keyswitching (ref: evaluator_keyswitching_core.cu:757)
    # ==================================================================
    def _switch_tables(self, cd: ContextData):
        """Cached per-level tables for the (level moduli + special prime)
        output base and the special-prime division constants."""
        cache = getattr(cd, "_switch_cache", None)
        if cache is not None:
            return cache
        key_cd = self.context.key_context_data()
        L = cd.coeff_modulus_size
        L_key = key_cd.coeff_modulus_size
        idx = list(range(L)) + [L_key - 1]
        ktab = key_cd.qtab()
        otab = NTT.take_tables(ktab, idx)
        q_sp = key_cd.parms.coeff_modulus[-1].value
        q_values = [m.value for m in cd.parms.coeff_modulus]
        inv = [numth.invert_mod(q_sp % q, q) for q in q_values]
        if cd.wide:
            from ..rns.rns_base import _pair_cols
            from ..rns.rns_tool64 import _ratio_cols

            o_values = [q_values[i] if i < L else q_sp for i in range(L + 1)]
            cache = dict(
                idx=idx,
                otab=otab,
                sp_tab=NTT.slice_tables(ktab, L_key - 1, L_key),
                q_sp=q_sp,
                o_cols=_pair_cols([key_cd.parms.coeff_modulus[i].value
                                   for i in idx]),
                o_ratio=_ratio_cols([key_cd.parms.coeff_modulus[i].value
                                     for i in idx]),
                sp_cols=_pair_cols([q_sp]),
                sp_ratio=_ratio_cols([q_sp]),
                sp_half_cols=_pair_cols([q_sp >> 1]),
                sp_half_mod_q=_pair_cols([(q_sp >> 1) % q for q in q_values]),
                sp_mod_q=_pair_cols([q_sp % q for q in q_values]),
                inv_sp_mod_q=_pair_cols(inv),
                inv_sp_mod_q_shoup=_pair_cols(
                    [(v << 64) // q for v, q in zip(inv, q_values)]),
                q_cols=_pair_cols(q_values),
                q_ratio=_ratio_cols(q_values),
                max_terms=W.dot_mod64_terms(max(o_values)),
            )
            if cd.parms.scheme == SchemeType.BGV:
                t = cd.parms.plain_modulus.value
                cache["inv_t_mod_sp"] = _pair_cols(
                    [numth.invert_mod(t % q_sp, q_sp)])
            cd._switch_cache = cache
            return cache
        inv_np = np.array(inv, np.uint32)
        inv_sh = np.array(
            [(int(i) << 32) // q for i, q in zip(inv, q_values)], np.uint64
        ).astype(np.uint32)
        cache = dict(
            idx=idx,
            otab=otab,
            sp_tab=NTT.slice_tables(ktab, L_key - 1, L_key),
            q_sp=q_sp,
            sp_half=U.u32(q_sp >> 1),
            sp_half_mod_q=jnp.asarray(
                np.array([(q_sp >> 1) % q for q in q_values], np.uint32)
            )[:, None],
            inv_sp_mod_q=jnp.asarray(inv_np)[:, None],
            inv_sp_mod_q_shoup=jnp.asarray(inv_sh)[:, None],
            sp_mod_q=jnp.asarray(
                np.array([q_sp % q for q in q_values], np.uint32)
            )[:, None],
        )
        if cd.parms.scheme == SchemeType.BGV:
            # BGV keyswitch divides by q_sp while preserving the mod-t payload
            # (ref: evaluator_keyswitching_core.cu ski_util7 t-correction)
            t = cd.parms.plain_modulus.value
            from .modulus import Modulus as _M

            spm = _M(q_sp)
            cache["inv_t_mod_sp"] = U.u32(numth.invert_mod(t % q_sp, q_sp))
            cache["sp_ratio_hi"] = U.u32(spm.ratio64_hi)
            cache["sp_ratio_lo"] = U.u32(spm.ratio64_lo)
        cd._switch_cache = cache
        return cache

    def _switch_key(self, cd: ContextData, target_coeff: jnp.ndarray,
                    keys: jnp.ndarray, out_ntt: bool) -> jnp.ndarray:
        self._switch_tables(cd)  # materialize before tracing
        cd.qtab()
        fn = self._jit(
            cd, f"switch_key_ntt{int(out_ntt)}",
            lambda: (lambda tgt, k: self._switch_key_impl(cd, tgt, k, out_ntt)),
        )
        return fn(target_coeff, keys)

    def _switch_key_impl(self, cd: ContextData, target_coeff: jnp.ndarray,
                         keys: jnp.ndarray, out_ntt: bool) -> jnp.ndarray:
        """Core keyswitch: target (..., [2,] L, n) coeff-domain poly, keys
        (decomp_key, 2, [2,] L_key, n) NTT @ key level -> (..., 2, [2,] L, n);
        arbitrary leading batch axes broadcast
        (ref: evaluator_keyswitching_core.cu, fgk/switch_key.cu)."""
        if cd.wide:
            return self._switch_key_impl_wide(cd, target_coeff, keys, out_ntt)
        sw = self._switch_tables(cd)
        L = cd.coeff_modulus_size
        otab = sw["otab"]
        O = L + 1
        n = target_coeff.shape[-1]
        lead = target_coeff.shape[:-2]
        # digits: D[..., i, j, :] = [target_i] as a LAZY residue mod p_j —
        # all fast-path primes live in [2^28, 2^30), so a digit < q_i < 2*p_j
        # is already a valid [0, 2q) lazy NTT input; the explicit Barrett
        # reduction the reference needs (fgk/switch_key.cu set_accumulate)
        # is skipped entirely
        D = jnp.broadcast_to(target_coeff[..., :, None, :], lead + (L, O, n))
        D = NTT.ntt_forward(D, otab)
        # inner product with keys over decomposition primes: wide (hi, lo)
        # accumulation, one Barrett per output (ref: kernel_ski_util1's
        # 128-bit lazy accumulation)
        keys_sel = keys[:L][:, :, jnp.asarray(sw["idx"]), :]  # (L, 2, O, n)
        q = otab["q"][:, None]
        pairs = [(D[..., i, None, :, :], keys_sel[i]) for i in range(L)]
        acc = U.dot_mod(pairs, q, otab["ratio_hi"][:, None],
                        otab["ratio_lo"][:, None])
        # acc: (..., 2, O, n); divide by the special prime (NTT-domain)
        sp_tab = sw["sp_tab"]
        last = NTT.ntt_inverse(acc[..., :, L:, :], sp_tab)     # (..., 2, 1, n)
        qtab = cd.qtab()
        lq = qtab["q"][:, None]
        lhi = qtab["ratio_hi"][:, None]
        llo = qtab["ratio_lo"][:, None]
        body_shape = lead + (2, L, n)
        if cd.parms.scheme == SchemeType.BGV:
            # delta ≡ last (mod q_sp), ≡ 0 (mod t): delta = t * centered([last * t^-1]_{q_sp})
            t_val = cd.parms.plain_modulus.value
            h = U.mul_mod(last, sw["inv_t_mod_sp"], U.u32(sw["q_sp"]),
                          sw["sp_ratio_hi"], sw["sp_ratio_lo"])
            h_b = jnp.broadcast_to(h, body_shape)
            h_mod = U.barrett_reduce_u32(h_b, lq, lhi, llo)
            h_c = jnp.where(h_b > U.U32(sw["q_sp"] >> 1),
                            U.sub_mod(h_mod, sw["sp_mod_q"], lq), h_mod)
            tmp = U.mul_mod(h_c, U.u32(t_val), lq, lhi, llo)
        else:
            last_plus = U.add_mod(last, sw["sp_half"], U.u32(sw["q_sp"]))
            tmp = U.barrett_reduce_u32(
                jnp.broadcast_to(last_plus, body_shape), lq, lhi, llo
            )
            tmp = U.sub_mod(tmp, sw["sp_half_mod_q"], lq)
        if out_ntt:
            tmp = NTT.ntt_forward(tmp, qtab)
            diff = U.sub_mod(acc[..., :, :L, :], tmp, lq)
            return U.shoup_mul(diff, sw["inv_sp_mod_q"], sw["inv_sp_mod_q_shoup"], lq)
        body = NTT.ntt_inverse(acc[..., :, :L, :], qtab)
        diff = U.sub_mod(body, tmp, lq)
        return U.shoup_mul(diff, sw["inv_sp_mod_q"], sw["inv_sp_mod_q_shoup"], lq)

    def _switch_key_impl_wide(self, cd: ContextData, target_coeff: jnp.ndarray,
                              keys: jnp.ndarray, out_ntt: bool) -> jnp.ndarray:
        """Wide-width keyswitch: target (..., 2, L, n) pair array, keys
        (decomp_key, 2, 2, L_key, n) -> (..., 2, 2, L, n).  Digits ARE
        Barrett-reduced per output prime — wide prime sets mix sizes, so the
        fast path's q_i < 2*p_j lazy-digit shortcut does not apply
        (ref: fgk/switch_key.cu set_accumulate does the same reduction)."""
        from ..ops import ntt64 as N64

        sw = self._switch_tables(cd)
        L = cd.coeff_modulus_size
        otab = sw["otab"]
        O = L + 1
        n = target_coeff.shape[-1]
        lead = target_coeff.shape[:-3]
        th, tl = R.hi_lo(target_coeff)
        dh = jnp.broadcast_to(th[..., :, None, :], lead + (L, O, n))
        dl = jnp.broadcast_to(tl[..., :, None, :], lead + (L, O, n))
        oh, ol = sw["o_cols"]
        Dh, Dl = W.barrett_reduce_u64(dh, dl, oh, ol, *sw["o_ratio"])
        Dh, Dl = N64.ntt_forward64(Dh, Dl, otab)
        keys_sel = keys[:L][:, :, :, jnp.asarray(sw["idx"]), :]  # (L,2,2,O,n)
        pairs = [
            ((Dh[..., i, None, :, :], Dl[..., i, None, :, :]),
             (keys_sel[i][:, 0], keys_sel[i][:, 1]))
            for i in range(L)
        ]
        ah, al = W.dot_mod64(pairs, oh, ol, *sw["o_ratio"], sw["max_terms"])
        # ah/al: (..., 2, O, n); divide by the special prime (NTT-domain)
        lh, ll = N64.ntt_inverse64(ah[..., L:, :], al[..., L:, :], sw["sp_tab"])
        qtab = cd.qtab()
        qh, ql = sw["q_cols"]
        body_shape = lead + (2, L, n)
        if cd.parms.scheme == SchemeType.BGV:
            t_val = cd.parms.plain_modulus.value
            hh, hl = W.mul_mod64(lh, ll, sw["inv_t_mod_sp"][0],
                                 sw["inv_t_mod_sp"][1], *sw["sp_cols"],
                                 *sw["sp_ratio"])
            bh = jnp.broadcast_to(hh, body_shape)
            bl = jnp.broadcast_to(hl, body_shape)
            mh, ml = W.barrett_reduce_u64(bh, bl, qh, ql, *sw["q_ratio"])
            ch, cl = W.sub_mod64(mh, ml, sw["sp_mod_q"][0], sw["sp_mod_q"][1],
                                 qh, ql)
            sph = (sw["q_sp"] >> 1) + 1  # h > q_sp/2 (centering)
            big = W.geq64(bh, bl, U.U32(sph >> 32), U.U32(sph & 0xFFFFFFFF))
            hch = jnp.where(big, ch, mh)
            hcl = jnp.where(big, cl, ml)
            th_, tl_ = W.mul_mod64(hch, hcl, U.U32(0), U.U32(t_val), qh, ql,
                                   *sw["q_ratio"])
        else:
            ph, pl = W.add_mod64(lh, ll, sw["sp_half_cols"][0],
                                 sw["sp_half_cols"][1], *sw["sp_cols"])
            bh = jnp.broadcast_to(ph, body_shape)
            bl = jnp.broadcast_to(pl, body_shape)
            th_, tl_ = W.barrett_reduce_u64(bh, bl, qh, ql, *sw["q_ratio"])
            th_, tl_ = W.sub_mod64(th_, tl_, sw["sp_half_mod_q"][0],
                                   sw["sp_half_mod_q"][1], qh, ql)
        if out_ntt:
            th_, tl_ = N64.ntt_forward64(th_, tl_, qtab)
            dh_, dl_ = W.sub_mod64(ah[..., :L, :], al[..., :L, :], th_, tl_,
                                   qh, ql)
        else:
            bh_, bl_ = N64.ntt_inverse64(ah[..., :L, :], al[..., :L, :], qtab)
            dh_, dl_ = W.sub_mod64(bh_, bl_, th_, tl_, qh, ql)
        res = W.shoup_mul64(dh_, dl_, sw["inv_sp_mod_q"][0],
                            sw["inv_sp_mod_q"][1], sw["inv_sp_mod_q_shoup"][0],
                            sw["inv_sp_mod_q_shoup"][1], qh, ql)
        # (..., 2 polys, L, n) hi/lo -> (..., 2 polys, 2, L, n)
        return safe_stack([res[0], res[1]], axis=-3)

    def relinearize(self, ct: Ciphertext, rlk: RelinKeys) -> Ciphertext:
        """size-s -> size-2: switch every poly c_k (k >= 2) with the key for
        s^k and fold into (c0, c1) (ref: evaluator_keyswitching.cu:96
        relinearize_inplace_internal, arbitrary destination_size=2)."""
        if ct.size < 3:
            raise ValueError("[Evaluator.relinearize] ciphertext size must be >= 3")
        cd = self._cd(ct)
        qtab = cd.qtab()
        acc = None
        for k in range(2, ct.size):
            target = ct.data[k]
            if ct.is_ntt_form:
                target = R.ntt_inverse(target, qtab)
            sw = self._switch_key(cd, target, rlk.key(k), out_ntt=ct.is_ntt_form)
            acc = sw if acc is None else R.add(acc, sw, qtab)
        out = ct.clone()
        out.data = R.add(ct.data[:2], acc, qtab)
        return out

    def apply_keyswitching(self, ct: Ciphertext, ksk: KSwitchKeys) -> Ciphertext:
        """Re-encrypt a size-2 ct to the key holder's secret
        (ref: evaluator_keyswitching.cu:11)."""
        if ct.size != 2:
            raise ValueError("[Evaluator.apply_keyswitching] needs size-2 ct")
        cd = self._cd(ct)
        target = ct.data[1]
        if ct.is_ntt_form:
            target = R.ntt_inverse(target, cd.qtab())
        sw = self._switch_key(cd, target, ksk.get(0), out_ntt=ct.is_ntt_form)
        out = ct.clone()
        c0 = R.add(sw[0], ct.data[0], cd.qtab())
        out.data = safe_stack([c0, sw[1]])
        return out

    # -- galois / rotations (ref: evaluator_keyswitching.cu:179-285) --------
    def _apply_galois_impl(self, cd: ContextData, tool, data, keys,
                           galois_elt: int, ntt_form: bool):
        """Pure traceable galois + keyswitch on raw arrays (jitted per
        (level, element, form); ref: evaluator_keyswitching.cu:179)."""
        qtab = cd.qtab()
        if ntt_form:
            c0g = tool.apply_ntt(data[0], galois_elt)
            c1g = tool.apply_ntt(data[1], galois_elt)
            target = R.ntt_inverse(c1g, qtab)
        else:
            c0g = tool.apply_coeff(data[0], galois_elt, qtab)
            target = tool.apply_coeff(data[1], galois_elt, qtab)
        sw = self._switch_key_impl(cd, target, keys, out_ntt=ntt_form)
        # sw has the poly axis after any leading batch axes: index it from
        # the end so batched (pack_rlwe_ciphertexts_batched) data works too
        pax = R.poly_axis(qtab)
        sw0 = jnp.take(sw, 0, axis=pax)
        sw1 = jnp.take(sw, 1, axis=pax)
        return safe_stack([R.add(sw0, c0g, qtab), sw1])

    def apply_galois(self, ct: Ciphertext, galois_elt: int,
                     glk: GaloisKeys) -> Ciphertext:
        if ct.size != 2:
            raise ValueError("[Evaluator.apply_galois] needs size-2 ct")
        cd = self._cd(ct)
        tool = GaloisTool.for_context(cd)
        ntt_form = bool(ct.is_ntt_form)
        # materialize lazy tables before tracing (tracer-leak safety)
        self._switch_tables(cd)
        cd.qtab()
        if ntt_form and galois_elt not in tool._ntt_tables:
            tool._ntt_tables[galois_elt] = tool._build_ntt(galois_elt)
        if not ntt_form and galois_elt not in tool._coeff_tables:
            tool._coeff_tables[galois_elt] = tool._build_coeff(galois_elt)
        fn = self._jit(cd, f"galois{galois_elt}{int(ntt_form)}", lambda: (
            lambda d, k: self._apply_galois_impl(cd, tool, d, k, galois_elt,
                                                 ntt_form)))
        out = ct.clone()
        out.data = fn(ct.data, glk.key(galois_elt))
        return out

    def _rotate_internal(self, ct: Ciphertext, steps: int, glk: GaloisKeys) -> Ciphertext:
        if steps == 0:
            return ct.clone()
        cd = self._cd(ct)
        n = cd.parms.poly_modulus_degree
        elt = GaloisTool.get_element_from_step(steps, n)
        if glk.has(elt):
            return self.apply_galois(ct, elt, glk)
        # NAF-decompose the step (ref: evaluator_keyswitching.cu:276-292)
        out = ct
        for s in numth.naf(steps):
            out = self._rotate_internal(out, s, glk)
        return out

    def rotate_rows(self, ct: Ciphertext, steps: int, glk: GaloisKeys) -> Ciphertext:
        return self._rotate_internal(ct, steps, glk)

    def rotate_columns(self, ct: Ciphertext, glk: GaloisKeys) -> Ciphertext:
        cd = self._cd(ct)
        n = cd.parms.poly_modulus_degree
        return self.apply_galois(ct, GaloisTool.conjugate_element(n), glk)

    def rotate_vector(self, ct: Ciphertext, steps: int, glk: GaloisKeys) -> Ciphertext:
        """CKKS slot rotation."""
        return self._rotate_internal(ct, steps, glk)

    def complex_conjugate(self, ct: Ciphertext, glk: GaloisKeys) -> Ciphertext:
        cd = self._cd(ct)
        n = cd.parms.poly_modulus_degree
        return self.apply_galois(ct, GaloisTool.conjugate_element(n), glk)

    # ==================================================================
    # modswitch / rescale (ref: evaluator_modswitch.cu)
    # ==================================================================
    def mod_switch_to_next(self, ct: Ciphertext) -> Ciphertext:
        cd = self._cd(ct)
        if cd.is_last():
            raise ValueError("[Evaluator.mod_switch_to_next] already at last level")
        nxt = cd.next
        scheme = cd.parms.scheme
        cd.rns_tool.materialize()
        cd.qtab()
        out = ct.clone()
        if scheme == SchemeType.BFV:
            fn = self._jit(cd, "modswitch", lambda: (
                lambda d: cd.rns_tool.divide_and_round_q_last(d)))
            out.data = fn(ct.data)
        elif scheme == SchemeType.CKKS:
            # CKKS modswitch without rescale = drop the last limb
            out.data = ct.data[..., :-1, :]
        else:  # BGV
            fn = self._jit(cd, "modswitch", lambda: (
                lambda d: cd.rns_tool.mod_t_and_divide_q_last_ntt(
                    d, cd.qtab())))
            out.data = fn(ct.data)
            t = cd.parms.plain_modulus.value
            q_last = cd.parms.coeff_modulus[-1].value
            out.correction_factor = (
                ct.correction_factor * numth.invert_mod(q_last % t, t) % t
            )
        out.parms_id = nxt.parms_id
        return out

    def rescale_to_next(self, ct: Ciphertext) -> Ciphertext:
        """CKKS rescale (ref: evaluator_modswitch.cu:445)."""
        cd = self._cd(ct)
        if cd.parms.scheme != SchemeType.CKKS:
            raise ValueError("[Evaluator.rescale_to_next] CKKS only")
        if cd.is_last():
            raise ValueError("[Evaluator.rescale_to_next] already at last level")
        cd.rns_tool.materialize()
        cd.qtab()
        out = ct.clone()
        fn = self._jit(cd, "rescale", lambda: (
            lambda d: cd.rns_tool.divide_and_round_q_last_ntt(d, cd.qtab())))
        out.data = fn(ct.data)
        out.scale = ct.scale / cd.parms.coeff_modulus[-1].value
        out.parms_id = cd.next.parms_id
        return out

    def rescale_to(self, ct: Ciphertext, parms_id: ParmsID) -> Ciphertext:
        """Rescale down the chain until parms_id (ref: evaluator.h
        rescale_to)."""
        target = self.context.get_context_data(parms_id)
        cur = ct
        while cur.parms_id != parms_id:
            cd = self._cd(cur)
            # chain_index grows down the chain; an at-or-above target is
            # unreachable by rescaling
            if cd.chain_index >= target.chain_index:
                raise ValueError("[Evaluator.rescale_to] target at or above "
                                 "current level")
            cur = self.rescale_to_next(cur)
        return cur

    def mod_switch_to(self, ct: Ciphertext, parms_id: ParmsID) -> Ciphertext:
        """Walk the chain (ref: evaluator_modswitch.cu:379)."""
        target = self.context.get_context_data(parms_id)
        cur = ct
        while cur.parms_id != parms_id:
            cd = self._cd(cur)
            if cd.chain_index >= target.chain_index and cd.parms_id != parms_id:
                if cd.is_last():
                    raise ValueError("[Evaluator.mod_switch_to] cannot reach target")
            cur = self.mod_switch_to_next(cur)
        return cur

    def mod_switch_plain_to_next(self, plain: Plaintext) -> Plaintext:
        """CKKS NTT-form plaintext: drop last limb (ref: mod_switch_drop_to_plain)."""
        cd = self._cd(plain)
        out = plain.clone()
        out.data = plain.data[..., :-1, :]
        out.parms_id = cd.next.parms_id
        return out

    # ==================================================================
    # NTT transforms (ref: evaluator_transform_ntt.cu)
    # ==================================================================
    def transform_to_ntt(self, ct: Ciphertext) -> Ciphertext:
        if ct.is_ntt_form:
            raise ValueError("[Evaluator.transform_to_ntt] already NTT form")
        cd = self._cd(ct)
        out = ct.clone()
        out.data = R.ntt_forward(ct.data, cd.qtab())
        out.is_ntt_form = True
        return out

    def transform_from_ntt(self, ct: Ciphertext) -> Ciphertext:
        if not ct.is_ntt_form:
            raise ValueError("[Evaluator.transform_from_ntt] not NTT form")
        cd = self._cd(ct)
        out = ct.clone()
        out.data = R.ntt_inverse(ct.data, cd.qtab())
        out.is_ntt_form = False
        return out

    def transform_plain_to_ntt(self, plain: Plaintext, parms_id: ParmsID) -> Plaintext:
        """BFV/BGV mod-t plaintext -> RNS NTT form at a level; RNS-form
        plaintexts (CKKS, bfv_scale_up/centralize outputs) are NTT'd
        directly (ref: evaluator_transform_ntt.cu:35)."""
        cd = self.context.get_context_data(parms_id)
        if plain.is_ntt_form:
            raise ValueError("[Evaluator.transform_plain_to_ntt] already NTT")
        if cd.parms.scheme == SchemeType.CKKS or self._is_rns_plain(plain, cd):
            return Plaintext(R.ntt_forward(plain.data, cd.qtab()),
                             parms_id=parms_id, is_ntt_form=True,
                             scale=plain.scale)
        lifted = self._centralizer(cd).centralize(plain.data[0])
        return Plaintext(R.ntt_forward(lifted, cd.qtab()), parms_id=parms_id,
                         is_ntt_form=True, scale=plain.scale)

    # ==================================================================
    # plaintext utilities (ref: evaluator.h bfv_scale_up/bfv_centralize,
    # transform_plain_from_ntt, apply_galois_plain, mod_switch_plain_to)
    # ==================================================================
    def bfv_scale_up(self, plain: Plaintext, parms_id: ParmsID) -> Plaintext:
        """mod-t plaintext -> RNS scale-up form round(m*Q/t)."""
        cd = self.context.get_context_data(parms_id)
        return Plaintext(cd.scaler.scale_up(plain.data[0]), parms_id=parms_id)

    def bfv_centralize(self, plain: Plaintext, parms_id: ParmsID) -> Plaintext:
        """mod-t plaintext -> RNS centered-lift form."""
        cd = self.context.get_context_data(parms_id)
        return Plaintext(self._centralizer(cd).centralize(plain.data[0]),
                         parms_id=parms_id)

    def transform_plain_from_ntt(self, plain: Plaintext) -> Plaintext:
        """(ref: evaluator_transform_ntt.cu transform_plain_from_ntt)"""
        if not plain.is_ntt_form:
            raise ValueError("[Evaluator.transform_plain_from_ntt] not NTT form")
        cd = self._cd(plain)
        return Plaintext(R.ntt_inverse(plain.data, cd.qtab()),
                         parms_id=plain.parms_id, scale=plain.scale,
                         is_ntt_form=False)

    def apply_galois_plain(self, plain: Plaintext, galois_elt: int) -> Plaintext:
        """Automorphism on a plaintext (ref: evaluator.h apply_galois_plain).
        mod-t plaintexts permute with sign mod t; RNS plaintexts per limb."""
        out = plain.clone()
        cd0 = self.context.first_context_data()
        is_mod_t = plain.parms_id == PARMS_ID_ZERO or (
            not cd0.wide and plain.coeff_modulus_size == 1)
        if is_mod_t:
            cd = cd0
            tool = GaloisTool.for_context(cd)
            t = cd.parms.plain_modulus
            ttab = {"q": jnp.asarray(np.array([t.value], dtype=np.uint32))}
            out.data = tool.apply_coeff(plain.data, galois_elt, ttab)
            return out
        cd = self._cd(plain)
        tool = GaloisTool.for_context(cd)
        if plain.is_ntt_form:
            out.data = tool.apply_ntt(plain.data, galois_elt)
        else:
            out.data = tool.apply_coeff(plain.data, galois_elt, cd.qtab())
        return out

    def mod_switch_plain_to(self, plain: Plaintext, parms_id: ParmsID) -> Plaintext:
        """Walk an NTT-form (CKKS) plaintext down the chain."""
        cur = plain
        while cur.parms_id != parms_id:
            cur = self.mod_switch_plain_to_next(cur)
        return cur

    def multiply_plain_accumulate(self, cts: list[Ciphertext],
                                  plains: list[Plaintext],
                                  accs: list[Ciphertext | None]) -> list[Ciphertext]:
        """acc_i += ct_i * plain_i (ref: evaluator.h multiply_plain_accumulate,
        the matmul inner-loop primitive)."""
        out = []
        for ct, pt, acc in zip(cts, plains, accs):
            prod = self.multiply_plain(ct, pt)
            out.append(prod if acc is None else self.add(acc, prod))
        return out

    def multiply_plain_contract(self, cts: list[list[Ciphertext]],
                                plains: list[list[Plaintext]],
                                mesh=None) -> list[list[Ciphertext]]:
        """out[b][j] = sum_i cts[b][i] * plains[i][j] — the BumbleBee matmul
        inner contraction fused into ONE jitted kernel: every input block is
        NTT'd once (not once per output block), every product-accumulate is
        a single batched elementwise pass (ref: the batched matmul inner loop,
        src/evaluator_multiply_plain.cu:356 multiply_plain_accumulate +
        src/fgk/dyadic_convolute.cu dyadic_broadcast_product_accumulate).

        mesh: optional jax.sharding.Mesh with ('data', 'limb') axes (the
        reference's --multiple-devices matmul, scripts/test_matmul.sh): the
        ciphertext-block axis shards over 'data' and the RNS limb axis over
        'limb'; GSPMD partitions the same fused kernel and inserts the limb
        collectives (tests/parallel/test_app_mesh.py)."""
        bs, is_ = len(cts), len(cts[0])
        os_ = len(plains[0])
        if len(plains) != is_:
            raise ValueError("[Evaluator.multiply_plain_contract] "
                             f"inner dims differ: {len(plains)} vs {is_}")
        ct0, p0 = cts[0][0], plains[0][0]
        cd = self._cd(ct0)
        scheme = cd.parms.scheme
        for row in cts:
            for ct in row:
                if (ct.parms_id != ct0.parms_id or ct.size != ct0.size
                        or ct.is_ntt_form != ct0.is_ntt_form
                        or ct.correction_factor != ct0.correction_factor):
                    raise ValueError("[Evaluator.multiply_plain_contract] "
                                     "ciphertexts must be uniform")
                if scheme == SchemeType.CKKS and ct.scale != ct0.scale:
                    raise ValueError("[Evaluator.multiply_plain_contract] "
                                     "ciphertext scales must match")
        for row in plains:
            for p in row:
                if p.is_ntt_form != p0.is_ntt_form or p.scale != p0.scale:
                    raise ValueError("[Evaluator.multiply_plain_contract] "
                                     "plaintexts must be uniform")
        A = jnp.stack([jnp.stack([ct.data for ct in row]) for row in cts])
        W_raw = jnp.stack([jnp.stack([p.data for p in row]) for row in plains])
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as PSpec

            # shard block rows over 'data' and RNS limbs over 'limb', each
            # only when the dimension divides (a 1-block grid replicates)
            dax = ("data" if A.shape[0] % mesh.shape["data"] == 0 else None)
            lax_ = ("limb" if A.shape[-2] % mesh.shape["limb"] == 0 else None)
            # a non-RNS plaintext (BFV mod-t plane) has no limb axis to shard
            wlax = ("limb" if W_raw.shape[-2] % mesh.shape["limb"] == 0
                    else None)
            A = jax.device_put(A, NamedSharding(mesh, PSpec(
                *([dax] + [None] * (A.ndim - 3) + [lax_, None]))))
            W_raw = jax.device_put(W_raw, NamedSharding(mesh, PSpec(
                *([None] * (W_raw.ndim - 2) + [wlax, None]))))
        qtab = cd.qtab()  # materialize before tracing
        if not cd.wide:
            cd.base_q.pack()  # BFVScaler._qtabs shares this lazy pack
        rns_form = scheme == SchemeType.CKKS or self._is_rns_plain(p0, cd)
        cent = None if rns_form else self._centralizer(cd)
        ct_ntt, p_ntt = ct0.is_ntt_form, p0.is_ntt_form

        def builder():
            def fn(A, W_raw):
                if rns_form:
                    W_ = W_raw if p_ntt else R.ntt_forward(W_raw, qtab)
                else:
                    W_ = R.ntt_forward(cent.centralize(W_raw[..., 0, :]), qtab)
                A_ntt = A if ct_ntt else R.ntt_forward(A, qtab)
                acc = None
                for i in range(is_):
                    a_i = A_ntt[:, i][:, None]       # (bs, 1, size, [2,]L, n)
                    w_i = W_[i][None, :, None]       # (1, os_, 1, [2,]L, n)
                    prod = R.dyadic_product(a_i, w_i, qtab)
                    acc = prod if acc is None else R.add(acc, prod, qtab)
                return acc if ct_ntt else R.ntt_inverse(acc, qtab)
            return fn

        fn = self._jit(cd, "mm_contract", builder)
        out_data = fn(A, W_raw)                      # (bs, os_, size, [2,]L, n)
        outs = []
        for b in range(bs):
            row = []
            for j in range(os_):
                o = ct0.clone()
                o.data = out_data[b, j]
                if scheme == SchemeType.CKKS:
                    o.scale = ct0.scale * p0.scale
                row.append(o)
            outs.append(row)
        return outs

    def translate(self, ct1: Ciphertext, ct2: Ciphertext,
                  subtract: bool = False) -> Ciphertext:
        """add or sub by flag (ref: evaluator.h translate_inplace)."""
        return self.sub(ct1, ct2) if subtract else self.add(ct1, ct2)

    def translate_plain(self, ct: Ciphertext, plain: Plaintext,
                        subtract: bool = False) -> Ciphertext:
        return self.sub_plain(ct, plain) if subtract else self.add_plain(ct, plain)

    # ==================================================================
    # misc (ref: evaluator.h inline helpers)
    # ==================================================================
    def exponentiate(self, ct: Ciphertext, power: int, rlk: RelinKeys) -> Ciphertext:
        if power < 1:
            raise ValueError("[Evaluator.exponentiate] power must be >= 1")
        result = None
        base = ct
        while power:
            if power & 1:
                result = base if result is None else self.relinearize(
                    self.multiply(result, base), rlk
                )
            power >>= 1
            if power:
                base = self.relinearize(self.square(base), rlk)
        return result

    def negacyclic_shift(self, ct: Ciphertext, shift: int) -> Ciphertext:
        cd = self._cd(ct)
        if ct.is_ntt_form:
            tmp = self.transform_from_ntt(ct)
            out = self.negacyclic_shift(tmp, shift)
            return self.transform_to_ntt(out)
        out = ct.clone()
        out.data = R.negacyclic_shift(ct.data, shift, cd.qtab())
        return out

    # ==================================================================
    # batched variants (ref: the *_batched API family, SURVEY.md §2.10;
    # here: stack ciphertext lists into one (B, size, [2,] L, n) array and
    # run the broadcast kernels once — the TPU-native replacement for the
    # reference's blockIdx.y batch dimension)
    # ==================================================================
    def _stack(self, cts: list[Ciphertext]) -> jnp.ndarray:
        return jnp.stack([ct.data for ct in cts])

    def _unstack(self, data: jnp.ndarray, proto: Ciphertext,
                 metas: list[Ciphertext] | None = None) -> list[Ciphertext]:
        out = []
        for i in range(data.shape[0]):
            ct = (metas[i] if metas else proto).clone()
            ct.data = data[i]
            ct.seed = None
            out.append(ct)
        return out

    def _translate_batched(self, cts1, cts2, subtract: bool) -> list[Ciphertext]:
        """Batched add/sub with the SAME semantics as the scalar paths:
        CKKS scale validation and BGV correction-factor balancing
        (ref: evaluator_translate.cu balance_correction_factors; the
        _batched kernels there run the same balancing per element)."""
        op = "sub_batched" if subtract else "add_batched"
        if len(cts1) != len(cts2):
            raise ValueError(f"[Evaluator.{op}] length mismatch")
        cd = self._cd(cts1[0])
        scheme = cd.parms.scheme
        for a, b in zip(cts1, cts2):
            self._check_same(a, b, op)
            if a.size != b.size:
                raise ValueError(f"[Evaluator.{op}] size mismatch")
        qtab = cd.qtab()
        x1 = self._stack(cts1)
        x2 = self._stack(cts2)
        metas = cts1
        if scheme == SchemeType.CKKS:
            for a, b in zip(cts1, cts2):
                if abs(a.scale - b.scale) > 0.5 * max(a.scale, b.scale) * 1e-9:
                    raise ValueError(f"[Evaluator.{op}] CKKS scale mismatch")
        elif scheme == SchemeType.BGV:
            t = cd.parms.plain_modulus.value
            e1, e2, fs = [], [], []
            for a, b in zip(cts1, cts2):
                f1, f2 = a.correction_factor, b.correction_factor
                g = numth.gcd(f1, f2)
                e1.append((f2 // g) % t)
                e2.append((f1 // g) % t)
                fs.append(f1 * (f2 // g) % t)
            if any(v != 1 for v in e1 + e2):
                # scalar per batch element, broadcast over (size, [2,] L, n)
                lead = (-1,) + (1,) * 3
                s1 = jnp.asarray(np.array(e1, np.uint32)).reshape(lead)
                s2 = jnp.asarray(np.array(e2, np.uint32)).reshape(lead)
                x1 = R.multiply_scalar(x1, s1, qtab)
                x2 = R.multiply_scalar(x2, s2, qtab)
            metas = []
            for a, f in zip(cts1, fs):
                m = a.clone()
                m.correction_factor = f
                metas.append(m)
        res = R.sub(x1, x2, qtab) if subtract else R.add(x1, x2, qtab)
        return self._unstack(res, cts1[0], metas)

    def add_batched(self, cts1: list[Ciphertext], cts2: list[Ciphertext]) -> list[Ciphertext]:
        return self._translate_batched(cts1, cts2, subtract=False)

    def sub_batched(self, cts1, cts2) -> list[Ciphertext]:
        return self._translate_batched(cts1, cts2, subtract=True)

    def negate_batched(self, cts) -> list[Ciphertext]:
        cd = self._cd(cts[0])
        return self._unstack(R.negate(self._stack(cts), cd.qtab()), cts[0], cts)

    def multiply_batched(self, cts1, cts2) -> list[Ciphertext]:
        if len(cts1) != len(cts2):
            raise ValueError("[Evaluator.multiply_batched] length mismatch")
        for a, b in zip(cts1, cts2):
            self._check_same(a, b, "multiply_batched")
        cd = self._cd(cts1[0])
        if cd.parms.scheme == SchemeType.BFV:
            cd.rns_tool.materialize()
            fn = self._jit(cd, "bfv_multiply_batched",
                           lambda: (lambda a, b: self.bfv_multiply_impl(cd, a, b)))
            res = fn(self._stack(cts1), self._stack(cts2))
        else:
            res = R.dyadic_convolute(self._stack(cts1), self._stack(cts2), cd.qtab())
        out = self._unstack(res, cts1[0], cts1)
        for o, a, b in zip(out, cts1, cts2):
            if cd.parms.scheme == SchemeType.CKKS:
                o.scale = a.scale * b.scale
            elif cd.parms.scheme == SchemeType.BGV:
                t = cd.parms.plain_modulus.value
                o.correction_factor = a.correction_factor * b.correction_factor % t
        return out

    def square_batched(self, cts) -> list[Ciphertext]:
        """Batched squaring via the dyadic-square fast path
        (ref: evaluator.h square_batched)."""
        if not cts:
            return []
        cd = self._cd(cts[0])
        if cd.parms.scheme == SchemeType.BFV:
            cd.rns_tool.materialize()
            fn = self._jit(cd, "bfv_square_batched",
                           lambda: (lambda a: self.bfv_multiply_impl(cd, a, None)))
            res = fn(self._stack(cts))
        else:
            res = R.dyadic_square(self._stack(cts), cd.qtab())
        out = self._unstack(res, cts[0], cts)
        for o, a in zip(out, cts):
            if cd.parms.scheme == SchemeType.CKKS:
                o.scale = a.scale * a.scale
            elif cd.parms.scheme == SchemeType.BGV:
                t = cd.parms.plain_modulus.value
                o.correction_factor = a.correction_factor ** 2 % t
        return out

    def relinearize_batched(self, cts, rlk: RelinKeys) -> list[Ciphertext]:
        if not cts:
            return []
        size = cts[0].size
        if size < 3:
            raise ValueError("[Evaluator.relinearize_batched] ciphertext "
                             "size must be >= 3")
        if any(ct.size != size for ct in cts):
            # mixed sizes cannot stack — fall back to the scalar path
            return [self.relinearize(ct, rlk) for ct in cts]
        cd = self._cd(cts[0])
        ntt_form = cts[0].is_ntt_form
        self._switch_tables(cd)
        stacked = self._stack(cts)
        qtab = cd.qtab()
        acc = None
        for k in range(2, size):
            target = stacked[:, k]
            if ntt_form:
                target = R.ntt_inverse(target, qtab)
            sw = self._switch_key(cd, target, rlk.key(k), out_ntt=ntt_form)
            acc = sw if acc is None else R.add(acc, sw, qtab)
        res = R.add(stacked[:, :2], acc, qtab)
        return self._unstack(res, cts[0], cts)

    def multiply_plain_batched(self, cts, plains) -> list[Ciphertext]:
        cd = self._cd(cts[0])
        qtab = cd.qtab()
        m_ntt = jnp.stack([self._plain_to_level(p, cd, ntt=True) for p in plains])
        m_ntt = m_ntt[:, None]  # insert poly axis after the batch axis
        if cd.parms.scheme == SchemeType.BFV and not cts[0].is_ntt_form:
            ct_ntt = R.ntt_forward(self._stack(cts), qtab)
            prod = R.dyadic_product(ct_ntt, m_ntt, qtab)
            res = R.ntt_inverse(prod, qtab)
        else:
            res = R.dyadic_product(self._stack(cts), m_ntt, qtab)
        out = self._unstack(res, cts[0], cts)
        if cd.parms.scheme == SchemeType.CKKS:
            for o, c, p in zip(out, cts, plains):
                o.scale = c.scale * p.scale
        return out

    def mod_switch_to_next_batched(self, cts) -> list[Ciphertext]:
        return [self.mod_switch_to_next(ct) for ct in cts]

    def mod_switch_to_batched(self, cts, parms_id: ParmsID) -> list[Ciphertext]:
        return [self.mod_switch_to(ct, parms_id) for ct in cts]

    def rescale_to_next_batched(self, cts) -> list[Ciphertext]:
        return [self.rescale_to_next(ct) for ct in cts]

    # -- drop-to family (ref: evaluator_modswitch.cu:173
    #    mod_switch_drop_to_internal: copy the limb prefix, no scaling) ------
    def _check_drop_target(self, cd: ContextData, parms_id: ParmsID,
                           op: str) -> ContextData:
        target = self.context.get_context_data(parms_id)
        if target.chain_index < cd.chain_index:
            raise ValueError(f"[Evaluator.{op}] target level above the "
                             "ciphertext's level")
        if list(target.base_q.values) != list(cd.base_q.values[: target.base_q.size]):
            raise ValueError(f"[Evaluator.{op}] target is not on this chain")
        return target

    def _check_scale_bound(self, scale: float, target: ContextData, op: str):
        """(ref: evaluator_utils.h:307 is_scale_within_bounds)."""
        if target.parms.scheme == SchemeType.CKKS:
            bound = target.base_q.prod.bit_length()
        else:
            bound = target.parms.plain_modulus.value.bit_length()
        import math
        if scale <= 0 or math.log2(scale) >= bound:
            raise ValueError(f"[Evaluator.{op}] scale out of bounds for the "
                             f"target level (2^{bound})")

    def mod_switch_drop_to(self, ct: Ciphertext, parms_id: ParmsID) -> Ciphertext:
        """Drop limbs down to `parms_id` without scaling (CKKS mod-switch;
        ref: evaluator_modswitch.cu:173)."""
        cd = self._cd(ct)
        if cd.parms.scheme == SchemeType.CKKS and not ct.is_ntt_form:
            raise ValueError("[Evaluator.mod_switch_drop_to] CKKS ct must be "
                             "in NTT form")
        target = self._check_drop_target(cd, parms_id, "mod_switch_drop_to")
        if cd.parms.scheme == SchemeType.CKKS:
            self._check_scale_bound(ct.scale, target, "mod_switch_drop_to")
        out = ct.clone()
        out.data = ct.data[..., : target.base_q.size, :]
        out.parms_id = parms_id
        return out

    def mod_switch_drop_to_plain(self, plain: Plaintext,
                                 parms_id: ParmsID) -> Plaintext:
        """(ref: evaluator_modswitch.cu mod_switch_drop_to_plain_internal)."""
        if not plain.is_ntt_form:
            raise ValueError("[Evaluator.mod_switch_drop_to_plain] plaintext "
                             "must be in NTT form")
        cd = self._cd(plain)
        target = self._check_drop_target(cd, parms_id,
                                         "mod_switch_drop_to_plain")
        out = plain.clone()
        out.data = plain.data[..., : target.base_q.size, :]
        out.parms_id = parms_id
        return out

    def mod_switch_drop_to_batched(self, cts, parms_id: ParmsID) -> list[Ciphertext]:
        return [self.mod_switch_drop_to(ct, parms_id) for ct in cts]

    # -- batched galois / keyswitching (true stacking: one gather + one
    #    batched keyswitch per call, ref: evaluator.h apply_galois_batched,
    #    rotate_*_batched, apply_keyswitching_batched) ----------------------
    def apply_galois_batched(self, cts, galois_elt: int,
                             glk: GaloisKeys) -> list[Ciphertext]:
        if not cts:
            return []
        if any(ct.size != 2 for ct in cts):
            raise ValueError("[Evaluator.apply_galois_batched] needs size-2 cts")
        cd = self._cd(cts[0])
        for ct in cts[1:]:
            self._check_same(cts[0], ct, "apply_galois_batched")
        tool = GaloisTool.for_context(cd)
        ntt_form = bool(cts[0].is_ntt_form)
        # materialize lazy tables before tracing (tracer-leak safety)
        self._switch_tables(cd)
        cd.qtab()
        if ntt_form and galois_elt not in tool._ntt_tables:
            tool._ntt_tables[galois_elt] = tool._build_ntt(galois_elt)
        if not ntt_form and galois_elt not in tool._coeff_tables:
            tool._coeff_tables[galois_elt] = tool._build_coeff(galois_elt)

        def impl(stacked, keys):
            qtab = cd.qtab()
            pax = R.poly_axis(qtab)
            c0 = jnp.take(stacked, 0, axis=pax)
            c1 = jnp.take(stacked, 1, axis=pax)
            if ntt_form:
                c0g = tool.apply_ntt(c0, galois_elt)
                target = R.ntt_inverse(tool.apply_ntt(c1, galois_elt), qtab)
            else:
                c0g = tool.apply_coeff(c0, galois_elt, qtab)
                target = tool.apply_coeff(c1, galois_elt, qtab)
            sw = self._switch_key_impl(cd, target, keys, out_ntt=ntt_form)
            sw0 = jnp.take(sw, 0, axis=pax)
            sw1 = jnp.take(sw, 1, axis=pax)
            return safe_stack([R.add(sw0, c0g, qtab), sw1], axis=pax)

        fn = self._jit(cd, f"galoisb{galois_elt}{int(ntt_form)}",
                       lambda: impl)
        res = fn(self._stack(cts), glk.key(galois_elt))
        return self._unstack(res, cts[0], cts)

    def _rotate_internal_batched(self, cts, steps: int, glk: GaloisKeys):
        if steps == 0:
            return [ct.clone() for ct in cts]
        cd = self._cd(cts[0])
        n = cd.parms.poly_modulus_degree
        elt = GaloisTool.get_element_from_step(steps, n)
        if glk.has(elt):
            return self.apply_galois_batched(cts, elt, glk)
        out = cts
        for s in numth.naf(steps):
            out = self._rotate_internal_batched(out, s, glk)
        return out

    def rotate_rows_batched(self, cts, steps: int, glk: GaloisKeys):
        return self._rotate_internal_batched(cts, steps, glk)

    def rotate_vector_batched(self, cts, steps: int, glk: GaloisKeys):
        return self._rotate_internal_batched(cts, steps, glk)

    def rotate_columns_batched(self, cts, glk: GaloisKeys):
        if not cts:
            return []
        n = self._cd(cts[0]).parms.poly_modulus_degree
        return self.apply_galois_batched(
            cts, GaloisTool.conjugate_element(n), glk)

    complex_conjugate_batched = rotate_columns_batched

    def apply_keyswitching_batched(self, cts, ksk: KSwitchKeys):
        if not cts:
            return []
        if any(ct.size != 2 for ct in cts):
            raise ValueError("[Evaluator.apply_keyswitching_batched] needs "
                             "size-2 cts")
        cd = self._cd(cts[0])
        qtab = cd.qtab()
        pax = R.poly_axis(qtab)
        stacked = self._stack(cts)
        target = jnp.take(stacked, 1, axis=pax)
        if cts[0].is_ntt_form:
            target = R.ntt_inverse(target, qtab)
        sw = self._switch_key(cd, target, ksk.get(0),
                              out_ntt=cts[0].is_ntt_form)
        sw0 = jnp.take(sw, 0, axis=pax)
        sw1 = jnp.take(sw, 1, axis=pax)
        c0 = R.add(sw0, jnp.take(stacked, 0, axis=pax), qtab)
        return self._unstack(safe_stack([c0, sw1], axis=pax), cts[0], cts)

    # -- batched transforms / shifts (one stacked kernel) -------------------
    def transform_to_ntt_batched(self, cts) -> list[Ciphertext]:
        if not cts:
            return []
        if any(ct.is_ntt_form for ct in cts):
            raise ValueError("[Evaluator.transform_to_ntt_batched] already "
                             "NTT form")
        cd = self._cd(cts[0])
        out = self._unstack(R.ntt_forward(self._stack(cts), cd.qtab()),
                            cts[0], cts)
        for o in out:
            o.is_ntt_form = True
        return out

    def transform_from_ntt_batched(self, cts) -> list[Ciphertext]:
        if not cts:
            return []
        if any(not ct.is_ntt_form for ct in cts):
            raise ValueError("[Evaluator.transform_from_ntt_batched] not "
                             "NTT form")
        cd = self._cd(cts[0])
        out = self._unstack(R.ntt_inverse(self._stack(cts), cd.qtab()),
                            cts[0], cts)
        for o in out:
            o.is_ntt_form = False
        return out

    def transform_plain_to_ntt_batched(self, plains, parms_id: ParmsID):
        return [self.transform_plain_to_ntt(p, parms_id) for p in plains]

    def transform_plain_from_ntt_batched(self, plains):
        return [self.transform_plain_from_ntt(p) for p in plains]

    def negacyclic_shift_batched(self, cts, shift: int) -> list[Ciphertext]:
        return [self.negacyclic_shift(ct, shift) for ct in cts]

    def bfv_scale_up_batched(self, plains, parms_id: ParmsID):
        return [self.bfv_scale_up(p, parms_id) for p in plains]

    def bfv_centralize_batched(self, plains, parms_id: ParmsID):
        return [self.bfv_centralize(p, parms_id) for p in plains]

    # -- explicit-form plain products (ref: evaluator.h multiply_plain_ntt /
    #    multiply_plain_normal; our multiply_plain dispatches on form, these
    #    validate the expected form first) ---------------------------------
    def multiply_plain_ntt(self, ct: Ciphertext, plain: Plaintext) -> Ciphertext:
        if not plain.is_ntt_form:
            raise ValueError("[Evaluator.multiply_plain_ntt] plain must be "
                             "NTT form")
        return self.multiply_plain(ct, plain)

    def multiply_plain_normal(self, ct: Ciphertext, plain: Plaintext) -> Ciphertext:
        if plain.is_ntt_form:
            raise ValueError("[Evaluator.multiply_plain_normal] plain must "
                             "be coefficient form")
        return self.multiply_plain(ct, plain)

    def multiply_plain_ntt_batched(self, cts, plains) -> list[Ciphertext]:
        if any(not p.is_ntt_form for p in plains):
            raise ValueError("[Evaluator.multiply_plain_ntt_batched] plains "
                             "must be NTT form")
        return self.multiply_plain_batched(cts, plains)

    def multiply_plain_normal_batched(self, cts, plains) -> list[Ciphertext]:
        if any(p.is_ntt_form for p in plains):
            raise ValueError("[Evaluator.multiply_plain_normal_batched] "
                             "plains must be coefficient form")
        return self.multiply_plain_batched(cts, plains)

    # -- reference-style aliases -------------------------------------------
    add_new = add
    sub_new = sub
    multiply_new = multiply
    square_new = square
    negate_new = negate
    relinearize_new = relinearize
    add_plain_new = add_plain
    sub_plain_new = sub_plain
    multiply_plain_new = multiply_plain
    mod_switch_to_next_new = mod_switch_to_next
    rescale_to_next_new = rescale_to_next
    apply_galois_new = apply_galois
    apply_keyswitching_new = apply_keyswitching
    rotate_rows_new = rotate_rows
    rotate_columns_new = rotate_columns
    rotate_vector_new = rotate_vector
    complex_conjugate_new = complex_conjugate
    negacyclic_shift_new = negacyclic_shift
    transform_to_ntt_new = transform_to_ntt
    transform_from_ntt_new = transform_from_ntt
    add_new_batched = add_batched
    sub_new_batched = sub_batched
    multiply_new_batched = multiply_batched
    negate_new_batched = negate_batched
    relinearize_new_batched = relinearize_batched
    multiply_plain_new_batched = multiply_plain_batched
    mod_switch_to_next_new_batched = mod_switch_to_next_batched
    apply_galois_new_batched = apply_galois_batched
    apply_keyswitching_new_batched = apply_keyswitching_batched
    rotate_rows_new_batched = rotate_rows_batched
    rotate_columns_new_batched = rotate_columns_batched
    rotate_vector_new_batched = rotate_vector_batched
    complex_conjugate_new_batched = complex_conjugate_batched
    transform_to_ntt_new_batched = transform_to_ntt_batched
    transform_from_ntt_new_batched = transform_from_ntt_batched
    translate_batched = _translate_batched
