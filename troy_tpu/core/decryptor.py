"""Decryptor.

TPU-native rebuild of reference src/decryptor.{h,cu}: phase computation
sum_i c_i * s^i via cached NTT-form secret-key powers, then per-scheme final
step:

  BFV : decrypt_scale_and_round via {t, gamma}   (rns_tool, integer-exact)
  CKKS: phase stays in NTT/RNS form (the CKKSEncoder decodes it)
  BGV : INTT + exact mod-t conversion + correction-factor fixup

plus invariant_noise_budget (BFV/BGV, ref: decryptor.cu:581) computed by
host-side CRT composition (a debug/metrics op, not a hot path).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .context import HeContext, ContextData
from .params import SchemeType
from .plaintext import Plaintext
from .ciphertext import Ciphertext
from .keys import SecretKey
from ..ops import ntt as NTT, poly as P, u32 as U, rp as R
from ..utils import numth


class Decryptor:
    def __init__(self, context: HeContext, sk: SecretKey):
        self.context = context
        self.sk = sk
        self._sk_powers: dict[int, jnp.ndarray] = {1: sk.data}

    def _power(self, k: int) -> jnp.ndarray:
        if k not in self._sk_powers:
            cd = self.context.key_context_data()
            self._sk_powers[k] = R.dyadic_product(
                self._power(k - 1), self.sk.data, cd.qtab()
            )
        return self._sk_powers[k]

    @staticmethod
    def _jit(cd: ContextData, name: str, builder):
        """Shares the per-level compiled-kernel cache with Evaluator._jit
        (ContextData._jit_ops — one cache per level, keyed by op name)."""
        cache = getattr(cd, "_jit_ops", None)
        if cache is None:
            cache = {}
            cd._jit_ops = cache
        if name not in cache:
            import jax

            cache[name] = jax.jit(builder())
        return cache[name]

    # ------------------------------------------------------------------
    def phase(self, ct: Ciphertext, keep_ntt: bool | None = None) -> jnp.ndarray:
        """c0 + c1 s + c2 s^2 + ... at ct's level (ref: decryptor.h:19)."""
        cd = self.context.get_context_data(ct.parms_id)
        qtab = cd.qtab()
        L = cd.coeff_modulus_size
        if ct.is_ntt_form:
            acc = ct.data[0]
            for i in range(1, ct.size):
                spow = self._power(i)[..., :L, :]
                acc = R.add(acc, R.dyadic_product(ct.data[i], spow, qtab), qtab)
            if keep_ntt is False:
                acc = R.ntt_inverse(acc, qtab)
            return acc
        # coeff-form ct (BFV): NTT the c_i (i>=1), multiply, INTT, add c0
        acc = None
        for i in range(1, ct.size):
            ci = R.ntt_forward(ct.data[i], qtab)
            term = R.dyadic_product(ci, self._power(i)[..., :L, :], qtab)
            acc = term if acc is None else R.add(acc, term, qtab)
        acc = R.ntt_inverse(acc, qtab)
        return R.add(acc, ct.data[0], qtab)

    def _phase_impl(self, cd: ContextData, data, sk_pows, ntt_form: bool,
                    keep_ntt: bool | None = None) -> jnp.ndarray:
        """Pure traceable phase on raw arrays; sk_pows = [s, s^2, ...] at key
        level (sliced to cd's limbs inside)."""
        qtab = cd.qtab()
        L = cd.coeff_modulus_size
        if ntt_form:
            acc = data[0]
            for i, spow in enumerate(sk_pows, start=1):
                acc = R.add(acc, R.dyadic_product(data[i], spow[..., :L, :],
                                                  qtab), qtab)
            if keep_ntt is False:
                acc = R.ntt_inverse(acc, qtab)
            return acc
        acc = None
        for i, spow in enumerate(sk_pows, start=1):
            ci = R.ntt_forward(data[i], qtab)
            term = R.dyadic_product(ci, spow[..., :L, :], qtab)
            acc = term if acc is None else R.add(acc, term, qtab)
        acc = R.ntt_inverse(acc, qtab)
        return R.add(acc, data[0], qtab)

    # ------------------------------------------------------------------
    def decrypt(self, ct: Ciphertext) -> Plaintext:
        cd = self.context.get_context_data(ct.parms_id)
        scheme = cd.parms.scheme
        cd.rns_tool.materialize()
        cd.qtab()
        ntt_form = bool(ct.is_ntt_form)
        size = ct.size
        pows = [self._power(i) for i in range(1, size)]
        key = f"decrypt{size}{int(ntt_form)}"
        if scheme == SchemeType.BFV:
            fn = self._jit(cd, key, lambda: (
                lambda d, p: cd.rns_tool.decrypt_scale_and_round(
                    self._phase_impl(cd, d, p, ntt_form))))
            return Plaintext(fn(ct.data, pows)[None, :], parms_id=ct.parms_id)
        if scheme == SchemeType.CKKS:
            def builder():
                def f(d, p):
                    ph = self._phase_impl(cd, d, p, ntt_form)
                    if not ntt_form:
                        # coeff-form CKKS ct (e.g. assemble_lwe output): the
                        # CKKS plaintext contract is NTT form (ref:
                        # decryptor.cu ckks branch)
                        ph = R.ntt_forward(ph, cd.qtab())
                    return ph
                return f

            fn = self._jit(cd, key, builder)
            return Plaintext(fn(ct.data, pows), parms_id=ct.parms_id,
                             scale=ct.scale, is_ntt_form=True)
        if scheme == SchemeType.BGV:
            t = cd.parms.plain_modulus

            def builder():
                def f(d, p, inv_cf):
                    ph = self._phase_impl(cd, d, p, ntt_form, keep_ntt=False)
                    m = cd.rns_tool.decrypt_mod_t(ph)
                    return U.mul_mod(m, inv_cf, U.u32(t.value),
                                     U.u32(t.ratio64_hi),
                                     U.u32(t.ratio64_lo))
                return f

            inv_cf = numth.invert_mod(ct.correction_factor, t.value)
            fn = self._jit(cd, key, builder)
            return Plaintext(fn(ct.data, pows, U.u32(inv_cf))[None, :],
                             parms_id=ct.parms_id)
        raise ValueError("[Decryptor] unsupported scheme")

    def bfv_decrypt_without_scaling_down(self, ct: Ciphertext) -> Plaintext:
        """Raw phase in RNS (ref: decryptor.h:62)."""
        cd = self.context.get_context_data(ct.parms_id)
        cd.rns_tool.materialize()
        cd.qtab()
        ntt_form = bool(ct.is_ntt_form)
        pows = [self._power(i) for i in range(1, ct.size)]
        fn = self._jit(cd, f"phase{ct.size}{int(ntt_form)}", lambda: (
            lambda d, p: self._phase_impl(cd, d, p, ntt_form)))
        return Plaintext(fn(ct.data, pows), parms_id=ct.parms_id)

    def decrypt_batched(self, cts: list[Ciphertext]) -> list[Plaintext]:
        """ref: decryptor.h decrypt_batched"""
        return [self.decrypt(ct) for ct in cts]

    # ------------------------------------------------------------------
    def invariant_noise_budget(self, ct: Ciphertext) -> int:
        """log2(q / 2*||t*phase mod q||) in bits (BFV/BGV;
        ref: decryptor.cu:581).  Host-side CRT compose — a debug op."""
        cd = self.context.get_context_data(ct.parms_id)
        t = cd.parms.plain_modulus.value
        if not t:
            raise ValueError("[Decryptor] noise budget needs a plain modulus")
        ph = np.asarray(self.phase(ct, keep_ntt=False))
        base = cd.base_q
        Q = base.prod
        norm = 0
        if cd.wide:
            from ..ops.u64 import unpack64

            ph = unpack64(ph[0], ph[1])
        composed = base.compose_array_host(ph)
        for v in composed:
            w = (v * t) % Q
            if w > Q // 2:
                w = Q - w
            norm = max(norm, w)
        if norm == 0:
            return Q.bit_length() - 1
        return max(0, Q.bit_length() - norm.bit_length() - 1)
