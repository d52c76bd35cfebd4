"""LWE extraction / packing operations (Evaluator mixin).

TPU-native rebuild of reference src/evaluator_lwes.cu (681 LoC): coefficient
extraction to LWE samples, re-assembly into RLWE, field trace, and the
Chen-Dai-Kim-Song (2020) PackLWEs tree that merges up to n LWE ciphertexts
into one RLWE ciphertext.

Math recap (used by pack_lwe_ciphertexts):
  one merge level j uses sigma_g with g = 2^j + 1, which is the identity on
  coefficients that are multiples of n/2^(j-1) and negates those congruent
  to n/2^j — so (c_e + x^(n/2^j) c_o) + sigma(c_e - x^(n/2^j) c_o) doubles
  both payload sets while cancelling each other's garbage there.  After
  packing 2^l inputs, the remaining field trace (levels j > l) annihilates
  every coefficient that is not a multiple of n/2^l; the combined factor is
  exactly n, removed by divide_by_poly_modulus_degree.

Automorphism keys required: galois elements {2^j + 1 : 1 <= j <= log2 n}
(KeyGenerator.create_automorphism_keys).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .params import SchemeType
from .ciphertext import Ciphertext
from .lwe import LWECiphertext
from .keys import GaloisKeys
from ..ops import ntt as NTT, poly as P, u32 as U
from ..ops.galois import GaloisTool


class LweOpsMixin:
    """Mixed into Evaluator (methods use self.context / self._cd / ops)."""

    # ------------------------------------------------------------------
    def extract_lwe(self, ct: Ciphertext, term: int) -> LWECiphertext:
        """Extract coefficient `term` as an LWE sample
        (ref: evaluator_lwes.cu:51 extract_lwe_new)."""
        if ct.size != 2:
            raise ValueError("[Evaluator.extract_lwe] needs size-2 ct")
        cd = self._cd(ct)
        n = cd.parms.poly_modulus_degree
        work = self.transform_from_ntt(ct) if ct.is_ntt_form else ct
        qtab = cd.qtab()
        q = qtab["q"][:, None]
        c0 = work.data[0][:, term]
        c1 = work.data[1]
        # a_i = c1[(term - i) mod n], negated where i > term
        idx = (term - jnp.arange(n)) % n
        sign = jnp.arange(n) > term
        gathered = jnp.take(c1, idx, axis=-1)
        a = jnp.where(sign, U.neg_mod(gathered, q), gathered)
        return LWECiphertext(c0, a, ct.parms_id, ct.scale, ct.correction_factor)

    def assemble_lwe(self, lwe: LWECiphertext) -> Ciphertext:
        """RLWE ct whose constant coefficient carries the LWE payload
        (ref: lwe_ciphertext.h:111 assemble_lwe).  Output is coeff-form
        regardless of scheme; callers NTT it if needed."""
        cd = self.context.get_context_data(lwe.parms_id)
        n = cd.parms.poly_modulus_degree
        L = lwe.coeff_modulus_size
        qtab = cd.qtab()
        q = qtab["q"][:, None]
        c0 = jnp.zeros((L, n), jnp.uint32).at[:, 0].set(lwe.c0)
        # c1' = (a_0, -a_{n-1}, ..., -a_1)
        rev = jnp.flip(lwe.c1, axis=-1)           # a_{n-1} ... a_0
        rolled = jnp.roll(rev, 1, axis=-1)        # a_0, a_{n-1}, ..., a_1
        sign = jnp.arange(n) > 0
        c1 = jnp.where(sign, U.neg_mod(rolled, q), rolled)
        return Ciphertext(jnp.stack([c0, c1]), lwe.parms_id, is_ntt_form=False,
                          scale=lwe.scale, correction_factor=lwe.correction_factor)

    # ------------------------------------------------------------------
    def field_trace(self, ct: Ciphertext, glk: GaloisKeys, logn_stop: int = 0) -> Ciphertext:
        """Repeated (1 + sigma_{2^j+1}) for j = log n down to logn_stop+1:
        zeroes every coefficient not a multiple of 2^logn_stop... stride
        n/2^logn_stop (ref: evaluator_lwes.cu:96 field_trace_inplace)."""
        cd = self._cd(ct)
        log_n = cd.log_n
        out = ct
        for j in range(log_n, logn_stop, -1):
            g = (1 << j) + 1
            out = self.add(out, self.apply_galois(out, g, glk))
        return out

    def divide_by_poly_modulus_degree(self, ct: Ciphertext, power: int | None = None) -> Ciphertext:
        """Multiply by n^-1 (or 2^-power) mod q (ref: evaluator_lwes.cu:132)."""
        cd = self._cd(ct)
        from ..utils import numth

        import numpy as np

        k = cd.parms.poly_modulus_degree if power is None else (1 << power)
        out = ct.clone()
        factors = [numth.invert_mod(k, q) for q in cd.base_q.values]
        w = jnp.asarray(np.array(factors, dtype=np.uint32))
        ws = jnp.asarray(
            np.array([(f << 32) // q for f, q in zip(factors, cd.base_q.values)],
                     dtype=np.uint64).astype(np.uint32))
        out.data = P.multiply_operand(ct.data, w, ws, cd.qtab())
        return out

    # ------------------------------------------------------------------
    def pack_lwe_ciphertexts(self, lwes: list[LWECiphertext],
                             glk: GaloisKeys) -> Ciphertext:
        """Merge up to n LWE samples into one RLWE ct whose coefficient at
        stride position i*(n/2^l) holds payload i
        (ref: evaluator_lwes.cu:201 pack_lwe_ciphertexts)."""
        if not lwes:
            raise ValueError("[Evaluator.pack_lwe_ciphertexts] empty input")
        cd = self.context.get_context_data(lwes[0].parms_id)
        n = cd.parms.poly_modulus_degree
        m = len(lwes)
        ell = max(1, (m - 1).bit_length()) if m > 1 else 0
        if (1 << ell) > n:
            raise ValueError("[Evaluator.pack_lwe_ciphertexts] too many LWEs")
        ntt_form = cd.parms.scheme in (SchemeType.CKKS, SchemeType.BGV)
        # Divide by n BEFORE merging (ref: evaluator_lwes.cu:363): only
        # coefficient 0 of each input survives the merge+trace linear map,
        # where the total x n factor exactly undoes this division, so the
        # surviving noise is the original extraction noise (dividing after
        # would scale noise by n^-1 mod Q — garbage).
        cts: list[Ciphertext | None] = [
            self.divide_by_poly_modulus_degree(self.assemble_lwe(lwe))
            for lwe in lwes
        ] + [None] * ((1 << ell) - m)
        if ntt_form:
            cts = [None if c is None else self.transform_to_ntt(c) for c in cts]

        def merge(sub: list, j: int) -> Ciphertext | None:
            if len(sub) == 1:
                return sub[0]
            half = len(sub) // 2
            c_e = merge(sub[:half], j - 1)
            c_o = merge(sub[half:], j - 1)
            if c_e is None and c_o is None:
                return None
            delta = n >> j
            g = (1 << j) + 1
            if c_o is None:
                # S = D = c_e
                return self.add(c_e, self.apply_galois(c_e, g, glk))
            shifted = self.negacyclic_shift(c_o, delta)
            if c_e is None:
                # S = shifted, D = -shifted
                return self.sub(shifted, self.apply_galois(shifted, g, glk))
            s = self.add(c_e, shifted)
            d = self.sub(c_e, shifted)
            return self.add(s, self.apply_galois(d, g, glk))

        # first/second-half recursion puts input k at coefficient
        # brv_l(k) * n/2^l, so pre-permute with bit reversal to land input i
        # at coefficient i * n/2^l
        from ..utils import numth as _numth

        if ell:
            arranged = [None] * (1 << ell)
            for k in range(1 << ell):
                arranged[_numth.reverse_bits(k, ell)] = cts[k]
        else:
            arranged = cts
        packed = merge(arranged, ell)
        return self.field_trace(packed, glk, logn_stop=ell)
