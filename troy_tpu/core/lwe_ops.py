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

    def divide_by_poly_modulus_degree(self, ct: Ciphertext, factor: int | None = None) -> Ciphertext:
        """Multiply by factor^-1 mod q, factor defaulting to n
        (ref: evaluator_lwes.cu:132, `mul` semantics inverted to a divisor)."""
        cd = self._cd(ct)
        from ..utils import numth

        import numpy as np

        k = cd.parms.poly_modulus_degree if factor is None else factor
        out = ct.clone()
        factors = [numth.invert_mod(k, q) for q in cd.base_q.values]
        w = jnp.asarray(np.array(factors, dtype=np.uint32))
        ws = jnp.asarray(
            np.array([(f << 32) // q for f, q in zip(factors, cd.base_q.values)],
                     dtype=np.uint64).astype(np.uint32))
        out.data = P.multiply_operand(ct.data, w, ws, cd.qtab())
        return out

    def _assemble_lwe_stack(self, lwes: list[LWECiphertext]) -> jnp.ndarray:
        """Assemble M LWE samples in ONE batched computation -> (M, 2, L, n)
        (the data of assemble_lwe for each, ref: lwe_ciphertext.h:111)."""
        cd = self.context.get_context_data(lwes[0].parms_id)
        n = cd.parms.poly_modulus_degree
        L = lwes[0].coeff_modulus_size
        M = len(lwes)
        qtab = cd.qtab()
        q = qtab["q"][:, None]
        c0s = jnp.stack([l.c0 for l in lwes])                # (M, L)
        c1s = jnp.stack([l.c1 for l in lwes])                # (M, L, n)
        c0 = jnp.zeros((M, L, n), jnp.uint32).at[:, :, 0].set(c0s)
        rev = jnp.flip(c1s, axis=-1)
        rolled = jnp.roll(rev, 1, axis=-1)
        sign = jnp.arange(n) > 0
        c1 = jnp.where(sign, U.neg_mod(rolled, q), rolled)
        return jnp.stack([c0, c1], axis=1)                    # (M, 2, L, n)

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
        # Assemble then delegate to the generic RLWE packer with
        # input_interval = n (divide-by-n happens inside, BEFORE merging:
        # only coefficient 0 of each input survives the merge+trace linear
        # map, where the total x n factor exactly undoes the division, so the
        # surviving noise is the original extraction noise).
        cts: list[Ciphertext | None] = [self.assemble_lwe(lwe) for lwe in lwes]
        out_interval = n >> ell
        if out_interval == 1:
            # full packing still needs no trace; handled by merge alone
            return self.pack_rlwe_ciphertexts(cts, glk, 0, n, 1)
        return self.pack_rlwe_ciphertexts(cts, glk, 0, n, out_interval)

    # ------------------------------------------------------------------
    def pack_rlwe_ciphertexts(
        self,
        ciphers: list[Ciphertext | None],
        glk: GaloisKeys,
        shift: int,
        input_interval: int,
        output_interval: int,
        apply_field_trace: bool = True,
    ) -> Ciphertext:
        """Interleave up to input_interval/output_interval RLWE ciphertexts
        whose payload coefficients sit at stride `input_interval` (after the
        inherent `shift`) into one ciphertext with payload stride
        `output_interval` (ref: evaluator_lwes.cu:305 pack_rlwe_ciphertexts).

        Each input is divided by input_interval first: the merge tree
        (x input_interval/output_interval) plus the trailing field trace
        (x output_interval) multiplies each surviving coefficient by exactly
        input_interval, restoring scale with no noise blowup.
        """
        live = [c for c in ciphers if c is not None]
        if not live:
            raise ValueError("[Evaluator.pack_rlwe_ciphertexts] empty input")
        cd = self._cd(live[0])
        n = cd.parms.poly_modulus_degree
        if input_interval & (input_interval - 1) or output_interval & (output_interval - 1):
            raise ValueError("[Evaluator.pack_rlwe_ciphertexts] intervals must be powers of 2")
        m_max = input_interval // output_interval
        if len(ciphers) > m_max:
            raise ValueError("[Evaluator.pack_rlwe_ciphertexts] too many ciphertexts")
        layers = m_max.bit_length() - 1
        ntt_form = cd.parms.scheme in (SchemeType.CKKS, SchemeType.BGV)
        from ..utils import numth as _numth

        def prepare(ct: Ciphertext | None) -> Ciphertext | None:
            if ct is None:
                return None
            if ct.is_ntt_form:
                ct = self.transform_from_ntt(ct)
            ct = self.divide_by_poly_modulus_degree(ct, input_interval)
            if shift:
                ct = self.negacyclic_shift(ct, shift)
            return ct

        padded = list(ciphers) + [None] * (m_max - len(ciphers))
        arranged: list[Ciphertext | None] = [None] * m_max
        for k in range(m_max):
            arranged[_numth.reverse_bits(k, layers) if layers else 0] = prepare(padded[k])

        def merge(sub: list, j: int) -> Ciphertext | None:
            if len(sub) == 1:
                return sub[0]
            half = len(sub) // 2
            c_e = merge(sub[:half], j - 1)
            c_o = merge(sub[half:], j - 1)
            if c_e is None and c_o is None:
                return None
            delta = input_interval >> j
            g = (n // input_interval) * (1 << j) + 1
            if c_o is None:
                return self.add(c_e, self.apply_galois(c_e, g, glk))
            shifted = self.negacyclic_shift(c_o, delta)
            if c_e is None:
                return self.sub(shifted, self.apply_galois(shifted, g, glk))
            s = self.add(c_e, shifted)
            d = self.sub(c_e, shifted)
            return self.add(s, self.apply_galois(d, g, glk))

        ret = merge(arranged, layers)
        if ntt_form:
            ret = self.transform_to_ntt(ret)
        if output_interval != 1 and apply_field_trace:
            logn_stop = (n // output_interval).bit_length() - 1
            ret = self.field_trace(ret, glk, logn_stop=logn_stop)
        return ret

    # ------------------------------------------------------------------
    def pack_rlwe_ciphertexts_batched(
        self,
        groups: list[list[Ciphertext | None]],
        glk: GaloisKeys,
        shift: int,
        input_interval: int,
        output_interval: int,
        apply_field_trace: bool = True,
        mesh=None,
    ) -> list[Ciphertext]:
        """Pack G groups simultaneously: the identical merge tree runs ONCE
        on group-stacked arrays — the batch axis is inserted after the poly
        axis (shape (2, G, [2,]L, n)), so every poly-indexed op including the
        keyswitch dispatches one batched kernel for all groups
        (ref: evaluator_lwes.cu:493 pack_lwe_ciphertexts_batched, applied at
        the RLWE layer).  Missing slots (None / ragged groups) are packed as
        zero ciphertexts — identical results, uniform tree.

        mesh: optional ('data', 'limb') Mesh — the group axis shards over
        'data' and the limb axis over 'limb' (the multi-device half of the
        reference's --multiple-devices matmul bench)."""
        if not groups:
            raise ValueError("[Evaluator.pack_rlwe_ciphertexts_batched] empty")
        if len(groups) == 1:
            return [self.pack_rlwe_ciphertexts(
                groups[0], glk, shift, input_interval, output_interval,
                apply_field_trace)]
        proto = next(c for g in groups for c in g if c is not None)
        for g in groups:
            for c in g:
                if c is not None and (
                        c.parms_id != proto.parms_id
                        or c.is_ntt_form != proto.is_ntt_form
                        or c.size != proto.size):
                    raise ValueError(
                        "[Evaluator.pack_rlwe_ciphertexts_batched] "
                        "ciphertexts must be uniform")
        G = len(groups)
        mlen = max(len(g) for g in groups)
        zero = jnp.zeros_like(proto.data)
        positions: list[Ciphertext] = []
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as PSpec

            ndim = proto.data.ndim + 1               # (2, G, [2,]L, n)
            dax = "data" if G % mesh.shape["data"] == 0 else None
            L_ = proto.data.shape[-2]
            lax_ = "limb" if L_ % mesh.shape["limb"] == 0 else None
            gspec = NamedSharding(mesh, PSpec(
                *([None, dax] + [None] * (ndim - 4) + [lax_, None])))
        for k in range(mlen):
            datas = [g[k].data if k < len(g) and g[k] is not None else zero
                     for g in groups]
            v = proto.clone()
            v.data = jnp.stack(datas, axis=1)        # (2, G, [2,]L, n)
            if mesh is not None:
                import jax

                v.data = jax.device_put(v.data, gspec)
            v.seed = None
            positions.append(v)
        packed = self.pack_rlwe_ciphertexts(
            positions, glk, shift, input_interval, output_interval,
            apply_field_trace)
        outs = []
        for gi in range(G):
            o = packed.clone()
            o.data = packed.data[:, gi]
            outs.append(o)
        return outs

    def pack_lwe_ciphertexts_batched(self, groups: list[list[LWECiphertext]],
                                     glk: GaloisKeys) -> list[Ciphertext]:
        """Batched PackLWEs: G groups of up to n LWE samples each -> G RLWE
        ciphertexts, with assembly and the whole merge/trace tree running as
        batched kernels (ref: evaluator_lwes.cu:493)."""
        if not groups or any(not g for g in groups):
            raise ValueError("[Evaluator.pack_lwe_ciphertexts_batched] "
                             "empty input")
        cd = self.context.get_context_data(groups[0][0].parms_id)
        n = cd.parms.poly_modulus_degree
        m = max(len(g) for g in groups)
        ell = max(1, (m - 1).bit_length()) if m > 1 else 0
        if (1 << ell) > n:
            raise ValueError("[Evaluator.pack_lwe_ciphertexts_batched] "
                             "too many LWEs")
        flat = [l for g in groups for l in g]
        datas = self._assemble_lwe_stack(flat)       # (M, 2, L, n)
        proto0 = Ciphertext(datas[0], flat[0].parms_id, is_ntt_form=False,
                            scale=flat[0].scale,
                            correction_factor=flat[0].correction_factor)
        cts: list[list[Ciphertext | None]] = []
        off = 0
        for g in groups:
            row = []
            for _ in g:
                c = proto0.clone()
                c.data = datas[off]
                row.append(c)
                off += 1
            cts.append(row)
        out_interval = max(1, n >> ell)
        return self.pack_rlwe_ciphertexts_batched(
            cts, glk, 0, n, out_interval)
