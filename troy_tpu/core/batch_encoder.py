"""BFV/BGV SIMD batch encoder.

TPU-native rebuild of reference src/batch_encoder.{h,cu}.  Slots form a
2 x (n/2) matrix; slot (r, c) corresponds to the evaluation of the plaintext
polynomial at psi_t^(e) with e = (+-1) * 3^c mod 2n (generator 3, matching
rotate_rows/rotate_columns semantics).  Because our NTT outputs position
p = evaluation at psi^(2*brv(p)+1) (ops/ntt.py), the slot->position map is
the closed form p = reverse_bits((e-1)/2, log n) — no search, no separate
bit-reversal pass (the reference interleaves index maps with a Harvey INTT,
batch_encoder.cu:169-228).

encode: scatter slot values to NTT positions (host permutation), inverse
plain-NTT mod t -> coefficients.  decode: plain-NTT, gather.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .context import HeContext
from .params import SchemeType
from .plaintext import Plaintext
from ..ops.ntt import NTTTables, ntt_forward, ntt_inverse
from ..utils import numth


class BatchEncoder:
    def __init__(self, context: HeContext):
        self.context = context
        cd = context.first_context_data()
        self.t = cd.parms.plain_modulus
        n = cd.parms.poly_modulus_degree
        self.n = n
        self.log_n = cd.log_n
        self.simd = cd.simd_supported
        if self.simd:
            self.tables = NTTTables(self.log_n, [self.t])
            # slot index -> NTT position (ref: matrix_reps_index_map)
            m = 2 * n
            pos = np.empty(n, dtype=np.int64)
            e = 1
            for c in range(n // 2):
                pos[c] = numth.reverse_bits((e - 1) // 2, self.log_n)
                pos[c + n // 2] = numth.reverse_bits((m - e - 1) // 2, self.log_n)
                e = e * 3 % m
            self._slot_to_pos = pos
            inv = np.empty(n, dtype=np.int64)
            inv[pos] = np.arange(n)
            self._pos_to_slot = inv

    @property
    def slot_count(self) -> int:
        return self.n

    @property
    def simd_encoding_supported(self) -> bool:
        return self.simd

    # ------------------------------------------------------------------
    def encode(self, values) -> Plaintext:
        """SIMD encode a vector of ints mod t (ref: batch_encoder.cu encode)."""
        if not self.simd:
            raise ValueError("[BatchEncoder] t does not support batching")
        v = np.zeros(self.n, dtype=np.uint64)
        vals = np.asarray(values, dtype=np.uint64)
        v[: len(vals)] = vals % self.t.value
        slots = np.zeros(self.n, dtype=np.uint32)
        slots[self._slot_to_pos] = v.astype(np.uint32)
        coeffs = ntt_inverse(jnp.asarray(slots[None, :]), self.tables.pack())
        return Plaintext(coeffs, coeff_count=self.n)

    def decode(self, plain: Plaintext) -> np.ndarray:
        if not self.simd:
            raise ValueError("[BatchEncoder] t does not support batching")
        evals = np.asarray(ntt_forward(plain.data, self.tables.pack()))[0]
        return evals[self._slot_to_pos].astype(np.uint64)

    # ------------------------------------------------------------------
    def encode_polynomial(self, coeffs) -> Plaintext:
        """Raw coefficient encoding, no SIMD (ref: batch_encoder.h
        encode_polynomial)."""
        v = np.zeros(self.n, dtype=np.uint64)
        arr = np.asarray(coeffs, dtype=np.uint64)
        v[: len(arr)] = arr % self.t.value
        return Plaintext(jnp.asarray(v.astype(np.uint32)[None, :]),
                         coeff_count=len(arr))

    def decode_polynomial(self, plain: Plaintext) -> np.ndarray:
        return np.asarray(plain.data)[0].astype(np.uint64)

    # ------------------------------------------------------------------
    # RNS form conversions (ref: batch_encoder.h scale_up/scale_down/
    # centralize/decentralize — mod-t plaintext <-> RNS Q forms)
    # ------------------------------------------------------------------
    def _cd(self, parms_id):
        return self.context.get_context_data(
            parms_id or self.context.first_parms_id)

    def scale_up(self, plain: Plaintext, parms_id=None) -> Plaintext:
        """mod-t coefficients -> round(m*Q/t) in RNS (encrypt form)."""
        cd = self._cd(parms_id)
        return Plaintext(cd.scaler.scale_up(plain.data[0]),
                         parms_id=cd.parms_id, coeff_count=plain.coeff_count)

    def scale_down(self, plain: Plaintext) -> Plaintext:
        """Inverse of scale_up: round(m*t/Q) mod t (ref: scale_down_new;
        BEHZ {t, gamma} rounding, rns_tool.decrypt_scale_and_round)."""
        cd = self.context.get_context_data(plain.parms_id)
        cd.rns_tool.materialize()
        m = cd.rns_tool.decrypt_scale_and_round(plain.data)
        return Plaintext(m[None, :], coeff_count=plain.coeff_count)

    def centralize(self, plain: Plaintext, parms_id=None) -> Plaintext:
        """mod-t coefficients -> centered lift in RNS (operand form)."""
        cd = self._cd(parms_id)
        return Plaintext(cd.scaler.centralize(plain.data[0]),
                         parms_id=cd.parms_id, coeff_count=plain.coeff_count)

    def decentralize(self, plain: Plaintext) -> Plaintext:
        """Inverse of centralize (ref: batch_encoder.h decentralize_new)."""
        cd = self.context.get_context_data(plain.parms_id)
        m = cd.scaler.decentralize(plain.data)
        return Plaintext(m[None, :], coeff_count=plain.coeff_count)
