"""Plaintext object.

TPU-native rebuild of reference src/plaintext.{h,cu}.  Data is a uint32
jnp array shaped (L, n): L == 1 for BFV/BGV mod-t coefficient form, L == RNS
limb count for CKKS / NTT-form plaintexts.  Metadata mirrors the reference
(parms_id, scale, is_ntt_form); serialization lives in utils/serialize.py.
"""

from __future__ import annotations

import jax.numpy as jnp

from .params import ParmsID, PARMS_ID_ZERO


class Plaintext:
    def __init__(
        self,
        data: jnp.ndarray | None = None,
        parms_id: ParmsID = PARMS_ID_ZERO,
        scale: float = 1.0,
        is_ntt_form: bool = False,
        coeff_count: int | None = None,
    ):
        self.data = data  # (L, n) u32; None = empty
        self.parms_id = parms_id
        self.scale = scale
        self.is_ntt_form = is_ntt_form
        self._coeff_count = coeff_count

    @property
    def coeff_count(self) -> int:
        if self._coeff_count is not None:
            return self._coeff_count
        return 0 if self.data is None else self.data.shape[-1]

    @property
    def coeff_modulus_size(self) -> int:
        return 0 if self.data is None else self.data.shape[-2]

    def clone(self) -> "Plaintext":
        return Plaintext(self.data, self.parms_id, self.scale,
                         self.is_ntt_form, self._coeff_count)

    def __repr__(self):
        shape = None if self.data is None else tuple(self.data.shape)
        return (f"Plaintext(shape={shape}, ntt={self.is_ntt_form}, "
                f"scale={self.scale}, parms={self.parms_id[:8]})")
