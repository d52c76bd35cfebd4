"""LWE ciphertext object.

TPU-native rebuild of reference src/lwe_ciphertext.{h,cu}: an LWE sample
(c0, c1) extracted from one coefficient of an RLWE ciphertext.
c0: (L,) scalars per RNS limb; c1: (L, n) mask coefficients.
"""

from __future__ import annotations

import jax.numpy as jnp

from .params import ParmsID


class LWECiphertext:
    def __init__(self, c0: jnp.ndarray, c1: jnp.ndarray, parms_id: ParmsID,
                 scale: float = 1.0, correction_factor: int = 1):
        self.c0 = c0  # (L,)
        self.c1 = c1  # (L, n)
        self.parms_id = parms_id
        self.scale = scale
        self.correction_factor = correction_factor

    @property
    def coeff_modulus_size(self) -> int:
        return self.c1.shape[0]

    @property
    def poly_modulus_degree(self) -> int:
        return self.c1.shape[1]

    def clone(self) -> "LWECiphertext":
        return LWECiphertext(self.c0, self.c1, self.parms_id,
                             self.scale, self.correction_factor)
