"""Ciphertext object.

TPU-native rebuild of reference src/ciphertext.{h,cu}.  Data is one uint32
jnp array shaped (size, L, n) — poly index, RNS limb, coefficient — which is
also the natural batched-kernel layout (a batch of ciphertexts stacks a
leading axis; see ops/poly.py broadcasting conventions).

Metadata mirrors the reference: parms_id, is_ntt_form (scheme-conventional:
BFV coeff domain, CKKS/BGV NTT domain), scale (CKKS), correction_factor
(BGV), and an optional PRNG seed for compressed symmetric ciphertexts
(ciphertext.h:154-170: c1 regenerated from the seed on load/expand).
"""

from __future__ import annotations

import jax.numpy as jnp

from .params import ParmsID, PARMS_ID_ZERO


class Ciphertext:
    def __init__(
        self,
        data: jnp.ndarray | None = None,
        parms_id: ParmsID = PARMS_ID_ZERO,
        is_ntt_form: bool = False,
        scale: float = 1.0,
        correction_factor: int = 1,
        seed: int | None = None,
    ):
        self.data = data  # (size, L, n) u32
        self.parms_id = parms_id
        self.is_ntt_form = is_ntt_form
        self.scale = scale
        self.correction_factor = correction_factor
        self.seed = seed

    # -- shape accessors (ref: ciphertext.h polynomial_count etc.) ----------
    # data is (size, L, n) on the u32 fast path, (size, 2, L, n) on the wide
    # u32-pair path (ops/rp.py layout): negative indexing serves both.
    @property
    def size(self) -> int:
        return 0 if self.data is None else self.data.shape[0]

    @property
    def wide(self) -> bool:
        return self.data is not None and self.data.ndim == 4

    @property
    def coeff_modulus_size(self) -> int:
        return 0 if self.data is None else self.data.shape[-2]

    @property
    def poly_modulus_degree(self) -> int:
        return 0 if self.data is None else self.data.shape[-1]

    def poly(self, i: int) -> jnp.ndarray:
        return self.data[i]

    @staticmethod
    def like(other: "Ciphertext", size: int | None = None) -> "Ciphertext":
        """Metadata clone with fresh (optionally resized) zero data
        (ref: ciphertext.h:94)."""
        size = other.size if size is None else size
        data = jnp.zeros((size,) + other.data.shape[1:], dtype=jnp.uint32)
        return Ciphertext(data, other.parms_id, other.is_ntt_form,
                          other.scale, other.correction_factor)

    def clone(self) -> "Ciphertext":
        return Ciphertext(self.data, self.parms_id, self.is_ntt_form,
                          self.scale, self.correction_factor, self.seed)

    def __repr__(self):
        shape = None if self.data is None else tuple(self.data.shape)
        return (f"Ciphertext(shape={shape}, ntt={self.is_ntt_form}, "
                f"scale={self.scale}, cf={self.correction_factor}, "
                f"parms={self.parms_id[:8]})")
