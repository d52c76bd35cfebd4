"""Encoder adapters: a uniform polynomial-encoding interface over
BatchEncoder (uint64 mod t), CKKSEncoder (float64), and the ring2k encoder
(uint32/64), used by the matmul/conv2d helpers.

TPU-native rebuild of reference src/app/encoder_adapter.h.  Note: the
reference distinguishes encode_for_cipher (scale-up form) from
encode_for_plain (centralized form) because its multiply/add kernels consume
pre-lifted RNS plaintexts; our Evaluator lifts mod-t plaintexts internally,
so both BFV variants produce the same coefficient encoding.
"""

from __future__ import annotations

import numpy as np

from ..core.batch_encoder import BatchEncoder
from ..core.ckks_encoder import CKKSEncoder
from ..core.decryptor import Decryptor
from ..core.plaintext import Plaintext


class BatchEncoderAdapter:
    """uint64 values mod t (ref: encoder_adapter.h BatchEncoderAdapter)."""

    def __init__(self, encoder: BatchEncoder):
        self.encoder = encoder
        self.slot_count = encoder.slot_count

    def encode_for_cipher(self, vec) -> Plaintext:
        return self.encoder.encode_polynomial(vec)

    def encode_for_plain(self, vec) -> Plaintext:
        return self.encoder.encode_polynomial(vec)

    def decrypt_outputs(self, decryptor: Decryptor, ct) -> np.ndarray:
        return self.encoder.decode_polynomial(decryptor.decrypt(ct))


class CKKSEncoderAdapter:
    """float64 values (ref: encoder_adapter.h CKKSEncoderAdapter)."""

    def __init__(self, encoder: CKKSEncoder, scale: float, parms_id=None):
        self.encoder = encoder
        self.scale = scale
        self.parms_id = parms_id
        self.slot_count = encoder.n  # coefficient packing uses all n coeffs

    def encode_for_cipher(self, vec) -> Plaintext:
        return self.encoder.encode_float64_polynomial(vec, self.parms_id, self.scale)

    def encode_for_plain(self, vec) -> Plaintext:
        return self.encoder.encode_float64_polynomial(vec, self.parms_id, self.scale)

    def decrypt_outputs(self, decryptor: Decryptor, ct) -> np.ndarray:
        return self.encoder.decode_float64_polynomial(decryptor.decrypt(ct))


class Ring2kEncoderAdapter:
    """uint32/uint64 values mod 2^k (ref: encoder_adapter.h
    PolynomialEncoderRing2kAdapter); see app/ring2k.py."""

    def __init__(self, encoder, parms_id=None):
        self.encoder = encoder
        self.parms_id = parms_id
        self.slot_count = encoder.n

    def encode_for_cipher(self, vec) -> Plaintext:
        return self.encoder.scale_up(vec, self.parms_id)

    def encode_for_plain(self, vec) -> Plaintext:
        return self.encoder.centralize(vec, self.parms_id)

    def decrypt_outputs(self, decryptor: Decryptor, ct) -> np.ndarray:
        return self.encoder.decrypt_scale_down(decryptor, ct)
