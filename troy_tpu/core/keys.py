"""Key objects: SecretKey, PublicKey, KSwitchKeys, RelinKeys, GaloisKeys.

TPU-native rebuild of reference src/key.h + src/kswitch_keys.{h,cu}.
SecretKey wraps an NTT-form ternary polynomial at the key level; PublicKey
wraps a (seed-compressible) encryption of zero; KSwitchKeys hold, per
decomposition prime, a 2-poly key ciphertext — stored stacked as one
(decomp, 2, L_key, n) array so the keyswitch inner product is a single
batched contraction (the TPU analog of kswitch_keys.h:34-48 key_data_ptrs).
"""

from __future__ import annotations

import jax.numpy as jnp

from .params import ParmsID
from .ciphertext import Ciphertext
from ..utils import numth


class SecretKey:
    """NTT-form secret polynomial s at key level: data (L_key, n)
    (ref: key.h:7)."""

    def __init__(self, data: jnp.ndarray, parms_id: ParmsID):
        self.data = data
        self.parms_id = parms_id

    def clone(self) -> "SecretKey":
        return SecretKey(self.data, self.parms_id)


class PublicKey:
    """pk = (-(a*s+e), a) in NTT form at key level (ref: key.h:90)."""

    def __init__(self, ciphertext: Ciphertext):
        self.ciphertext = ciphertext

    @property
    def parms_id(self) -> ParmsID:
        return self.ciphertext.parms_id

    def data(self) -> jnp.ndarray:
        return self.ciphertext.data


class KSwitchKeys:
    """Keyswitching keys (ref: kswitch_keys.h:13).

    keys[k] is one switching key as a stacked (decomp, 2, L_key, n) array in
    NTT form at the key level; `k` indexes e.g. the power of s (RelinKeys)
    or the Galois element (GaloisKeys).
    """

    def __init__(self, keys: dict[int, jnp.ndarray], parms_id: ParmsID):
        self.keys = keys
        self.parms_id = parms_id

    def has(self, index: int) -> bool:
        return index in self.keys

    def get(self, index: int) -> jnp.ndarray:
        if index not in self.keys:
            raise KeyError(f"[KSwitchKeys] no key at index {index}")
        return self.keys[index]


class RelinKeys(KSwitchKeys):
    """Relinearization keys for s^2, s^3, ...: key index k holds the switch
    key for s^(k+2) (ref: kswitch_keys.h:214)."""

    def key(self, power: int) -> jnp.ndarray:
        return self.get(power - 2)


class GaloisKeys(KSwitchKeys):
    """Galois keys indexed by Galois element (ref: kswitch_keys.h:310)."""

    @staticmethod
    def get_index(galois_elt: int) -> int:
        return galois_elt

    def key(self, galois_elt: int) -> jnp.ndarray:
        return self.get(galois_elt)
