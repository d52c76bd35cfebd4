"""Deterministic random generation for RLWE sampling.

TPU-native rebuild of reference src/utils/random_generator.{h,cu} (AES-CTR
PRF + ternary / centered-binomial / uniform samplers).  The device-side PRF
here is JAX's counter-based threefry (cryptographically keyed, deterministic,
splittable); an AES-CTR compatibility mode for cross-library parity vectors
is planned in native/ (see SURVEY.md §2.3 hard part (d)).

Determinism contract (mirrors the reference seed semantics):
  * RandomGenerator(seed) produces a reproducible stream: the k-th sampling
    call is keyed by fold_in(seed_key, k),
  * seeded sampling for compressed ciphertexts uses an explicit (seed, index)
    so c1 can be regenerated from the stored seed alone.
"""

from __future__ import annotations

import secrets

import jax
import jax.numpy as jnp

from ..ops import u32 as U

NOISE_MAX_DEVIATION = 21  # CBD bound, sigma ~ 3.2 (ref: rlwe noise sampler)
_MASK21 = (1 << 21) - 1


def _uniform_from_key(key, shape, qtab: dict) -> jnp.ndarray:
    """Uniform residues in [0, q) per limb: 64 random bits Barrett-reduced
    (same negligible modulo bias as the reference's AES-CTR mod q)."""
    L = qtab["q"].shape[0]
    bits = jax.random.bits(key, (2,) + tuple(shape[:-2]) + (L, shape[-1]), jnp.uint32)
    lead = (1,) * (len(shape) - 2)
    q = qtab["q"].reshape(lead + (L, 1))
    hi = qtab["ratio_hi"].reshape(lead + (L, 1))
    lo = qtab["ratio_lo"].reshape(lead + (L, 1))
    return U.barrett_reduce_u64(bits[0], bits[1], q, hi, lo)


def _ternary_from_key(key, shape_n, qtab: dict) -> jnp.ndarray:
    """Ternary secret {-1, 0, 1} lifted to every limb: (..., L, n)."""
    r = jax.random.randint(key, shape_n, 0, 3, dtype=jnp.int32).astype(jnp.uint32)
    L = qtab["q"].shape[0]
    lead = (1,) * (len(shape_n) - 1)
    q = qtab["q"].reshape(lead + (L, 1))
    e = r[..., None, :]  # 0,1,2
    return jnp.where(e == 2, q - U.U32(1), jnp.broadcast_to(e, e.shape[:-2] + (L, e.shape[-1])))


def _cbd_from_key(key, shape_n, qtab: dict) -> jnp.ndarray:
    """Centered binomial (sum of 21 bits minus sum of 21 bits), lifted to all
    limbs (ref: random_generator.cu sample_poly_centered_binomial)."""
    bits = jax.random.bits(key, (2,) + shape_n, jnp.uint32)
    a = jnp.bitwise_count(bits[0] & U.U32(_MASK21)).astype(jnp.int32)
    b = jnp.bitwise_count(bits[1] & U.U32(_MASK21)).astype(jnp.int32)
    e = a - b  # [-21, 21]
    L = qtab["q"].shape[0]
    lead = (1,) * (len(shape_n) - 1)
    q = qtab["q"].reshape(lead + (L, 1)).astype(jnp.int32)
    e = e[..., None, :]
    lifted = jnp.where(e < 0, q + e, jnp.broadcast_to(e, e.shape[:-2] + (L, e.shape[-1])))
    return lifted.astype(jnp.uint32)


class RandomGenerator:
    """Stateful deterministic sampler (ref: random_generator.h:42-95)."""

    def __init__(self, seed: int | None = None):
        if seed is None:
            seed = secrets.randbits(63)
        self.seed = int(seed)
        self._key = jax.random.key(self.seed & 0x7FFFFFFFFFFFFFFF)
        self._counter = 0

    def _next_key(self):
        k = jax.random.fold_in(self._key, self._counter)
        self._counter += 1
        return k

    # -- samplers (ref: random_generator.h:75-80) ---------------------------
    def sample_uniform(self, shape, qtab: dict) -> jnp.ndarray:
        """shape = (..., L, n) residues uniform mod each q."""
        return _uniform_from_key(self._next_key(), shape, qtab)

    def sample_ternary(self, shape_n, qtab: dict) -> jnp.ndarray:
        return _ternary_from_key(self._next_key(), shape_n, qtab)

    def sample_cbd(self, shape_n, qtab: dict) -> jnp.ndarray:
        return _cbd_from_key(self._next_key(), shape_n, qtab)

    def sample_cbd_signed(self, shape_n) -> jnp.ndarray:
        """Raw centered-binomial integers (int32), not limb-lifted."""
        key = self._next_key()
        bits = jax.random.bits(key, (2,) + tuple(shape_n), jnp.uint32)
        a = jnp.bitwise_count(bits[0] & U.U32(_MASK21)).astype(jnp.int32)
        b = jnp.bitwise_count(bits[1] & U.U32(_MASK21)).astype(jnp.int32)
        return a - b

    def new_seed(self) -> int:
        """A fresh 63-bit seed for compressed-ciphertext c1 regeneration."""
        self._counter += 1
        return (self.seed * 0x9E3779B97F4A7C15 + self._counter) & 0x7FFFFFFFFFFFFFFF


def uniform_from_seed(seed: int, shape, qtab: dict) -> jnp.ndarray:
    """Regenerate the uniform poly for a stored ciphertext seed
    (ref: ciphertext.h:255 expand_seed)."""
    return _uniform_from_key(jax.random.key(seed), shape, qtab)
