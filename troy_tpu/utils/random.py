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

import hashlib
import secrets

import jax
import jax.numpy as jnp

from ..ops import u32 as U
from ..ops.jitu import pack_jit

NOISE_MAX_DEVIATION = 21  # CBD bound, sigma ~ 3.2 (ref: rlwe noise sampler)
_MASK21 = (1 << 21) - 1
_M63 = (1 << 63) - 1


def _bits2(keys, shape) -> jnp.ndarray:
    """XOR of two independently-keyed threefry streams.  A single threefry
    key holds only 64 bits of state, so one stream caps the sampling keyspace
    at 2^64; XORing streams keyed by independent halves of the 128-bit master
    seed restores a 128-bit keyspace (matching the reference's AES-128 PRF,
    random_generator.h:42)."""
    ka, kb = keys
    return jax.random.bits(ka, shape, jnp.uint32) ^ jax.random.bits(
        kb, shape, jnp.uint32)


# ---------------------------------------------------------------------------
# Pure key-parameterized samplers: traceable bodies of the threefry-mode
# RandomGenerator.sample_* methods, for fusing the WHOLE sampling+combine
# encryption into one jitted kernel (core/rlwe.py).  Each takes an explicit
# (key_a, key_b) pair (as produced by RandomGenerator.next_key_pairs) and is
# bit-identical to the corresponding stateful sampler call.
# ---------------------------------------------------------------------------

def uniform_from_keys(keys, shape, qtab: dict) -> jnp.ndarray:
    """Traceable twin of sample_uniform (threefry mode), shape = (..., L, n)."""
    if qtab.get("words", 1) == 2:
        L = qtab["q_hi"].shape[0]
        bits = _bits2(keys, (4,) + tuple(shape[:-2]) + (L, shape[-1]))
        return _wide_uniform_from_bits(bits, qtab)
    L = qtab["q"].shape[0]
    bits = _bits2(keys, (2,) + tuple(shape[:-2]) + (L, shape[-1]))
    return _uniform_from_bits(bits, shape, qtab)


def ternary_from_keys(keys, shape_n, qtab: dict) -> jnp.ndarray:
    """Traceable twin of sample_ternary (threefry mode), shape_n = (..., n)."""
    if qtab.get("words", 1) == 2:
        r = _bits2(keys, tuple(shape_n)) % U.U32(3)
        e = jnp.where(r == 2, jnp.int32(-1), r.astype(jnp.int32))
        return _wide_lift_small(e, qtab)
    return _ternary_from_bits(_bits2(keys, tuple(shape_n)), qtab)


def cbd_from_keys(keys, shape_n, qtab: dict) -> jnp.ndarray:
    """Traceable twin of sample_cbd (threefry mode), shape_n = (..., n)."""
    bits = _bits2(keys, (2,) + tuple(shape_n))
    if qtab.get("words", 1) == 2:
        a = jnp.bitwise_count(bits[0] & U.U32(_MASK21)).astype(jnp.int32)
        b = jnp.bitwise_count(bits[1] & U.U32(_MASK21)).astype(jnp.int32)
        return _wide_lift_small(a - b, qtab)
    return _cbd_from_bits(bits, shape_n, qtab)


@pack_jit
def _uniform_from_bits(bits, shape, qtab: dict) -> jnp.ndarray:
    """Uniform residues in [0, q) per limb from a (2,)+(...,L,n) bit tensor:
    64 random bits Barrett-reduced (same negligible modulo bias as the
    reference's AES-CTR mod q)."""
    L = qtab["q"].shape[0]
    lead = (1,) * (len(shape) - 2)
    q = qtab["q"].reshape(lead + (L, 1))
    hi = qtab["ratio_hi"].reshape(lead + (L, 1))
    lo = qtab["ratio_lo"].reshape(lead + (L, 1))
    return U.barrett_reduce_u64(bits[0], bits[1], q, hi, lo)


@pack_jit
def _uniform_from_key(key, shape, qtab: dict) -> jnp.ndarray:
    """Single-key variant: used only for c1 regeneration from a *published*
    ciphertext seed (ref: ciphertext.h:255), where the seed itself is public."""
    if qtab.get("words", 1) == 2:
        L = qtab["q_hi"].shape[0]
        bits = jax.random.bits(
            key, (4,) + tuple(shape[:-2]) + (L, shape[-1]), jnp.uint32)
        return _wide_uniform_from_bits(bits, qtab)
    L = qtab["q"].shape[0]
    bits = jax.random.bits(key, (2,) + tuple(shape[:-2]) + (L, shape[-1]), jnp.uint32)
    return _uniform_from_bits(bits, shape, qtab)


def _wide_cols(qtab: dict):
    return qtab["q_hi"][:, None], qtab["q_lo"][:, None]


def _wide_ratio(qtab: dict):
    return (qtab["r3"][:, None], qtab["r2"][:, None],
            qtab["r1"][:, None], qtab["r0"][:, None])


@pack_jit
def _wide_uniform_from_bits(bits, qtab: dict) -> jnp.ndarray:
    """128 random bits Barrett-reduced mod each wide prime: bias < 2^-66
    (the wide analog of _uniform_from_bits; ref: AES-CTR mod q sampling)."""
    from ..ops import u64 as W
    from ..ops import rp as R

    qh, ql = _wide_cols(qtab)
    return R.pair(*W.barrett_reduce_u128(
        bits[3], bits[2], bits[1], bits[0], qh, ql, *_wide_ratio(qtab)))


@pack_jit
def _wide_lift_small(e, qtab: dict) -> jnp.ndarray:
    """Signed small values e (int32, |e| << 2^31, shape (..., n)) lifted to
    wide residues (..., 2, L, n): negative values become q + e."""
    from ..ops import rp as R
    from ..ops import u32 as _U

    qh, ql = _wide_cols(qtab)
    ej = e[..., None, :]
    neg = ej < 0
    mag = jnp.where(neg, -ej, ej).astype(jnp.uint32)
    borrow = (ql < mag) & neg
    hi = jnp.where(neg, qh - borrow.astype(_U.U32), _U.U32(0) * mag)
    lo = jnp.where(neg, ql - mag, mag)
    L = qtab["q_hi"].shape[0]
    tgt = ej.shape[:-2] + (L, ej.shape[-1])
    return R.pair(jnp.broadcast_to(hi, tgt), jnp.broadcast_to(lo, tgt))


@pack_jit
def _ternary_from_bits(r, qtab: dict) -> jnp.ndarray:
    """Ternary secret {-1, 0, 1} lifted to every limb: (..., L, n).
    r holds uniform u32 words; % 3 bias is 2^-32-negligible (the reference
    samples the same way from its AES words)."""
    r = r % U.U32(3)
    L = qtab["q"].shape[0]
    lead = (1,) * (r.ndim - 1)
    q = qtab["q"].reshape(lead + (L, 1))
    e = r[..., None, :]  # 0,1,2
    return jnp.where(e == 2, q - U.U32(1), jnp.broadcast_to(e, e.shape[:-2] + (L, e.shape[-1])))


@pack_jit
def _cbd_from_bits(bits, shape_n, qtab: dict) -> jnp.ndarray:
    """Centered binomial (sum of 21 bits minus sum of 21 bits), lifted to all
    limbs (ref: random_generator.cu sample_poly_centered_binomial)."""
    a = jnp.bitwise_count(bits[0] & U.U32(_MASK21)).astype(jnp.int32)
    b = jnp.bitwise_count(bits[1] & U.U32(_MASK21)).astype(jnp.int32)
    e = a - b  # [-21, 21]
    L = qtab["q"].shape[0]
    lead = (1,) * (len(shape_n) - 1)
    q = qtab["q"].reshape(lead + (L, 1)).astype(jnp.int32)
    e = e[..., None, :]
    lifted = jnp.where(e < 0, q + e, jnp.broadcast_to(e, e.shape[:-2] + (L, e.shape[-1])))
    return lifted.astype(jnp.uint32)


def fold_in_keys(base_keys, counter):
    """Traceable twin of RandomGenerator._next_keys for a reserved counter
    (int or traced scalar)."""
    ka, kb = base_keys
    return jax.random.fold_in(ka, counter), jax.random.fold_in(kb, counter)


class RandomGenerator:
    """Stateful deterministic sampler (ref: random_generator.h:42-95).

    mode='threefry' (default): JAX counter-based PRF, device-resident.
    mode='aes'    : native AES-128-CTR keystream (troy_tpu/native), the
                    reference's PRF — for cross-library parity vectors; bytes
                    are generated host-side and uploaded.
    """

    def __init__(self, seed: int | None = None, mode: str = "threefry",
                 domain: str = ""):
        if seed is None:
            seed = secrets.randbits(128)  # >= 128-bit master entropy
        self.seed = int(seed)
        self.mode = mode
        self.domain = domain
        if mode not in ("threefry", "aes"):
            raise ValueError(f"[RandomGenerator] unknown mode {mode}")
        # Derive per-consumer PRF keys one-way from (master seed, domain):
        # never key the PRF with the raw seed, and give each consumer
        # (Encryptor/KeyGenerator/...) an independent stream even when they
        # share a context seed.
        self._seed_bytes = hashlib.blake2b(
            str(self.seed).encode(), digest_size=32, person=b"troyseed").digest()
        dk = hashlib.blake2b(self._seed_bytes + domain.encode(),
                             digest_size=16, person=b"troy-prf").digest()
        self._key_a = jax.random.key(int.from_bytes(dk[:8], "little") & _M63)
        self._key_b = jax.random.key(int.from_bytes(dk[8:], "little") & _M63)
        self._counter = 0
        self._seed_counter = 0
        if mode == "aes":
            from .. import native

            if not native.available():
                raise RuntimeError("[RandomGenerator] native AES unavailable")
            # 16 independently-derived key bytes (not the seed duplicated)
            self._aes_key = hashlib.blake2b(
                self._seed_bytes + domain.encode(), digest_size=16,
                person=b"troy-aes").digest()

    def _next_keys(self):
        c = self._counter
        self._counter += 1
        return (jax.random.fold_in(self._key_a, c),
                jax.random.fold_in(self._key_b, c))

    def next_key_pairs(self, k: int):
        """Reserve k key pairs for use inside a fused jitted kernel via the
        pure *_from_keys samplers, advancing the stream counter exactly as k
        stateful sample_* calls would (threefry mode only)."""
        if self.mode != "threefry":
            raise ValueError("[RandomGenerator] next_key_pairs requires threefry")
        return [self._next_keys() for _ in range(k)]

    def reserve_counters(self, k: int) -> int:
        """Reserve k stream positions and return the FIRST counter value —
        the zero-dispatch variant of next_key_pairs: the fused kernel derives
        pair i as fold_in_keys(base_keys, first + i) INSIDE its trace (an
        eager fold_in costs a host XLA dispatch per call, ~1 ms each on CPU,
        which dominated host encrypt latency)."""
        if self.mode != "threefry":
            raise ValueError("[RandomGenerator] reserve_counters requires threefry")
        c = self._counter
        self._counter += k
        return c

    @property
    def base_keys(self):
        """The per-generator PRF key pair, for passing into fused kernels
        (jit ARGUMENTS, never trace constants: the per-level kernel cache is
        shared across generator instances)."""
        return self._key_a, self._key_b

    def _aes_words(self, count: int):
        """count uint32 words from the AES-CTR stream (block counter advances
        by the consumed blocks; matches random_generator.h:42-47 layout)."""
        import numpy as np

        from .. import native

        nbytes = count * 4
        blocks = (nbytes + 15) // 16
        raw = native.aes128_ctr_bytes(self._aes_key, self._counter, blocks * 16)
        self._counter += blocks
        return np.frombuffer(raw[:nbytes], dtype=np.uint32)

    # -- samplers (ref: random_generator.h:75-80) ---------------------------
    def sample_uniform(self, shape, qtab: dict) -> jnp.ndarray:
        """shape = (..., L, n) residues uniform mod each q (wide packs get
        the extra word axis at -3, ops/rp.py layout)."""
        if qtab.get("words", 1) == 2:
            L = qtab["q_hi"].shape[0]
            if self.mode == "aes":
                import numpy as np
                import math

                count = int(math.prod(shape))
                words = self._aes_words(4 * count).reshape(4, *shape)
                wide = (words[0].astype(object)
                        | (words[1].astype(object) << 32)
                        | (words[2].astype(object) << 64)
                        | (words[3].astype(object) << 96))
                qs = np.asarray(qtab["q_hi"], dtype=np.uint64).astype(object) * (1 << 32) \
                    + np.asarray(qtab["q_lo"], dtype=np.uint64).astype(object)
                res = wide % qs.reshape((1,) * (len(shape) - 2) + (L, 1))
                hi = (res >> 32).astype(np.uint32)
                lo = (res & 0xFFFFFFFF).astype(np.uint32)
                return jnp.stack([jnp.asarray(hi), jnp.asarray(lo)], axis=-3)
            return uniform_from_keys(self._next_keys(), shape, qtab)
        if self.mode == "aes":
            import numpy as np
            import math

            count = int(math.prod(shape))
            words = self._aes_words(2 * count)
            hi = jnp.asarray(words[:count].reshape(shape))
            lo = jnp.asarray(words[count:].reshape(shape))
            L = qtab["q"].shape[0]
            lead = (1,) * (len(shape) - 2)
            return U.barrett_reduce_u64(
                hi, lo, qtab["q"].reshape(lead + (L, 1)),
                qtab["ratio_hi"].reshape(lead + (L, 1)),
                qtab["ratio_lo"].reshape(lead + (L, 1)))
        return uniform_from_keys(self._next_keys(), shape, qtab)

    def sample_ternary(self, shape_n, qtab: dict) -> jnp.ndarray:
        if qtab.get("words", 1) == 2:
            if self.mode == "aes":
                import numpy as np
                import math

                count = int(math.prod(shape_n))
                words = self._aes_words(count)
                r = jnp.asarray((words % 3).reshape(shape_n).astype(np.uint32))
            else:
                return ternary_from_keys(self._next_keys(), shape_n, qtab)
            # 0 -> 0, 1 -> 1, 2 -> -1 (same mapping as the u32 path)
            e = jnp.where(r == 2, jnp.int32(-1), r.astype(jnp.int32))
            return _wide_lift_small(e, qtab)
        if self.mode == "aes":
            import numpy as np
            import math

            count = int(math.prod(shape_n))
            words = self._aes_words(count)
            r = jnp.asarray((words % 3).reshape(shape_n).astype(np.uint32))
            L = qtab["q"].shape[0]
            lead = (1,) * (len(shape_n) - 1)
            q = qtab["q"].reshape(lead + (L, 1))
            e = r[..., None, :]
            return jnp.where(e == 2, q - U.U32(1),
                             jnp.broadcast_to(e, e.shape[:-2] + (L, e.shape[-1])))
        return ternary_from_keys(self._next_keys(), shape_n, qtab)

    def sample_cbd(self, shape_n, qtab: dict) -> jnp.ndarray:
        if qtab.get("words", 1) == 2:
            if self.mode == "aes":
                import numpy as np
                import math

                count = int(math.prod(shape_n))
                words = self._aes_words(2 * count)
                a = np.bitwise_count(words[:count] & _MASK21).astype(np.int32)
                b = np.bitwise_count(words[count:] & _MASK21).astype(np.int32)
                e = jnp.asarray((a - b).reshape(shape_n))
            else:
                return cbd_from_keys(self._next_keys(), shape_n, qtab)
            return _wide_lift_small(e, qtab)
        if self.mode == "aes":
            import numpy as np
            import math

            count = int(math.prod(shape_n))
            words = self._aes_words(2 * count)
            a = np.bitwise_count(words[:count] & _MASK21).astype(np.int64)
            b = np.bitwise_count(words[count:] & _MASK21).astype(np.int64)
            e = (a - b).reshape(shape_n)
            L = qtab["q"].shape[0]
            lead = (1,) * (len(shape_n) - 1)
            q = qtab["q"].reshape(lead + (L, 1))
            ej = jnp.asarray(e.astype(np.int32))[..., None, :]
            lifted = jnp.where(ej < 0, q.astype(jnp.int32) + ej.astype(jnp.int32),
                               jnp.broadcast_to(ej, ej.shape[:-2] + (L, ej.shape[-1])).astype(jnp.int32))
            return lifted.astype(jnp.uint32)
        return cbd_from_keys(self._next_keys(), shape_n, qtab)

    def sample_cbd_signed(self, shape_n) -> jnp.ndarray:
        """Raw centered-binomial integers (int32), not limb-lifted."""
        bits = _bits2(self._next_keys(), (2,) + tuple(shape_n))
        a = jnp.bitwise_count(bits[0] & U.U32(_MASK21)).astype(jnp.int32)
        b = jnp.bitwise_count(bits[1] & U.U32(_MASK21)).astype(jnp.int32)
        return a - b

    def new_seed(self) -> int:
        """A fresh nonzero 63-bit seed for compressed-ciphertext c1
        regeneration.  One-way in the master seed (blake2b of seed, domain and
        a counter): the published value reveals nothing about the PRF keys
        (the reference likewise publishes PRF *output*, rlwe.cu
        c1_prng.sample_uint64(), and rejects 0 as its 'no seed' sentinel)."""
        while True:
            self._seed_counter += 1
            digest = hashlib.blake2b(
                self._seed_bytes + self.domain.encode()
                + self._seed_counter.to_bytes(8, "little"),
                digest_size=8, person=b"troyseed").digest()
            s = int.from_bytes(digest, "little") & _M63
            if s != 0:
                return s


def uniform_from_seed(seed: int, shape, qtab: dict) -> jnp.ndarray:
    """Regenerate the uniform poly for a stored ciphertext seed
    (ref: ciphertext.h:255 expand_seed)."""
    return _uniform_from_key(jax.random.key(seed), shape, qtab)
