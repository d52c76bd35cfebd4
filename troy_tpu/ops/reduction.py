"""Device reductions over polynomial data.

TPU-native rebuild of reference src/utils/reduction.{cu,h} (generic device
max/min/sum/nonzero_count used by noise inspection).  On TPU these are plain
jnp reductions — XLA already emits optimal tree reductions — plus an exact
64-bit sum built from 16-bit-half partial sums (no u64 dtype needed) and the
centered-magnitude reduction used for noise norms.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import u32 as U

_CHUNK = 1 << 15  # chunk sums of 16-bit halves stay < 2^31 (exact in u32)


def max_value(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.max(x)


def min_value(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.min(x)


def nonzero_count(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum((x != 0).astype(jnp.uint32))


def sum_values(x: jnp.ndarray) -> jnp.ndarray:
    """Sum modulo 2^32 (wrapping, like u32 accumulation)."""
    return jnp.sum(x.astype(jnp.uint32), dtype=jnp.uint32)


def sum_values_wide(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact 64-bit sum as a (hi, lo) u32 pair, for arrays of < 2^31
    elements (chunked 16-bit-half accumulation)."""
    flat = x.reshape(-1)
    n = flat.shape[0]
    pad = (-n) % _CHUNK
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,), jnp.uint32)])
    chunks = flat.reshape(-1, _CHUNK)
    lo_sums = jnp.sum(chunks & U.U32(0xFFFF), axis=1, dtype=jnp.uint32)
    hi_sums = jnp.sum(chunks >> U.U32(16), axis=1, dtype=jnp.uint32)
    hi = jnp.zeros((), jnp.uint32)
    lo = jnp.zeros((), jnp.uint32)
    # fold chunk partials with exact 64-bit pair arithmetic (static loop)
    for i in range(chunks.shape[0]):
        hi, lo = U.add64(hi, lo, jnp.zeros((), jnp.uint32), lo_sums[i])
        hi, lo = U.add64(hi, lo, hi_sums[i] >> U.U32(16),
                         hi_sums[i] << U.U32(16))
    return hi, lo


def max_centered_magnitude(x: jnp.ndarray, q) -> jnp.ndarray:
    """max |centered(x)| where x in [0, q): the noise-norm primitive."""
    mag = jnp.minimum(x, q - x)
    return jnp.max(mag)
