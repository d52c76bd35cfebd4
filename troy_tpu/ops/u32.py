"""uint32 wide/modular arithmetic primitives — the device-side scalar core.

TPU-native rebuild of reference src/utils/basics.h (64x64->128 multiply,
basics.h:579) + src/utils/uint_small_mod.h (Barrett / Shoup multiplication).
The TPU VPU has no 64-bit integer multiplier, so every wide operation here is
built from 16-bit limb products inside uint32 lanes.  All functions are pure,
elementwise, broadcasting jnp ops — they fuse into surrounding kernels under
jit and vectorize over arbitrary leading axes (RNS limb axis, batch axis, ...).

Conventions:
  * all inputs/outputs are jnp.uint32 arrays (wrapping arithmetic is exploited),
  * a 64-bit quantity is an explicit (hi, lo) pair of u32 arrays,
  * moduli q satisfy 2^28 < q < 2^30 on the fast path (core/modulus.py), which
    makes Barrett/Shoup/lazy bounds below exact.
"""

from __future__ import annotations

import jax.numpy as jnp

import numpy as _np

# U32 produces a *numpy* scalar: inlined as an immediate in jit traces AND
# legal inside Pallas kernels (jnp scalars would be captured constants).
U32 = _np.uint32
_M16 = U32(0xFFFF)


def u32(x) -> jnp.ndarray:
    return jnp.asarray(x, dtype=jnp.uint32)


# ---------------------------------------------------------------------------
# Wide multiplication via 16-bit limbs (ref: basics.h:579 multiply_uint64_uint64)
# ---------------------------------------------------------------------------

def mul32_wide(a, b):
    """Full 32x32 -> 64 product as a (hi, lo) u32 pair."""
    al = a & _M16
    ah = a >> 16
    bl = b & _M16
    bh = b >> 16
    t0 = al * bl
    t1 = ah * bl
    t2 = al * bh
    t3 = ah * bh
    # cross < 3 * 2^16, t3 + three (<2^16) terms < 2^32: no overflow.
    cross = (t0 >> 16) + (t1 & _M16) + (t2 & _M16)
    hi = t3 + (t1 >> 16) + (t2 >> 16) + (cross >> 16)
    lo = (cross << 16) | (t0 & _M16)
    return hi, lo


def mul32_hi(a, b):
    """floor(a * b / 2^32)."""
    return mul32_wide(a, b)[0]


def add64(a_hi, a_lo, b_hi, b_lo):
    """64-bit addition of (hi, lo) pairs, wrapping mod 2^64."""
    lo = a_lo + b_lo
    carry = (lo < a_lo).astype(U32)
    hi = a_hi + b_hi + carry
    return hi, lo


# ---------------------------------------------------------------------------
# Modular add/sub/neg (ref: uint_small_mod.h add_uint64_mod etc.)
# ---------------------------------------------------------------------------

def cond_sub(x, q):
    """x - q if x >= q else x  (single conditional subtraction)."""
    return jnp.where(x >= q, x - q, x)


def add_mod(a, b, q):
    """(a + b) mod q for a, b in [0, q), q < 2^31."""
    return cond_sub(a + b, q)


def sub_mod(a, b, q):
    """(a - b) mod q for a, b in [0, q)."""
    return jnp.where(a >= b, a - b, a + q - b)


def neg_mod(a, q):
    """(-a) mod q for a in [0, q)."""
    return jnp.where(a == 0, a, q - a)


def div2_mod(a, q):
    """a/2 mod q for odd q (ref: uint_small_mod.h divide2_uint64_mod)."""
    odd = a & U32(1)
    half = a >> 1
    # if a odd: (a + q) / 2 = half + (q+1)/2; q < 2^30 so no overflow.
    return jnp.where(odd == 1, half + ((q + 1) >> 1), half)


# ---------------------------------------------------------------------------
# Barrett reduction of a 64-bit value (ref: modulus.h:44 reduce_uint128,
# SEAL barrett_reduce_128 — here at half width with ratio = floor(2^64/q))
# ---------------------------------------------------------------------------

def barrett_reduce_u64(z_hi, z_lo, q, ratio_hi, ratio_lo):
    """(z_hi * 2^32 + z_lo) mod q, exact for any 64-bit z and q < 2^31.

    ratio_hi/lo are the u32 words of floor(2^64 / q) (Modulus.ratio64_*).
    Result guaranteed in [0, q) after one conditional subtraction (the
    standard Barrett bound gives remainder < 2q before the csub).
    """
    h1 = mul32_hi(z_lo, ratio_lo)
    a_hi, a_lo = mul32_wide(z_lo, ratio_hi)
    b_hi, b_lo = mul32_wide(z_hi, ratio_lo)
    s1 = h1 + a_lo
    c1 = (s1 < h1).astype(U32)
    s2 = s1 + b_lo
    c2 = (s2 < s1).astype(U32)
    qhat = z_hi * ratio_hi + a_hi + b_hi + c1 + c2
    r = z_lo - qhat * q
    return cond_sub(r, q)


def barrett_reduce_u32(z, q, ratio_hi, ratio_lo):
    """z mod q for a full-range u32 z (ref: modulus.h:22 reduce_uint64)."""
    return barrett_reduce_u64(jnp.zeros_like(z), z, q, ratio_hi, ratio_lo)


def mul_mod(a, b, q, ratio_hi, ratio_lo):
    """a * b mod q, exact for a, b in [0, 2^32), q < 2^31
    (ref: uint_small_mod.h multiply_uint64_mod)."""
    hi, lo = mul32_wide(a, b)
    return barrett_reduce_u64(hi, lo, q, ratio_hi, ratio_lo)


# ---------------------------------------------------------------------------
# Shoup multiplication by a precomputed constant
# (ref: uint_small_mod.h:92-148 MultiplyUint64Operand & _lazy)
# ---------------------------------------------------------------------------

def shoup_mul_lazy(x, w, w_shoup, q):
    """x * w mod q in [0, 2q), for w < q, w_shoup = floor(w * 2^32 / q),
    any x < 2^32.  One mulhi + two low multiplies — the NTT inner primitive."""
    hi = mul32_hi(x, w_shoup)
    return x * w - hi * q  # wrapping u32; true value in [0, 2q) so exact


def shoup_mul(x, w, w_shoup, q):
    """x * w mod q in [0, q)."""
    return cond_sub(shoup_mul_lazy(x, w, w_shoup, q), q)


# ---------------------------------------------------------------------------
# Wide (64-bit pair) accumulation of products — the dot-product primitive for
# base conversion and keyswitch inner products (ref: kernel_ski_util1's
# 128-bit lazy accumulation, evaluator_keyswitching_core.cu; at our 30-bit
# limb width a 64-bit accumulator holds up to 16 products exactly).
# ---------------------------------------------------------------------------

WIDE_ACC_MAX_TERMS = 16  # 16 * (2^30-1)^2 < 2^64


def dot_mod(pairs, q, ratio_hi, ratio_lo):
    """sum_i a_i * b_i mod q for a list of (a, b) u32 array pairs with values
    < 2^30, one Barrett per output element.  Chunks of WIDE_ACC_MAX_TERMS
    accumulate exactly in (hi, lo) u32 pairs."""
    total = None
    for start in range(0, len(pairs), WIDE_ACC_MAX_TERMS):
        hi = lo = None
        for a, b in pairs[start : start + WIDE_ACC_MAX_TERMS]:
            phi, plo = mul32_wide(a, b)
            if hi is None:
                hi, lo = phi, plo
            else:
                hi, lo = add64(hi, lo, phi, plo)
        part = barrett_reduce_u64(hi, lo, q, ratio_hi, ratio_lo)
        total = part if total is None else add_mod(total, part, q)
    return total
