"""Multiword integer arithmetic on device: little-endian 16-bit limbs in u32
lanes, limb axis at -2 (shape (..., W, n)).

This is the TPU-native stand-in for the reference's u64/u128 template
instantiations of the ring2k encoder (ref: src/app/bfv_ring2k.cu, templated
over uint64_t/__uint128_t): a k-bit ring element (31 < k <= 128) decomposes
into W = ceil(k/16) limbs, so every product of two limbs fits exactly in one
uint32 lane ((2^16-1)^2 < 2^32) and column sums accumulate in (hi, lo) u32
pairs via ops/u32.add64.  All loops below are static Python loops over limb
indices — XLA unrolls and fuses them; there is no per-coefficient host work.

Conventions:
- x is a jnp uint32 array (..., W, n) with each limb in [0, 2^16).
- constants are Python ints, converted with const_limbs().
- "low k" results keep ceil(k/16) limbs with the top limb masked to k%16
  bits, i.e. the value mod 2^k.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import u32 as U

LIMB_BITS = 16
MASK = 0xFFFF


def width(k: int) -> int:
    """Number of 16-bit limbs covering k bits."""
    return -(-k // LIMB_BITS)


def const_limbs(v: int, w: int) -> list[int]:
    """Host: split a nonnegative int into w 16-bit limbs (little-endian)."""
    if v < 0 or v >> (LIMB_BITS * w):
        raise ValueError(f"[limb.const_limbs] {v} does not fit {w} limbs")
    return [(v >> (LIMB_BITS * i)) & MASK for i in range(w)]


def from_ints(values, k: int) -> np.ndarray:
    """Host: sequence of ints (already reduced mod 2^k) -> (W, n) u32 limbs."""
    w = width(k)
    if k <= 64:
        arr = np.asarray(values, dtype=np.uint64)
        out = np.empty((w, arr.shape[0]), dtype=np.uint32)
        for i in range(w):
            out[i] = ((arr >> np.uint64(LIMB_BITS * i))
                      & np.uint64(MASK)).astype(np.uint32)
        return out
    out = np.empty((w, len(values)), dtype=np.uint32)
    for j, v in enumerate(values):
        v = int(v)
        for i in range(w):
            out[i, j] = (v >> (LIMB_BITS * i)) & MASK
    return out


def to_ints(arr: np.ndarray, k: int):
    """Host: (..., W, n) limbs -> uint64 array (k <= 64) or object array."""
    arr = np.asarray(arr)
    if k <= 64:
        acc = np.zeros(arr.shape[:-2] + arr.shape[-1:], dtype=np.uint64)
        for i in range(arr.shape[-2]):
            acc |= arr[..., i, :].astype(np.uint64) << np.uint64(LIMB_BITS * i)
        return acc
    acc = np.zeros(arr.shape[:-2] + arr.shape[-1:], dtype=object)
    for i in range(arr.shape[-2]):
        acc += arr[..., i, :].astype(object) << (LIMB_BITS * i)
    return acc


def u32_split(x: jnp.ndarray) -> jnp.ndarray:
    """(..., n) u32 values -> (..., 2, n) 16-bit limbs."""
    return jnp.stack([x & U.U32(MASK), x >> U.U32(LIMB_BITS)], axis=-2)


def _carry(cols, out_limbs: int):
    """cols: list of (hi, lo) u32-pair column sums (value < 2^48) ->
    (..., out_limbs, n) normalized limbs.  Sequential ripple over a static
    limb count; trailing columns default to carry only."""
    zero = jnp.zeros_like(cols[0][0]) if cols else None
    out = []
    carry = zero
    for j in range(out_limbs):
        if j < len(cols):
            hi, lo = cols[j]
            hi, lo = U.add64(hi, lo, zero, carry)
        else:
            hi, lo = zero, carry
        out.append(lo & U.U32(MASK))
        # column bound < 2^48 => hi < 2^16, so the carry fits one u32 lane
        carry = (hi << U.U32(LIMB_BITS)) | (lo >> U.U32(LIMB_BITS))
    return jnp.stack(out, axis=-2)


def mul_const_full(x: jnp.ndarray, c: list[int]) -> jnp.ndarray:
    """Full product of (..., W, n) limbs by a constant given as limbs:
    (..., W + len(c), n).  Exact (the product always fits)."""
    w = x.shape[-2]
    wc = len(c)
    zero = jnp.zeros_like(x[..., 0, :])
    cols = []
    for j in range(w + wc - 1):
        hi, lo = zero, zero
        for a in range(max(0, j - wc + 1), min(w, j + 1)):
            cv = c[j - a]
            if cv == 0:
                continue
            p = x[..., a, :] * U.U32(cv)  # < 2^32 exactly
            hi, lo = U.add64(hi, lo, zero, p)
        cols.append((hi, lo))
    return _carry(cols, w + wc)


def low(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Keep the value mod 2^k: ceil(k/16) limbs, top limb masked."""
    w = width(k)
    x = x[..., :w, :]
    r = k % LIMB_BITS
    if r == 0:
        return x
    top = x[..., w - 1 :, :] & U.U32((1 << r) - 1)
    return jnp.concatenate([x[..., : w - 1, :], top], axis=-2)


def mul_const_low(x: jnp.ndarray, c: list[int], k: int) -> jnp.ndarray:
    """(x * c) mod 2^k for constant c (limbs)."""
    w_out = width(k)
    w = x.shape[-2]
    zero = jnp.zeros_like(x[..., 0, :])
    cols = []
    for j in range(w_out):
        hi, lo = zero, zero
        for a in range(max(0, j - len(c) + 1), min(w, j + 1)):
            cv = c[j - a]
            if cv == 0:
                continue
            p = x[..., a, :] * U.U32(cv)
            hi, lo = U.add64(hi, lo, zero, p)
        cols.append((hi, lo))
    return low(_carry(cols, w_out), k)


def dot_const_low(vals: list[jnp.ndarray], consts: list[list[int]],
                  k: int) -> jnp.ndarray:
    """sum_i vals[i] * consts[i] mod 2^k.  vals[i]: (..., n) u32 values
    (any value < 2^32); consts[i]: limb lists.  One shared carry pass."""
    w_out = width(k)
    zero = jnp.zeros_like(vals[0])
    cols = [(zero, zero) for _ in range(w_out)]
    for v, c in zip(vals, consts):
        vl = [v & U.U32(MASK), v >> U.U32(LIMB_BITS)]
        for j in range(w_out):
            hi, lo = cols[j]
            for a in (0, 1):
                b = j - a
                if b < 0 or b >= len(c) or c[b] == 0:
                    continue
                p = vl[a] * U.U32(c[b])
                hi, lo = U.add64(hi, lo, zero, p)
            cols[j] = (hi, lo)
    return low(_carry(cols, w_out), k)


def add_const_low(x: jnp.ndarray, c: list[int], k: int) -> jnp.ndarray:
    """(x + c) mod 2^k for constant c (limbs)."""
    w_out = width(k)
    zero = jnp.zeros_like(x[..., 0, :])
    cols = []
    for j in range(w_out):
        col = x[..., j, :] if j < x.shape[-2] else zero
        if j < len(c) and c[j]:
            col = col + U.U32(c[j])
        cols.append((zero, col))
    return low(_carry(cols, w_out), k)


def sub_low(a: jnp.ndarray, b: jnp.ndarray, k: int) -> jnp.ndarray:
    """(a - b) mod 2^k via two's complement of b; b may have fewer limbs."""
    w_out = width(k)
    zero = jnp.zeros_like(a[..., 0, :])
    cols = []
    for j in range(w_out):
        av = a[..., j, :] if j < a.shape[-2] else zero
        bv = b[..., j, :] if j < b.shape[-2] else zero
        col = av + (U.U32(MASK) - bv)
        if j == 0:
            col = col + U.U32(1)
        cols.append((zero, col))
    return low(_carry(cols, w_out), k)


def add_bit(x: jnp.ndarray, bit: int) -> jnp.ndarray:
    """x + 2^bit, keeping x's limb count (caller guarantees no overflow
    past the top limb)."""
    w = x.shape[-2]
    zero = jnp.zeros_like(x[..., 0, :])
    cols = []
    for j in range(w):
        col = x[..., j, :]
        if j == bit // LIMB_BITS:
            col = col + U.U32(1 << (bit % LIMB_BITS))
        cols.append((zero, col))
    return _carry(cols, w)


def shift_right(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """floor(x / 2^k): drops k//16 limbs then bit-shifts across limbs."""
    s, r = divmod(k, LIMB_BITS)
    x = x[..., s:, :]
    if r == 0:
        return x
    w = x.shape[-2]
    zero = jnp.zeros_like(x[..., 0, :])
    out = []
    for j in range(w):
        nxt = x[..., j + 1, :] if j + 1 < w else zero
        out.append(((x[..., j, :] >> U.U32(r))
                    | (nxt << U.U32(LIMB_BITS - r))) & U.U32(MASK))
    return jnp.stack(out, axis=-2)


def get_bit(x: jnp.ndarray, bit: int) -> jnp.ndarray:
    """(..., n) 0/1 u32: bit `bit` of each value."""
    return (x[..., bit // LIMB_BITS, :] >> U.U32(bit % LIMB_BITS)) & U.U32(1)


def fold_mod_q(x: jnp.ndarray, pow_cols: list, q, ratio_hi, ratio_lo):
    """(..., W, n) limbs -> (..., L, n) value mod q_i, via
    sum_w limb_w * (2^(16w) mod q_i) with wide accumulation (u32.dot_mod).
    pow_cols[w] is the (L, 1) column of 2^(16w) mod q_i (values < 2^30, so
    products stay under dot_mod's exactness bound)."""
    pairs = [
        (x[..., w, :][..., None, :], pow_cols[w]) for w in range(x.shape[-2])
    ]
    return U.dot_mod(pairs, q, ratio_hi, ratio_lo)
