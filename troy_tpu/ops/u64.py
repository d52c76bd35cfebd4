"""uint64 modular arithmetic emulated as (hi, lo) uint32 pairs — the compat
layer for 40-62-bit primes (SEAL-default parameter sets).

TPU-native rebuild of reference src/utils/basics.h (multiply_uint64_uint64,
basics.h:579) and src/utils/uint_small_mod.h (barrett_reduce_uint128,
multiply_uint64_mod, MultiplyUint64Operand) at FULL 64-bit width.  The fast
path (ops/u32.py) restricts primes to (2^28, 2^30) so every residue fits one
u32 lane; this module removes that restriction by representing each residue as
an explicit (hi, lo) pair of u32 arrays and building the 64x64->128 product
from four 32x32->64 products (which are themselves 16-bit-limb products on the
TPU VPU — see u32.mul32_wide).

Cost model: one mul_mod64 is ~4x a u32 mul_mod (4 partial products + a
two-word Barrett), so a 60-bit-limb parameter set runs at roughly half the
throughput of an equal-budget 30-bit-limb set (half the limbs, 4x the work
per limb).  The fast path therefore stays the default; this layer exists for
bit-compatibility with parameter sets fixed by an external protocol.

Conventions (mirroring ops/u32.py):
  * a u64 value is an explicit (hi, lo) pair of jnp.uint32 arrays,
  * moduli q satisfy q < 2^62 (Harvey lazy bound), passed as numpy-scalar
    word pairs so they inline as immediates under jit,
  * ratio = floor(2^128 / q) is passed as four u32 words (two u64 words),
  * all functions are pure, elementwise, broadcasting — they fuse under jit.
"""

from __future__ import annotations

import numpy as _np
import jax.numpy as jnp

from .u32 import (
    U32,
    mul32_wide,
    mul32_hi,
)

# ---------------------------------------------------------------------------
# Host-side constant helpers (pack python ints into u32 word tuples)
# ---------------------------------------------------------------------------

_M32 = (1 << 32) - 1


def words(x: int, n: int = 2) -> tuple:
    """Split a python int into n little-endian u32 numpy-scalar words."""
    return tuple(U32((x >> (32 * i)) & _M32) for i in range(n))


def barrett_ratio_u128(q: int) -> tuple:
    """floor(2^128 / q) as four u32 words (lo64 first), q < 2^62.

    The u64-word analog of Modulus.ratio64_* (ref: modulus.h const_ratio)."""
    r = (1 << 128) // q
    return words(r, 4)


def shoup_word64(w: int, q: int) -> tuple:
    """floor(w * 2^64 / q) as two u32 words, for w < q < 2^62."""
    return words((w << 64) // q, 2)


def pack64(a) -> tuple:
    """numpy uint64/object array -> (hi, lo) u32 arrays (host side)."""
    a = _np.asarray(a, dtype=_np.uint64)
    return (a >> _np.uint64(32)).astype(_np.uint32), a.astype(_np.uint32)


def unpack64(hi, lo):
    """(hi, lo) u32 arrays -> numpy uint64 array (host side)."""
    return (_np.asarray(hi, dtype=_np.uint64) << _np.uint64(32)) | _np.asarray(
        lo, dtype=_np.uint64
    )


# ---------------------------------------------------------------------------
# 64-bit integer primitives on (hi, lo) pairs
# ---------------------------------------------------------------------------

def add64c(a_hi, a_lo, b_hi, b_lo):
    """64-bit add with carry-out: returns (hi, lo, carry)."""
    lo = a_lo + b_lo
    c0 = (lo < a_lo).astype(U32)
    hi = a_hi + b_hi
    c1 = (hi < a_hi).astype(U32)
    hi2 = hi + c0
    c2 = (hi2 < hi).astype(U32)
    return hi2, lo, c1 + c2


def add64(a_hi, a_lo, b_hi, b_lo):
    """64-bit add, wrapping mod 2^64."""
    lo = a_lo + b_lo
    return a_hi + b_hi + (lo < a_lo).astype(U32), lo


def sub64(a_hi, a_lo, b_hi, b_lo):
    """64-bit subtract, wrapping mod 2^64."""
    lo = a_lo - b_lo
    return a_hi - b_hi - (a_lo < b_lo).astype(U32), lo


def geq64(a_hi, a_lo, b_hi, b_lo):
    """a >= b as a bool array."""
    return (a_hi > b_hi) | ((a_hi == b_hi) & (a_lo >= b_lo))


def mul64_lo(a_hi, a_lo, b_hi, b_lo):
    """Low 64 bits of a * b (wrapping product)."""
    t0h, t0l = mul32_wide(a_lo, b_lo)
    # cross terms contribute only their low words to bits [32, 64)
    return t0h + a_hi * b_lo + a_lo * b_hi, t0l


def mul64_wide(a_hi, a_lo, b_hi, b_lo):
    """Full 64x64 -> 128 product as four u32 words (w3, w2, w1, w0).

    Ref: basics.h:579 multiply_uint64_uint64 — there one PTX mul.hi.u64;
    here four 32x32 partial products with explicit carry chains."""
    t0h, t0l = mul32_wide(a_lo, b_lo)
    t1h, t1l = mul32_wide(a_hi, b_lo)
    t2h, t2l = mul32_wide(a_lo, b_hi)
    t3h, t3l = mul32_wide(a_hi, b_hi)
    # w1 = t0h + t1l + t2l  (carry up to 2)
    s = t0h + t1l
    c1 = (s < t0h).astype(U32)
    w1 = s + t2l
    c1 = c1 + (w1 < s).astype(U32)
    # w2 = t1h + t2h + t3l + c1  (carry up to 3 — but total fits 128 bits)
    u = t1h + t2h
    d = (u < t1h).astype(U32)
    u2 = u + t3l
    d = d + (u2 < u).astype(U32)
    w2 = u2 + c1
    d = d + (w2 < u2).astype(U32)
    w3 = t3h + d
    return w3, w2, w1, t0l


def mul64_hi(a_hi, a_lo, b_hi, b_lo):
    """High 64 bits of a * b as a (hi, lo) pair."""
    w3, w2, _, _ = mul64_wide(a_hi, a_lo, b_hi, b_lo)
    return w3, w2


def mul64_wide_k(a_hi, a_lo, b_hi, b_lo):
    """Karatsuba 64x64 -> 128: THREE 32x32 partial products instead of four
    (12 16-bit limb multiplies instead of 16), at the cost of ~15 extra
    cheap VPU ops (diffs, sign selects, carry chains).

    MEASURED NEGATIVE on TPU v5e (kept in-tree with a bit-identity test,
    like the bconv MXU variants): 3.7x SLOWER than the schoolbook
    mul64_wide in a chained elementwise microbenchmark
    (scripts/vpu_opcost.py — schoolbook 20.9 ps/elem vs 77.0).  The VPU
    executes the 16-bit limb products inside mul32_wide at ~1.9 T
    mults/s, far above the add/select throughput needed for the extra
    carry/sign bookkeeping, so trading one 32x32 partial product for
    ~15 compare/select/add ops loses badly.  Do NOT wire this into the
    butterfly/dot hot paths.

    Subtractive variant (no 33-bit cross sums): with
    D = (a_lo - a_hi)(b_lo - b_hi) (signed, |D| < 2^64),
    middle = a_lo*b_hi + a_hi*b_lo = t0 + t3 - D, where t0 = a_lo*b_lo and
    t3 = a_hi*b_hi.  middle < 2^65 is carried as a (bit, hi, lo) triple.
    Bit-identical to mul64_wide (tests/utils/test_u64.py compares them).
    Ref intent: basics.h:579 multiply_uint64_uint64 (one PTX mul.hi.u64
    there; the multiplier-vs-adder trade only exists on the TPU VPU)."""
    t0h, t0l = mul32_wide(a_lo, b_lo)
    t3h, t3l = mul32_wide(a_hi, b_hi)
    da = jnp.maximum(a_lo, a_hi) - jnp.minimum(a_lo, a_hi)
    db = jnp.maximum(b_lo, b_hi) - jnp.minimum(b_lo, b_hi)
    neg = (a_lo < a_hi) != (b_lo < b_hi)  # True -> D < 0 -> middle = u + tm
    tmh, tml = mul32_wide(da, db)
    uh, ul, c0 = add64c(t0h, t0l, t3h, t3l)
    # both branches are cheap; select word-wise
    ah_, al_, c1 = add64c(uh, ul, tmh, tml)
    sh_, sl_ = sub64(uh, ul, tmh, tml)
    borrow = (~geq64(uh, ul, tmh, tml)).astype(U32)
    m_lo = jnp.where(neg, al_, sl_)
    m_hi = jnp.where(neg, ah_, sh_)
    m_2 = jnp.where(neg, c0 + c1, c0 - borrow)  # in {0, 1}: middle < 2^65
    # assemble t3<<64 + middle<<32 + t0
    w1 = t0h + m_lo
    k1 = (w1 < t0h).astype(U32)
    v = t3l + m_hi
    k2 = (v < t3l).astype(U32)
    w2 = v + k1
    k2 = k2 + (w2 < v).astype(U32)
    w3 = t3h + m_2 + k2
    return w3, w2, w1, t0l


# ---------------------------------------------------------------------------
# Modular add/sub/neg for q < 2^63 (ref: uint_small_mod.h add_uint64_mod)
# ---------------------------------------------------------------------------

def cond_sub64(x_hi, x_lo, q_hi, q_lo):
    """x - q if x >= q else x."""
    ge = geq64(x_hi, x_lo, q_hi, q_lo)
    s_hi, s_lo = sub64(x_hi, x_lo, q_hi, q_lo)
    return jnp.where(ge, s_hi, x_hi), jnp.where(ge, s_lo, x_lo)


def add_mod64(a_hi, a_lo, b_hi, b_lo, q_hi, q_lo):
    """(a + b) mod q for a, b in [0, q), q < 2^63 (sum fits 64 bits)."""
    s_hi, s_lo = add64(a_hi, a_lo, b_hi, b_lo)
    return cond_sub64(s_hi, s_lo, q_hi, q_lo)


def sub_mod64(a_hi, a_lo, b_hi, b_lo, q_hi, q_lo):
    """(a - b) mod q for a, b in [0, q)."""
    ge = geq64(a_hi, a_lo, b_hi, b_lo)
    d_hi, d_lo = sub64(a_hi, a_lo, b_hi, b_lo)
    w_hi, w_lo = add64(d_hi, d_lo, q_hi, q_lo)  # a - b + q (wrapping is fine)
    return jnp.where(ge, d_hi, w_hi), jnp.where(ge, d_lo, w_lo)


def neg_mod64(a_hi, a_lo, q_hi, q_lo):
    """(-a) mod q for a in [0, q)."""
    z = (a_hi == 0) & (a_lo == 0)
    d_hi, d_lo = sub64(q_hi, q_lo, a_hi, a_lo)
    return jnp.where(z, a_hi, d_hi), jnp.where(z, a_lo, d_lo)


def div2_mod64(a_hi, a_lo, q_hi, q_lo):
    """a/2 mod q for odd q (ref: uint_small_mod.h divide2_uint64_mod)."""
    odd = (a_lo & U32(1)) == 1
    h_hi = a_hi >> 1
    h_lo = (a_lo >> 1) | (a_hi << 31)
    # odd case: half + (q+1)/2, computed host-side (q words are numpy
    # scalars per the module convention, so this folds at trace time)
    half_q1 = (((int(q_hi) << 32) | int(q_lo)) + 1) >> 1
    qh_hi, qh_lo = U32(half_q1 >> 32), U32(half_q1 & _M32)
    o_hi, o_lo = add64(h_hi, h_lo, qh_hi, qh_lo)
    return jnp.where(odd, o_hi, h_hi), jnp.where(odd, o_lo, h_lo)


# ---------------------------------------------------------------------------
# Barrett reduction of a 128-bit value mod q < 2^62
# (ref: uint_small_mod.h barrett_reduce_uint128 / SEAL barrett_reduce_128)
# ---------------------------------------------------------------------------

def barrett_reduce_u128(x3, x2, x1, x0, q_hi, q_lo, r3, r2, r1, r0):
    """(x3..x0 as a 128-bit little-endian word vector) mod q.

    r3..r0 are the four u32 words of floor(2^128 / q) (barrett_ratio_u128).
    Exact for x < q * 2^64 (always true for products of residues < q) with a
    single conditional subtraction.  Word-for-word the SEAL algorithm with
    every native u64 op expanded to pair arithmetic."""
    # carry = hi64(x_lo64 * r_lo64)
    c_hi, c_lo = mul64_hi(x1, x0, r1, r0)
    # tmp2 = full x_lo64 * r_hi64
    p3, p2, p1, p0 = mul64_wide(x1, x0, r3, r2)
    t1_hi, t1_lo, cc = add64c(p1, p0, c_hi, c_lo)
    t3_hi, t3_lo = add64(p3, p2, U32(0), cc)
    # tmp2 = full x_hi64 * r_lo64
    s3, s2, s1, s0 = mul64_wide(x3, x2, r1, r0)
    t1_hi, t1_lo, cc = add64c(t1_hi, t1_lo, s1, s0)
    c2_hi, c2_lo = add64(s3, s2, U32(0), cc)
    # qhat (low 64 bits) = lo64(x_hi64 * r_hi64) + t3 + c2
    qh_hi, qh_lo = mul64_lo(x3, x2, r3, r2)
    qh_hi, qh_lo = add64(qh_hi, qh_lo, t3_hi, t3_lo)
    qh_hi, qh_lo = add64(qh_hi, qh_lo, c2_hi, c2_lo)
    # remainder = x_lo64 - qhat * q  (fits 64 bits, value < 2q)
    m_hi, m_lo = mul64_lo(qh_hi, qh_lo, q_hi, q_lo)
    rem_hi, rem_lo = sub64(x1, x0, m_hi, m_lo)
    return cond_sub64(rem_hi, rem_lo, q_hi, q_lo)


def barrett_reduce_u64(a_hi, a_lo, q_hi, q_lo, r3, r2, r1, r0):
    """a mod q for a full-range u64 a (ref: modulus.h reduce_uint64)."""
    z = U32(0) * a_hi  # zeros broadcast to a's shape
    return barrett_reduce_u128(z, z, a_hi, a_lo, q_hi, q_lo, r3, r2, r1, r0)


def mul_mod64(a_hi, a_lo, b_hi, b_lo, q_hi, q_lo, r3, r2, r1, r0):
    """a * b mod q for a, b in [0, q), q < 2^62
    (ref: uint_small_mod.h multiply_uint64_mod)."""
    w3, w2, w1, w0 = mul64_wide(a_hi, a_lo, b_hi, b_lo)
    return barrett_reduce_u128(w3, w2, w1, w0, q_hi, q_lo, r3, r2, r1, r0)


# ---------------------------------------------------------------------------
# Shoup multiplication by a precomputed constant
# (ref: uint_small_mod.h MultiplyUint64Operand at full width)
# ---------------------------------------------------------------------------

def shoup_mul64_lazy(x_hi, x_lo, w_hi, w_lo, ws_hi, ws_lo, q_hi, q_lo):
    """x * w mod q in [0, 2q) for w < q < 2^62, ws = floor(w * 2^64 / q),
    any x < 2^64.  One 64-bit mulhi + two 64-bit mullo — the NTT primitive."""
    h_hi, h_lo = mul64_hi(x_hi, x_lo, ws_hi, ws_lo)
    p_hi, p_lo = mul64_lo(x_hi, x_lo, w_hi, w_lo)
    m_hi, m_lo = mul64_lo(h_hi, h_lo, q_hi, q_lo)
    return sub64(p_hi, p_lo, m_hi, m_lo)  # true value in [0, 2q): exact


def shoup_mul64(x_hi, x_lo, w_hi, w_lo, ws_hi, ws_lo, q_hi, q_lo):
    """x * w mod q in [0, q)."""
    r_hi, r_lo = shoup_mul64_lazy(x_hi, x_lo, w_hi, w_lo, ws_hi, ws_lo,
                                  q_hi, q_lo)
    return cond_sub64(r_hi, r_lo, q_hi, q_lo)


# ---------------------------------------------------------------------------
# Wide (128-bit, 4-word) accumulation of products — the dot-product primitive
# for keyswitch inner products at compat width (ref: kernel_ski_util1's
# 128-bit lazy accumulation, evaluator_keyswitching_core.cu).
# ---------------------------------------------------------------------------

def add128(a3, a2, a1, a0, b3, b2, b1, b0):
    """128-bit addition of 4-word little-endian vectors, wrapping mod 2^128."""
    r0 = a0 + b0
    c = (r0 < a0).astype(U32)
    r1 = a1 + b1
    c1 = (r1 < a1).astype(U32)
    r1 = r1 + c
    c1 = c1 + (r1 < c).astype(U32)
    r2 = a2 + b2
    c2 = (r2 < a2).astype(U32)
    r2 = r2 + c1
    c2 = c2 + (r2 < c1).astype(U32)
    r3 = a3 + b3 + c2
    return r3, r2, r1, r0


def dot_mod64_terms(q: int) -> int:
    """Max products of residues < q that a 128-bit accumulator holds while
    staying under the barrett_reduce_u128 exactness bound (sum < q * 2^64)."""
    return max(1, min(16, (1 << 64) // q))


def dot_mod64(pairs, q_hi, q_lo, r3, r2, r1, r0, max_terms: int):
    """sum_i a_i * b_i mod q for a list of ((a_hi, a_lo), (b_hi, b_lo))
    residue pairs with values < q, one Barrett per chunk output.  Chunks of
    max_terms (from dot_mod64_terms for the LARGEST modulus in a stacked
    limb axis) accumulate exactly in 4-word vectors."""
    total = None
    for start in range(0, len(pairs), max_terms):
        acc = None
        for (a_hi, a_lo), (b_hi, b_lo) in pairs[start : start + max_terms]:
            p = mul64_wide(a_hi, a_lo, b_hi, b_lo)
            acc = p if acc is None else add128(*acc, *p)
        part = barrett_reduce_u128(*acc, q_hi, q_lo, r3, r2, r1, r0)
        total = part if total is None else add_mod64(*total, *part, q_hi, q_lo)
    return total
