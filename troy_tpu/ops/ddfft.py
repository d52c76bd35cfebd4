"""Double-float (f32-pair) complex FFT + exact RNS rounding — the device
CKKS encode pipeline.

TPU-native replacement for the reference's device CKKS encoder
(src/ckks_encoder.cu:231-355: complex-double FFT over `fft_multiply_vector`
plus the three-tier RNS decomposition at src/ckks_encoder.cu:454-692).  TPUs
have no f64 hardware, so the canonical-embedding FFT runs in *double-float*
("double-double on f32") arithmetic: every real number is an unevaluated sum
hi + lo of two f32 values, giving ~48 bits of significand via error-free
transforms (Dekker/Knuth: TwoSum, Split, TwoProd).  That covers CKKS encode
for |scale * value| < 2^46 — the host f64 path (core/ckks_encoder.py)
remains the fallback above that.

The final rounding stage is *exact*: the scaled coefficient is rounded to an
integer represented as an exact f32 pair, shifted positive, decomposed into
two 24-bit words (all error-free), and reduced per RNS prime with the
integer Barrett machinery of ops/u32.py / ops/u64.py.  So the only
approximation in the whole device pipeline is the FFT's O(2^-48) relative
rounding — the RNS residues are a bit-exact function of the rounded
integers, at both prime widths.

Conventions: a dd number is a pair of same-shape jnp.float32 arrays
(hi, lo); a dd complex is a 4-tuple (re_hi, re_lo, im_hi, im_lo).  All
functions broadcast and are meant to be called inside an enclosing jit.

NOTE these error-free transforms rely on IEEE-correct f32 add/sub/mul with
no reassociation.  XLA does not reassociate floating-point ops (its HLO
semantics are value-preserving; fast-math reassociation is off by default on
both CPU and TPU), and FMA contraction can only *tighten* the TwoProd error
term.  tests/core/test_ckks_device_encode.py asserts the achieved precision.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import u32 as U
from . import u64 as U64
from .jitu import safe_stack

F32 = jnp.float32
_SPLIT = np.float32(4097.0)  # 2^12 + 1 (Dekker split constant for f32)


# ---------------------------------------------------------------------------
# Error-free transforms
# ---------------------------------------------------------------------------

def two_sum(a, b):
    """Knuth TwoSum: s + e == a + b exactly, s = fl(a + b)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def quick_two_sum(a, b):
    """Dekker FastTwoSum (requires |a| >= |b| or a == 0)."""
    s = a + b
    e = b - (s - a)
    return s, e


def _split(a):
    t = _SPLIT * a
    hi = t - (t - a)
    return hi, a - hi


def two_prod(a, b):
    """p + e == a * b exactly, p = fl(a * b) (Dekker; FMA-contraction safe)."""
    p = a * b
    ahi, alo = _split(a)
    bhi, blo = _split(b)
    e = ((ahi * bhi - p) + ahi * blo + alo * bhi) + alo * blo
    return p, e


# ---------------------------------------------------------------------------
# dd arithmetic (hi, lo) — relative error ~2^-48
# ---------------------------------------------------------------------------

def dd_add(ah, al, bh, bl):
    sh, sl = two_sum(ah, bh)
    th, tl = two_sum(al, bl)
    sl = sl + th
    sh, sl = quick_two_sum(sh, sl)
    sl = sl + tl
    return quick_two_sum(sh, sl)


def dd_neg(ah, al):
    return -ah, -al


def dd_sub(ah, al, bh, bl):
    return dd_add(ah, al, -bh, -bl)


def dd_mul(ah, al, bh, bl):
    ph, pl = two_prod(ah, bh)
    pl = pl + (ah * bl + al * bh)
    return quick_two_sum(ph, pl)


def cdd_add(a, b):
    """a, b: 4-tuples (re_hi, re_lo, im_hi, im_lo)."""
    rh, rl = dd_add(a[0], a[1], b[0], b[1])
    ih, il = dd_add(a[2], a[3], b[2], b[3])
    return rh, rl, ih, il


def cdd_sub(a, b):
    rh, rl = dd_sub(a[0], a[1], b[0], b[1])
    ih, il = dd_sub(a[2], a[3], b[2], b[3])
    return rh, rl, ih, il


def cdd_mul(a, b):
    """(ar + i·ai)(br + i·bi) in dd."""
    ar_h, ar_l, ai_h, ai_l = a
    br_h, br_l, bi_h, bi_l = b
    t0 = dd_mul(ar_h, ar_l, br_h, br_l)
    t1 = dd_mul(ai_h, ai_l, bi_h, bi_l)
    t2 = dd_mul(ar_h, ar_l, bi_h, bi_l)
    t3 = dd_mul(ai_h, ai_l, br_h, br_l)
    rh, rl = dd_sub(t0[0], t0[1], t1[0], t1[1])
    ih, il = dd_add(t2[0], t2[1], t3[0], t3[1])
    return rh, rl, ih, il


def cdd_mul_real(a, bh, bl):
    """Complex dd times real dd scalar: returns only the real product of
    re(a) — used for the final untwist·factor stage where just the real
    coefficient survives."""
    return dd_mul(a[0], a[1], bh, bl)


# ---------------------------------------------------------------------------
# Host-side dd constant construction
# ---------------------------------------------------------------------------

def split_f64(x: np.ndarray):
    """f64 array -> (hi, lo) f32 pair capturing ~48 of its 53 bits."""
    hi = np.asarray(x, dtype=np.float32)
    lo = np.asarray(x - hi.astype(np.float64), dtype=np.float32)
    return hi, lo


def cdd_tables(z: np.ndarray):
    """complex128 array -> 4-tuple of f32 arrays (re_hi, re_lo, im_hi, im_lo)."""
    rh, rl = split_f64(z.real)
    ih, il = split_f64(z.imag)
    return rh, rl, ih, il


def fft_twiddles(n: int) -> list:
    """Per-stage DIF twiddles w_j = exp(-2·pi·i·j / (2·tt)), j < tt, for
    tt = n/2, n/4, …, 1 — as host cdd tables."""
    out = []
    tt = n // 2
    while tt >= 1:
        j = np.arange(tt)
        out.append(cdd_tables(np.exp(-2j * np.pi * j / (2 * tt))))
        tt //= 2
    return out


def brv_perm(n: int) -> np.ndarray:
    """Bit-reversal permutation: perm[k] = reverse of k in log2(n) bits."""
    logn = n.bit_length() - 1
    k = np.arange(n)
    r = np.zeros(n, dtype=np.int64)
    for b in range(logn):
        r |= ((k >> b) & 1) << (logn - 1 - b)
    return r


# ---------------------------------------------------------------------------
# FFT (np.fft.fft semantics: X_k = sum_j x_j exp(-2 pi i j k / n))
# ---------------------------------------------------------------------------

def fft_dd(x, twiddles):
    """Radix-2 DIF over the last axis.  x: cdd 4-tuple of (..., n) arrays;
    twiddles from fft_twiddles(n) (closure constants under jit).  Output is
    in BIT-REVERSED order — callers gather with brv_perm(n)."""
    n = x[0].shape[-1]
    lead = x[0].shape[:-1]
    tt = n // 2
    si = 0
    while tt >= 1:
        m = n // (2 * tt)
        xr = tuple(c.reshape(lead + (m, 2, tt)) for c in x)
        u = tuple(c[..., 0, :] for c in xr)
        v = tuple(c[..., 1, :] for c in xr)
        top = cdd_add(u, v)
        w = tuple(jnp.asarray(c) for c in twiddles[si])
        bot = cdd_mul(cdd_sub(u, v), w)
        x = tuple(
            safe_stack([t, b], axis=-2).reshape(lead + (n,))
            for t, b in zip(top, bot)
        )
        tt //= 2
        si += 1
    return x


# ---------------------------------------------------------------------------
# Exact rounding + RNS reduction
# ---------------------------------------------------------------------------

_C_SHIFT = 1 << 47  # centering offset: |rounded coeff| must stay < 2^46


def dd_round_words(h, l):
    """Round the dd value h + l (|value| < 2^46) to the nearest integer and
    return (hi24, w0) int32 words with  value_rounded = hi24·2^24 + w0 - 2^47,
    hi24, w0 in [0, 2^24).  Every step is error-free, so the words are an
    exact function of the rounded integer.

    The 2^47 centering shift is applied in INTEGER arithmetic: under jit,
    XLA's algebraic simplifier reassociates float add/sub chains that
    involve a constant operand, which silently destroys a TwoSum error term
    (observed: two_sum(2^47, x) loses up to 2^23 under jit on CPU).  The
    float stages below keep every intermediate exactly representable, so no
    error terms are needed at all."""
    rh = jnp.round(h)              # exact: round of f32 is exact
    fr = (h - rh) + l              # |h - rh| <= 0.5 exactly (nearby floats)
    r2 = jnp.round(fr).astype(jnp.int32)   # in {-1, 0, 1}
    # integer value = rh + r2; split rh into exact 24-bit words:
    h24f = jnp.floor(rh * np.float32(2.0 ** -24))   # exact (|rh| < 2^46)
    remf = rh - h24f * np.float32(1 << 24)          # exact, in [0, 2^24)
    rem_i = remf.astype(jnp.int32) + r2
    carry = rem_i >> 24            # arithmetic shift = floor division
    w0 = rem_i - (carry << 24)
    hi24 = h24f.astype(jnp.int32) + carry + jnp.int32(1 << 23)
    return hi24, w0


def u32_to_dd(x):
    """u32 array -> EXACT dd pair: top 17 bits and low 15 bits, each exactly
    representable in f32 (non-overlapping unevaluated sum)."""
    hi = (x & jnp.uint32(0xFFFF8000)).astype(jnp.float32)
    lo = (x & jnp.uint32(0x7FFF)).astype(jnp.float32)
    return hi, lo


def u64pair_to_dd(hi, lo):
    """(hi, lo) u32-pair value -> dd with ~2^-47 relative error (plenty for
    ratio computations y/q where only the ratio's 48 bits matter)."""
    h = hi.astype(jnp.float32) * np.float32(2.0 ** 32)
    z = jnp.zeros_like(h)
    return dd_add(h, z, lo.astype(jnp.float32), z)


def ratio_dd(num: int, den: float):
    """Host: num/den (python int / float) as an accurate dd constant —
    hi = f64 round, lo = next 24 bits of the exact remainder."""
    from fractions import Fraction

    r = Fraction(num) / Fraction(den)
    hi = np.float32(float(r))
    lo = np.float32(float(r - Fraction(float(hi))))
    return hi, lo


def frac_crt_dd(y, inv_q_tabs):
    """Fractional CRT: residue rows y_i (pre-multiplied by the punctured
    inverses) -> dd fraction sum  s = sum_i y_i / q_i  over the limb axis.
    y: (..., L, n) u32, or a ((..., L, n) hi, lo) pair for wide primes;
    inv_q_tabs: list of per-prime 1/q_i dd constants.  Returns the CENTERED
    fractional part (value/Q in (-1/2, 1/2)) as a dd pair — exact modulo
    the dd 2^-48 rounding because the true sum sits within |c|/Q << 1/2 of
    an integer (ref: rns_base.cu compose semantics via the {t, gamma} /
    fractional decrypt trick)."""
    wide = isinstance(y, tuple)
    L = (y[0] if wide else y).shape[-2]
    sh = sl = None
    for i in range(L):
        if wide:
            dh, dl = u64pair_to_dd(y[0][..., i, :], y[1][..., i, :])
        else:
            dh, dl = u32_to_dd(y[..., i, :])
        iq_h, iq_l = inv_q_tabs[i]
        th, tl = dd_mul(dh, dl, jnp.asarray(iq_h), jnp.asarray(iq_l))
        sh, sl = (th, tl) if sh is None else dd_add(sh, sl, th, tl)
    # centered fraction: the sum is within |c|/Q of an integer
    r = jnp.round(sh)
    return quick_two_sum(sh - r, sl)


def words_to_rns_fast(hi24, w0, moduli):
    """(hi24, w0) int32 words -> (..., L, n) uint32 residues for fast-path
    primes (q < 2^30).  residue = (hi24·(2^24 mod q) + w0 + (-2^47 mod q))
    mod q via one 64-bit Barrett per prime."""
    outs = []
    hi_u = hi24.astype(jnp.uint32)
    w0_u = w0.astype(jnp.uint32)
    zero = jnp.zeros_like(w0_u)
    for m in moduli:
        p24 = U.U32((1 << 24) % m.value)
        d = U.U32((-_C_SHIFT) % m.value)
        phi, plo = U.mul32_wide(hi_u, p24)
        phi, plo = U.add64(phi, plo, zero, w0_u)
        phi, plo = U.add64(phi, plo, zero, jnp.full_like(w0_u, d))
        outs.append(U.barrett_reduce_u64(
            phi, plo, U.U32(m.value), U.U32(m.ratio64_hi), U.U32(m.ratio64_lo)))
    return safe_stack(outs, axis=-2)


def words_to_rns_wide(hi24, w0, moduli):
    """(hi24, w0) words -> (..., 2, L, n) u32-pair residues for wide primes
    (31-60 bits): V = hi24·2^24 + w0 as an exact u64 pair, plus
    (-2^47 mod q), one two-word Barrett per prime."""
    hi_u = hi24.astype(jnp.uint32)
    w0_u = w0.astype(jnp.uint32)
    v_hi = hi_u >> 8
    v_lo = (hi_u << 24) | w0_u
    his, los = [], []
    for m in moduli:
        d = (-_C_SHIFT) % m.value
        d_hi, d_lo = U.U32(d >> 32), U.U32(d & 0xFFFFFFFF)
        r0, r1, r2, r3 = (U.U32(w) for w in U64.barrett_ratio_u128(m.value))
        q_hi, q_lo = U.U32(m.value >> 32), U.U32(m.value & 0xFFFFFFFF)
        a_hi, a_lo = U64.add64(v_hi, v_lo,
                               jnp.full_like(v_hi, d_hi),
                               jnp.full_like(v_lo, d_lo))
        o_hi, o_lo = U64.barrett_reduce_u64(a_hi, a_lo, q_hi, q_lo,
                                            r3, r2, r1, r0)
        his.append(o_hi)
        los.append(o_lo)
    return safe_stack(
        [safe_stack(his, axis=-2), safe_stack(los, axis=-2)], axis=-3)
