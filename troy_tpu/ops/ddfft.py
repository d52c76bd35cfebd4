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

NOTE on FMA contraction: XLA's HLO semantics are value-preserving (no
reassociation), but the CPU backend's instruction selection contracts
mul+add/sub pairs into FMAs *per kernel* (LLVM TargetOptions FPOpFusion,
invisible in the emitted LLVM IR).  When a fusion recomputes a product next
to a TwoSum-style subtraction, the contraction silently destroys the error
term — observed: quick_two_sum(a*b, pl) compiled e = pl - (s - fma(a,b,0))
in one kernel while another kernel materialised s from fl(a*b), losing the
product rounding (~2^-24 relative) in decode_device.  The primitives below
are therefore written to be CONTRACTION-IMMUNE BY CONSTRUCTION:

  * _split masks the mantissa in integer space — both halves have <= 12
    significand bits, so every sub-product in two_prod is EXACT in f32 and
    any fma contraction of it is a numerical no-op;
  * two_prod's high result is produced by two_sum (an add node, never a
    raw multiply), so no consumer add/sub can contract around it;
  * the only remaining muls feeding adds are either exact (power-of-two
    scalings, split sub-products) or already-rounded residual cross terms
    whose ulp-level perturbation is inside the dd error budget.

tests/core/test_ckks_device_encode.py asserts the achieved precision.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import u32 as U
from . import u64 as U64
from .jitu import safe_stack

F32 = jnp.float32


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
    """a -> (hi, lo) with a == hi + lo exactly, each half <= 12 significand
    bits.  Integer mantissa masking instead of the classic Veltkamp multiply
    split: truncating the low 12 mantissa bits is exact, lo = a - hi is
    Sterbenz-exact, and — unlike (4097*a - (4097*a - a)) — there is no float
    mul/sub chain a backend FMA contraction or simplifier can collapse."""
    u = jax.lax.bitcast_convert_type(a, jnp.int32)
    hi = jax.lax.bitcast_convert_type(u & jnp.int32(~0xFFF), jnp.float32)
    return hi, a - hi


def two_prod(a, b):
    """p + e ~= a * b with |error| <~ 2^-48 |ab|; p = fl(a*b) or the nearest
    float above/below it.

    All four sub-products of the 12-bit halves are EXACT in f32, and p is
    assembled with two_sum (so it is an add node, not a raw multiply): every
    possible backend FMA contraction is a numerical no-op — see module note."""
    ahi, alo = _split(a)
    bhi, blo = _split(b)
    h1 = ahi * bhi                      # exact (12+12 bits)
    cc, ce = two_sum(ahi * blo, alo * bhi)   # both exact
    p, pe = two_sum(h1, cc)
    e = pe + (ce + alo * blo)           # alo*blo exact; adds round at 2^-48
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
    """Legacy 2-word form of dd_to_words (|value| < 2^46, exact rounding):
    returns (hi24, w0) with  value_rounded = hi24·2^24 + w0 - 2^47.

    The centering shift is applied in INTEGER arithmetic: under jit, XLA's
    algebraic simplifier reassociates float add/sub chains that involve a
    constant operand, which silently destroys a TwoSum error term (observed:
    two_sum(2^47, x) loses up to 2^23 under jit on CPU).  The float stages
    in dd_to_words keep every intermediate exactly representable instead."""
    w0, w1 = dd_to_words(h, l, 2)
    return w1, w0


def dd_to_words(h, l, W: int):
    """Round the dd value h + l to the nearest integer and return W int32
    word arrays [w0..w_{W-1}] (little-endian, each in [0, 2^24)) with

        value_rounded = sum_w w_w * 2^(24*w)  -  2^(24*(W-1) + 23).

    Requires |value| < 2^(24*(W-1) + 23).  W=2 is dd_round_words exactly.

    Error-free stages: round(f32) is exact; splitting an f32 into 24-bit
    word planes via floor(x * 2^-24) is exact (power-of-2 scaling + floor of
    exactly-representable integers); the residual subtraction is Sterbenz-
    exact; carries propagate in int32.  For |value| >= 2^46 the dd pair
    itself carries only ~48 significant bits, so the *rounded integer* is
    within value*2^-47 of the true real — the words are still an exact
    function of that rounded integer (see encode_device tier notes)."""
    rh = jnp.round(h)                       # exact
    d = (h - rh) + l                        # exact (h-rh Sterbenz; + l: f32)
    rl = jnp.round(d)                       # exact; |d - rl| <= 0.5
    r2 = jnp.round(d - rl).astype(jnp.int32)  # ties: in {-1, 0, 1}

    def split_words(x, n_words):
        """f32 integer-valued array -> n_words exact int32 24-bit planes
        (signed; |x| < 2^(24*n_words - 1))."""
        out = []
        cur = x
        for _ in range(n_words - 1):
            q = jnp.floor(cur * np.float32(2.0 ** -24))
            out.append((cur - q * np.float32(1 << 24)).astype(jnp.int32))
            cur = q
        out.append(cur.astype(jnp.int32))
        return out

    wh = split_words(rh, W)
    wl = split_words(rl, max(1, W - 1))     # |rl| <= ulp(h)/2 < 2^(24(W-2)+?)
    words = [wh[i] + (wl[i] if i < len(wl) else 0) for i in range(W)]
    words[0] = words[0] + r2
    # carry-normalize to [0, 2^24) and fold the centering shift into the top
    for i in range(W - 1):
        carry = words[i] >> 24              # arithmetic shift = floor div
        words[i] = words[i] - (carry << 24)
        words[i + 1] = words[i + 1] + carry
    words[W - 1] = words[W - 1] + jnp.int32(1 << 23)
    return words


def words_shift(W: int) -> int:
    """The centering offset dd_to_words folds into the top word."""
    return 1 << (24 * (W - 1) + 23)


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


def frac_crt_fixed(y, r_word_cols, K: int):
    """Fixed-point fractional CRT: residue rows y_i (pre-multiplied by the
    punctured inverses) -> centered fraction  value/Q in (-1/2, 1/2]  as a
    dd pair, via an EXACT integer accumulation

        acc = sum_i y_i * floor(2^(32K) / q_i)   (mod 2^(32K))

    followed by a signed dd conversion of the top four 32-bit words.  Unlike
    the pure-dd frac_crt_dd (whose O(1)-magnitude terms cancel to a tiny
    fraction, leaving ~2^-48 ABSOLUTE error), the cancellation here happens
    in integer arithmetic, so the result keeps ~48 bits RELATIVE precision
    down to fractions as small as 2^-(32(K-4)) — margin-free device decode
    (ref: the reference's device decode composes the big integer instead,
    src/ckks_encoder.cu:1092; this is the TPU-native equivalent).

    y: (..., L, n) u32, or ((..., L, n) hi, lo) pair for wide primes;
    r_word_cols: per-limb list of K u32 numpy words (little-endian) of
    floor(2^(32K)/q_i).  Error: truncation L*2^-(32K) absolute (in fraction
    units) + 2^-48 relative from the dd conversion.

    The accumulation is VECTORIZED over the limb axis: per output word, the
    (up to 4) contributing (..., L, n) product planes are summed exactly via
    16-bit halves (L·4 terms << 2^16, so u32 never overflows), then one
    K-step carry chain normalizes the words.  (A per-limb Python loop with
    chained carry propagation builds an O(L·K)-deep expression tree that the
    XLA:CPU emitter re-emits per consumer — compile time exploded at L=3.)"""
    wide = isinstance(y, tuple)
    L = (y[0] if wide else y).shape[-2]
    proto = (y[0] if wide else y)[..., 0, :]
    r_tab = np.stack(r_word_cols)                      # (L, K) uint32
    rows = [(0, y)] if not wide else [(0, y[1]), (1, y[0])]
    contrib: list = [[] for _ in range(K)]             # u32 planes (..., L, n)
    for off, yr in rows:
        for w in range(K):
            col = r_tab[:, w]
            if not col.any():
                continue
            rw = jnp.asarray(col)[:, None]             # (L, 1) broadcast
            hi, lo = U.mul32_wide(yr, rw)
            if w + off < K:
                contrib[w + off].append(lo)
            if w + off + 1 < K:
                contrib[w + off + 1].append(hi)
    m16 = U.U32(0xFFFF)
    zero = jnp.zeros_like(proto)
    # per-word 64-bit sums, INDEPENDENT of each other (no carry chain yet)
    s_his, s_los = [], []
    for k in range(K):
        if contrib[k]:
            s_lo = sum(jnp.sum(t & m16, axis=-2) for t in contrib[k])
            s_hi = sum(jnp.sum(t >> 16, axis=-2) for t in contrib[k])
            t_hi, t_lo = U.add64(s_hi >> 16, s_hi << 16, zero, s_lo)
        else:
            t_hi, t_lo = zero, zero
        s_his.append(t_hi)
        s_los.append(t_lo)
    # carry propagation as a lax.scan LOOP: an unrolled K-deep carry chain
    # is re-emitted per consumer by the XLA:CPU emitter (runtime exploded
    # 10x from K=6 to K=7, and the K=7 TPU compile stalled >400 s; same
    # pathology family as the jitu.safe_stack concatenate note).  The scan
    # body is compiled ONCE; results are bit-identical.
    from .jitu import safe_stack

    def _carry_body(carry, s):
        h2, l2 = U.add64(s[0], s[1], jnp.zeros_like(s[1]), carry)
        return h2, l2

    _, acc = jax.lax.scan(_carry_body, zero,
                          (safe_stack(s_his), safe_stack(s_los)))
    # signed dd conversion of the top 4 words: two's-complement in the top
    # word gives the CENTERED fraction directly (no cancelling subtraction).
    # The top word is split 17+15 so both f32 halves are exact.
    t = jax.lax.bitcast_convert_type(acc[K - 1], jnp.int32)
    tl_i = t & jnp.int32(0x7FFF)
    th_i = t - tl_i                       # multiple of 2^15, exact in f32
    s32 = np.float32(2.0 ** -32)
    sh, sl = dd_add(th_i.astype(jnp.float32) * s32, jnp.zeros_like(proto, jnp.float32),
                    tl_i.astype(jnp.float32) * s32, jnp.zeros_like(proto, jnp.float32))
    for k in range(2, min(K, 4) + 1):
        wh, wl = u32_to_dd(acc[K - k])
        scale = np.float32(2.0 ** (-32 * k))
        sh, sl = dd_add(sh, sl, wh * scale, wl * scale)
    return sh, sl


def frac_crt_words(moduli, K: int):
    """Host: per-limb little-endian u32 words of floor(2^(32K) / q_i)."""
    out = []
    for m in moduli:
        r = (1 << (32 * K)) // m.value
        out.append(np.array([(r >> (32 * w)) & 0xFFFFFFFF for w in range(K)],
                            dtype=np.uint32))
    return out


def words_to_rns_fast(words, moduli):
    """W int32 24-bit words (dd_to_words) -> (..., L, n) uint32 residues for
    fast-path primes (q < 2^30):
        residue = (sum_w w_w·(2^24w mod q) + (-shift mod q)) mod q
    accumulated exactly in a u64 pair (W+1 products of < 2^54), one Barrett
    per prime."""
    W = len(words)
    shift = words_shift(W)
    ws_u = [w.astype(jnp.uint32) for w in words]
    zero = jnp.zeros_like(ws_u[0])
    outs = []
    for m in moduli:
        d = U.U32((-shift) % m.value)
        phi, plo = U.mul32_wide(ws_u[0], U.U32(1 % m.value))
        for w in range(1, W):
            th, tl = U.mul32_wide(ws_u[w], U.U32(pow(2, 24 * w, m.value)))
            phi, plo = U.add64(phi, plo, th, tl)
        phi, plo = U.add64(phi, plo, zero, jnp.full_like(ws_u[0], d))
        outs.append(U.barrett_reduce_u64(
            phi, plo, U.U32(m.value), U.U32(m.ratio64_hi), U.U32(m.ratio64_lo)))
    return safe_stack(outs, axis=-2)


def words_to_rns_wide(words, moduli):
    """W int32 24-bit words -> (..., 2, L, n) u32-pair residues for wide
    primes (31-60 bits): 128-bit-accumulated dot of the words against
    (2^24w mod q) constants, one two-word Barrett per prime."""
    W = len(words)
    shift = words_shift(W)
    ws_u = [w.astype(jnp.uint32) for w in words]
    zero = jnp.zeros_like(ws_u[0])
    his, los = [], []
    for m in moduli:
        q_hi, q_lo = U.U32(m.value >> 32), U.U32(m.value & 0xFFFFFFFF)
        r0, r1, r2, r3 = (U.U32(w) for w in U64.barrett_ratio_u128(m.value))
        d = (-shift) % m.value
        pairs = [((zero, ws_u[w]),
                  (jnp.full_like(zero, U.U32(pow(2, 24 * w, m.value) >> 32)),
                   jnp.full_like(zero, U.U32(pow(2, 24 * w, m.value)
                                             & 0xFFFFFFFF))))
                 for w in range(W)]
        pairs.append(((zero, jnp.ones_like(ws_u[0])),
                      (jnp.full_like(zero, U.U32(d >> 32)),
                       jnp.full_like(zero, U.U32(d & 0xFFFFFFFF)))))
        o_hi, o_lo = U64.dot_mod64(pairs, q_hi, q_lo, r3, r2, r1, r0,
                                   U64.dot_mod64_terms(m.value))
        his.append(o_hi)
        los.append(o_lo)
    return safe_stack(
        [safe_stack(his, axis=-2), safe_stack(los, axis=-2)], axis=-3)
