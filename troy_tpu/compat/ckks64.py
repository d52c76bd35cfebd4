"""CKKS at 40-62-bit-prime width (compat mode) on (hi, lo) u32 pairs.

A self-contained CKKS stack for SEAL-default parameter sets (e.g. n=8192,
primes {60, 40, 40, 60}, scale 2^40) that the u32 fast path cannot express.
Mirrors the semantics of the main stack (core/evaluator.py CKKS branches,
which rebuild reference src/evaluator.cu) with every residue held as an
explicit (hi, lo) u32 pair and all modular arithmetic from ops/u64.py /
ops/ntt64.py.  Reference call-outs:

  encrypt/decrypt       ref: src/encryptor.cu, src/decryptor.cu (phase)
  multiply/relinearize  ref: src/evaluator.cu ckks_multiply,
                        evaluator_keyswitching_core.cu (GHS single special
                        prime; digits here ARE Barrett-reduced per output
                        prime because compat primes of mixed sizes break the
                        u32 path's q_i < 2*p_j lazy-digit shortcut)
  rescale               ref: src/utils/rns_tool.cu divide_and_round_q_last_ntt
  rotate/conjugate      ref: src/evaluator.cu apply_galois (NTT-domain gather)

Scope notes: encode/decode and key sampling are host-side (client ops);
everything homomorphic is jitted device code.  This is the compat layer —
the u32 fast path remains the performance path (see ops/u64.py cost model).
"""

from __future__ import annotations

import hashlib
import secrets

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import u64 as W
from ..ops import ntt64 as N64
from ..ops.u32 import U32
from ..ops.galois import GaloisTool
from ..utils import numth

_M32 = (1 << 32) - 1


def _pairs_from_ints(vals_per_limb: list[list[int]]):
    """[[int residues]] per limb -> (hi, lo) jnp (L, n) pair."""
    a = np.array(vals_per_limb, dtype=np.uint64)
    hi, lo = W.pack64(a)
    return jnp.asarray(hi), jnp.asarray(lo)


def _q_cols(tab, keys=("q_hi", "q_lo")):
    """Per-limb scalar arrays reshaped (L, 1) for broadcast over coeffs."""
    return tuple(tab[k][:, None] for k in keys)


def _cached_jit(cache: dict, key, builder):
    """Per-(op, level, shape) jitted kernels — eager dispatch through a
    remote-TPU tunnel costs ~0.1-1 s per op, so EVERY device-math path here
    (including the client-side encode/encrypt/keygen ones) runs as one
    compiled function."""
    if key not in cache:
        cache[key] = jax.jit(builder())
    return cache[key]


class _Blake2Rng:
    """CSPRNG with the tiny slice of the numpy-Generator surface this stack
    uses (`integers`).  Keyed blake2b counter stream — key/noise sampling must
    not come from a non-cryptographic PCG64 (advisor finding); fixed seeds
    remain available for explicit parity-vector testing."""

    def __init__(self, seed: int):
        self._key = hashlib.blake2b(str(int(seed)).encode(), digest_size=32,
                                    person=b"troy64rng").digest()
        self._ctr = 0

    def _bytes(self, n: int) -> bytes:
        out = bytearray()
        while len(out) < n:
            out += hashlib.blake2b(self._key + self._ctr.to_bytes(8, "little"),
                                   digest_size=64).digest()
            self._ctr += 1
        return bytes(out[:n])

    def integers(self, low, high, size=None, dtype=np.int64):
        """Uniform in [low, high) with <= 2^-32 modulo bias (16 random bytes
        per draw for wide ranges)."""
        rng_range = int(high) - int(low)
        shape = () if size is None else (
            (size,) if isinstance(size, int) else tuple(size))
        cnt = int(np.prod(shape)) if shape else 1
        if rng_range <= (1 << 32):
            v = np.frombuffer(self._bytes(cnt * 8), dtype=np.uint64)
            vals = (v % np.uint64(rng_range)).astype(np.int64) + int(low)
            return vals.reshape(shape).astype(dtype)
        v = np.frombuffer(self._bytes(cnt * 16), dtype=np.uint64).reshape(cnt, 2)
        wide = v[:, 0].astype(object) | (v[:, 1].astype(object) << 64)
        vals = (wide % rng_range) + int(low)
        return vals.astype(dtype).reshape(shape)


class LevelData:
    """Per-level tables and constants (the ContextData analog)."""

    def __init__(self, log_n: int, primes: list[int], special: int):
        self.primes = primes
        self.L = L = len(primes)
        self.special = special
        self.tables = N64.NTT64Tables(log_n, primes)
        self.tab = self.tables.pack()
        self.key_tables = N64.NTT64Tables(log_n, primes + [special])
        self.otab = self.key_tables.pack()
        self.sp_tables = N64.NTT64Tables(log_n, [special])
        self.sp_tab = self.sp_tables.pack()
        self.Q = 1
        for q in primes:
            self.Q *= q
        # keyswitch constants (ref: evaluator.py _switch_tables at u32 width)
        sp = special
        self.sp_words = (U32(sp >> 32), U32(sp & _M32))
        sp_half = sp >> 1
        self.sp_half_words = (U32(sp_half >> 32), U32(sp_half & _M32))
        self.sp_half_mod_q = _pairs_from_ints([[sp_half % q] for q in primes])
        inv_sp = [numth.invert_mod(sp % q, q) for q in primes]
        self.inv_sp = _pairs_from_ints([[v] for v in inv_sp])
        self.inv_sp_shoup = _pairs_from_ints(
            [[(v << 64) // q] for v, q in zip(inv_sp, primes)])
        self.max_terms = W.dot_mod64_terms(max(primes + [special]))
        # rescale constants for dropping q_{L-1} (if a next level exists)
        if L > 1:
            ql = primes[-1]
            self.last_tables = N64.NTT64Tables(log_n, [ql])
            self.last_tab = self.last_tables.pack()
            self.ql_words = (U32(ql >> 32), U32(ql & _M32))
            half = ql >> 1
            self.ql_half_words = (U32(half >> 32), U32(half & _M32))
            rest = primes[:-1]
            self.ql_half_mod_q = _pairs_from_ints([[half % q] for q in rest])
            inv_ql = [numth.invert_mod(ql % q, q) for q in rest]
            self.inv_ql = _pairs_from_ints([[v] for v in inv_ql])
            self.inv_ql_shoup = _pairs_from_ints(
                [[(v << 64) // q] for v, q in zip(inv_ql, rest)])


class Ckks64Context:
    """Modulus chain for compat-mode CKKS.  bit_sizes: data prime sizes plus
    the special prime last, each in [40, 62) — e.g. (60, 40, 40, 60)."""

    def __init__(self, log_n: int, bit_sizes: tuple, scale: float = 2.0 ** 40,
                 seed: int | None = None):
        self.log_n = log_n
        self.n = 1 << log_n
        self.scale = scale
        # fresh OS entropy by default; pass an explicit seed only for
        # reproducible benchmarks / parity-vector tests
        self.seed = secrets.randbits(128) if seed is None else seed
        counts: dict[int, int] = {}
        for b in bit_sizes:
            counts[b] = counts.get(b, 0) + 1
        pool = {b: numth.get_primes(2 * self.n, b, c) for b, c in counts.items()}
        order = []
        for b in bit_sizes:
            order.append(pool[b].pop(0))
        self.data_primes = order[:-1]
        self.special = order[-1]
        self.levels = [
            LevelData(log_n, self.data_primes[:L], self.special)
            for L in range(len(self.data_primes), 0, -1)
        ]
        # one jit cache shared by every encoder/keygen/encryptor/decryptor/
        # evaluator bound to this context: a second instance must not pay the
        # (remote-TPU, ~30 s each) compiles again
        self.jit_cache: dict = {}

    def level(self, idx: int) -> LevelData:
        return self.levels[idx]

    @property
    def key_level(self) -> LevelData:
        return self.levels[0]


class Ciphertext64:
    """size polynomials in NTT form: (hi, lo) arrays of shape (size, L, n)."""

    def __init__(self, hi, lo, level: int, scale: float):
        self.hi, self.lo = hi, lo
        self.level = level
        self.scale = scale

    @property
    def size(self) -> int:
        return self.hi.shape[0]


class Ckks64Encoder:
    """Canonical-embedding encode/decode at compat width (host-side, same
    twisted-FFT math as core/ckks_encoder.py; ref: src/ckks_encoder.cu)."""

    def __init__(self, ctx: Ckks64Context):
        self.ctx = ctx
        self._jit_cache = ctx.jit_cache
        n = ctx.n
        self.slots = n // 2
        m = 2 * n
        e = 1
        idx = np.empty(self.slots, dtype=np.int64)
        idx_conj = np.empty(self.slots, dtype=np.int64)
        for k in range(self.slots):
            idx[k] = (e - 1) // 2
            idx_conj[k] = (m - e - 1) // 2
            e = e * 3 % m
        self._idx, self._idx_conj = idx, idx_conj
        i = np.arange(n)
        self._twist = np.exp(1j * np.pi * i / n)
        self._untwist = np.conj(self._twist)

    @property
    def slot_count(self) -> int:
        return self.slots

    def _ints_to_pairs(self, ints: list[int], lvl: LevelData):
        return _pairs_from_ints([[c % q for c in ints] for q in lvl.primes])

    def encode(self, values, level: int = 0, scale: float | None = None):
        scale = scale or self.ctx.scale
        lvl = self.ctx.level(level)
        v = np.zeros(self.slots, dtype=np.complex128)
        arr = np.asarray(values, dtype=np.complex128)
        v[: len(arr)] = arr
        ev = np.zeros(self.ctx.n, dtype=np.complex128)
        ev[self._idx] = v
        ev[self._idx_conj] = np.conj(v)
        coeffs = (np.fft.fft(ev) / self.ctx.n) * self._untwist
        scaled = coeffs.real * scale
        if np.max(np.abs(scaled)) >= lvl.Q / 2:
            raise ValueError("[Ckks64Encoder.encode] scaled values exceed Q/2")
        ints = [int(round(x)) for x in scaled]
        hi, lo = self._ints_to_pairs(ints, lvl)
        fwd = _cached_jit(self._jit_cache, ("enc_ntt", level), lambda: (
            lambda h, l: N64.ntt_forward64(h, l, lvl.tab)))
        hi, lo = fwd(hi, lo)
        return Ciphertext64(hi[None], lo[None], level, scale)  # size-1 "plain"

    def decode(self, hi, lo, level: int, scale: float) -> np.ndarray:
        """(L, n) coeff-domain pair -> complex slots (host CRT compose)."""
        lvl = self.ctx.level(level)
        vals = W.unpack64(np.asarray(hi), np.asarray(lo))
        Q = lvl.Q
        punct = [Q // q for q in lvl.primes]
        inv = [numth.invert_mod(p % q, q) for p, q in zip(punct, lvl.primes)]
        centered = np.empty(self.ctx.n, dtype=np.float64)
        for j in range(self.ctx.n):
            acc = 0
            for k, q in enumerate(lvl.primes):
                acc = (acc + int(vals[k, j]) * inv[k] % q * punct[k]) % Q
            centered[j] = float(acc - Q) if acc > Q // 2 else float(acc)
        coeffs = centered / scale
        ev = np.fft.ifft(coeffs * self._twist) * self.ctx.n
        return ev[self._idx]


def _sample_uniform_ntt(rng, primes, shape_tail):
    """Uniform residues directly in the NTT domain (ref: rlwe.cu sample a)."""
    res = np.stack(
        [rng.integers(0, q, shape_tail, dtype=np.uint64) for q in primes])
    hi, lo = W.pack64(res)
    return jnp.asarray(hi), jnp.asarray(lo)


def _sample_small_coeff(rng, primes, n, kind):
    """Ternary secret / centered-binomial noise as per-limb residues
    (ref: rlwe.cu sample ternary / CBD)."""
    if kind == "ternary":
        small = rng.integers(-1, 2, n)
    else:  # centered binomial, sigma ~= 3.2 (ref: CBD_21 in rlwe.cu)
        small = (rng.integers(0, 2, (21, n)).sum(0)
                 - rng.integers(0, 2, (21, n)).sum(0))
    res = [[int(c) % q for c in small] for q in primes]
    return _pairs_from_ints(res)


class Ckks64KeyGenerator:
    """ref: src/key_generator.cu at compat width."""

    def __init__(self, ctx: Ckks64Context, seed: int | None = None):
        self.ctx = ctx
        self._jit_cache = ctx.jit_cache
        self.rng = _Blake2Rng(ctx.seed if seed is None else seed)
        kl = ctx.key_level
        base = kl.primes + [kl.special]
        s_hi, s_lo = _sample_small_coeff(self.rng, base, ctx.n, "ternary")
        fwd = _cached_jit(self._jit_cache, "key_ntt", lambda: (
            lambda h, l: N64.ntt_forward64(h, l, kl.otab)))
        self.s_ntt = fwd(s_hi, s_lo)  # (L_key, n) pair

    def _encrypt_zero(self, shape_lead=()):
        """Symmetric zero encryptions at key level, NTT form: (-(a s + e), a)."""
        ctx, kl = self.ctx, self.ctx.key_level
        base = kl.primes + [kl.special]
        O = len(base)
        qh, ql = _q_cols(kl.otab)
        a = _sample_uniform_ntt(self.rng, base, shape_lead + (ctx.n,))
        if shape_lead:  # (D, O, n): sampled as (O, D, n) -> transpose
            a = tuple(jnp.moveaxis(x.reshape((O,) + shape_lead + (ctx.n,)), 0,
                                   len(shape_lead)) for x in a)
        es = [_sample_small_coeff(self.rng, base, ctx.n, "noise")
              for _ in range(int(np.prod(shape_lead)) or 1)]
        e_hi = jnp.stack([e[0] for e in es]).reshape(shape_lead + (O, ctx.n))
        e_lo = jnp.stack([e[1] for e in es]).reshape(shape_lead + (O, ctx.n))

        fn = _cached_jit(self._jit_cache, ("enczero", shape_lead), lambda: (
            lambda ah, al, eh, el, sh, sl: (lambda e_ntt, As: W.neg_mod64(
                *W.add_mod64(*As, *e_ntt, qh, ql), qh, ql))(
                N64.ntt_forward64(eh, el, kl.otab),
                N64.dyadic_product64(ah, al, sh, sl, kl.otab))))
        c0 = fn(*a, e_hi, e_lo, *self.s_ntt)
        return c0, a

    def _kswitch_key(self, target_ntt):
        """(L_key, n) pair -> keys (decomp, 2, O, n) pairs
        (ref: key_generator.cu:136-157: KSK_i = Enc_s(0) + (sp mod q_i) *
        target * unit_i)."""
        ctx, kl = self.ctx, self.ctx.key_level
        D = kl.L  # decomposition over data primes
        O = D + 1
        c0, a = self._encrypt_zero((D,))
        factors = _pairs_from_ints(
            [[kl.special % q] for q in kl.primes] + [[0]])

        def builder():
            def f(c0h, c0l, ah, al, th, tl):
                qh, ql = _q_cols(kl.otab)
                term = W.mul_mod64(
                    th, tl, factors[0], factors[1], qh, ql,
                    kl.otab["r3"][:, None], kl.otab["r2"][:, None],
                    kl.otab["r1"][:, None], kl.otab["r0"][:, None])
                mask = jnp.eye(D, O, dtype=bool)[:, :, None]
                add = W.add_mod64(c0h, c0l, term[0][None], term[1][None],
                                  qh, ql)
                c0m = (jnp.where(mask, add[0], c0h),
                       jnp.where(mask, add[1], c0l))
                return (jnp.stack([c0m[0], ah], axis=1),
                        jnp.stack([c0m[1], al], axis=1))
            return f

        fn = _cached_jit(self._jit_cache, "kswitch_tail", builder)
        return fn(*c0, *a, *target_ntt)

    def create_relin_key(self):
        kl = self.ctx.key_level
        fn = _cached_jit(self._jit_cache, "s_square", lambda: (
            lambda h, l: N64.dyadic_product64(h, l, h, l, kl.otab)))
        return self._kswitch_key(fn(*self.s_ntt))

    def create_galois_key(self, galois_elt: int):
        tool = GaloisTool.for_context(
            type("cd", (), {"log_n": self.ctx.log_n})())
        sg = tuple(tool.apply_ntt(x, galois_elt) for x in self.s_ntt)
        return self._kswitch_key(sg)


class Ckks64Encryptor:
    """Symmetric encryption (ref: src/encryptor.cu encrypt_symmetric)."""

    def __init__(self, ctx: Ckks64Context, keygen: Ckks64KeyGenerator):
        self.ctx = ctx
        self.keygen = keygen
        self.rng = keygen.rng
        self._jit_cache = ctx.jit_cache

    def encrypt(self, plain: Ciphertext64) -> Ciphertext64:
        ctx = self.ctx
        lvl = ctx.level(plain.level)
        L = lvl.L
        a = _sample_uniform_ntt(self.rng, lvl.primes, (ctx.n,))
        e = _sample_small_coeff(self.rng, lvl.primes, ctx.n, "noise")

        def builder():
            def f(ah, al, eh, el, sh, sl, mh, ml):
                qh, ql = _q_cols(lvl.tab)
                e_ntt = N64.ntt_forward64(eh, el, lvl.tab)
                As = N64.dyadic_product64(ah, al, sh, sl, lvl.tab)
                c0 = W.neg_mod64(*W.add_mod64(*As, *e_ntt, qh, ql), qh, ql)
                c0 = W.add_mod64(*c0, mh, ml, qh, ql)
                return jnp.stack([c0[0], ah]), jnp.stack([c0[1], al])
            return f

        fn = _cached_jit(self._jit_cache, ("encrypt", plain.level), builder)
        s = (self.keygen.s_ntt[0][:L], self.keygen.s_ntt[1][:L])
        hi, lo = fn(*a, *e, *s, plain.hi[0], plain.lo[0])
        return Ciphertext64(hi, lo, plain.level, plain.scale)


class Ckks64Decryptor:
    """ref: src/decryptor.cu phase + CKKS decode path."""

    def __init__(self, ctx: Ckks64Context, keygen: Ckks64KeyGenerator,
                 encoder: Ckks64Encoder):
        self.ctx = ctx
        self.keygen = keygen
        self.encoder = encoder
        self._jit_cache = ctx.jit_cache

    def decrypt(self, ct: Ciphertext64) -> np.ndarray:
        lvl = self.ctx.level(ct.level)
        L = lvl.L
        size = ct.size

        def builder():
            def f(hi, lo, sh, sl):
                qh, ql = _q_cols(lvl.tab)
                acc = (hi[0], lo[0])
                spow = (sh, sl)
                for i in range(1, size):
                    term = N64.dyadic_product64(hi[i], lo[i], *spow, lvl.tab)
                    acc = W.add_mod64(*acc, *term, qh, ql)
                    if i + 1 < size:
                        spow = N64.dyadic_product64(*spow, sh, sl, lvl.tab)
                return N64.ntt_inverse64(*acc, lvl.tab)
            return f

        fn = _cached_jit(self._jit_cache, ("phase", ct.level, size), builder)
        s = (self.keygen.s_ntt[0][:L], self.keygen.s_ntt[1][:L])
        coeff = fn(ct.hi, ct.lo, *s)
        return self.encoder.decode(*coeff, ct.level, ct.scale)


class Ckks64Evaluator:
    """Homomorphic ops at compat width (ref: src/evaluator.cu CKKS paths).
    Hot paths are jitted per (op, level, size)."""

    def __init__(self, ctx: Ckks64Context):
        self.ctx = ctx
        self._jit_cache = ctx.jit_cache

    def _jit(self, key, builder):
        return _cached_jit(self._jit_cache, key, builder)

    # -- linear ops ----------------------------------------------------
    def add(self, c1: Ciphertext64, c2: Ciphertext64) -> Ciphertext64:
        self._check(c1, c2, "add")
        lvl = self.ctx.level(c1.level)
        fn = self._jit(("add", c1.level, c1.size), lambda: (
            lambda ah, al, bh, bl: W.add_mod64(ah, al, bh, bl,
                                               *_q_cols(lvl.tab))))
        hi, lo = fn(c1.hi, c1.lo, c2.hi, c2.lo)
        return Ciphertext64(hi, lo, c1.level, c1.scale)

    def sub(self, c1: Ciphertext64, c2: Ciphertext64) -> Ciphertext64:
        self._check(c1, c2, "sub")
        lvl = self.ctx.level(c1.level)
        fn = self._jit(("sub", c1.level, c1.size), lambda: (
            lambda ah, al, bh, bl: W.sub_mod64(ah, al, bh, bl,
                                               *_q_cols(lvl.tab))))
        hi, lo = fn(c1.hi, c1.lo, c2.hi, c2.lo)
        return Ciphertext64(hi, lo, c1.level, c1.scale)

    def negate(self, ct: Ciphertext64) -> Ciphertext64:
        lvl = self.ctx.level(ct.level)
        fn = self._jit(("neg", ct.level, ct.size), lambda: (
            lambda ah, al: W.neg_mod64(ah, al, *_q_cols(lvl.tab))))
        hi, lo = fn(ct.hi, ct.lo)
        return Ciphertext64(hi, lo, ct.level, ct.scale)

    @staticmethod
    def _check(c1, c2, op):
        if c1.level != c2.level:
            raise ValueError(f"[Ckks64Evaluator.{op}] level mismatch")
        if abs(c1.scale - c2.scale) > 0.5:
            raise ValueError(f"[Ckks64Evaluator.{op}] scale mismatch")

    # -- multiply ------------------------------------------------------
    def multiply(self, c1: Ciphertext64, c2: Ciphertext64) -> Ciphertext64:
        """(c0,c1) x (d0,d1) -> size 3 (ref: evaluator.cu ckks_multiply)."""
        if c1.size != 2 or c2.size != 2:
            raise ValueError("[Ckks64Evaluator.multiply] size-2 inputs only")
        self._check(c1, c2, "multiply")
        lvl = self.ctx.level(c1.level)

        def builder():
            def f(ah, al, bh, bl):
                qh, ql = _q_cols(lvl.tab)
                p00 = N64.dyadic_product64(ah[0], al[0], bh[0], bl[0], lvl.tab)
                p01 = N64.dyadic_product64(ah[0], al[0], bh[1], bl[1], lvl.tab)
                p10 = N64.dyadic_product64(ah[1], al[1], bh[0], bl[0], lvl.tab)
                p11 = N64.dyadic_product64(ah[1], al[1], bh[1], bl[1], lvl.tab)
                mid = W.add_mod64(*p01, *p10, qh, ql)
                hi = jnp.stack([p00[0], mid[0], p11[0]])
                lo = jnp.stack([p00[1], mid[1], p11[1]])
                return hi, lo
            return f

        fn = self._jit(("mul", c1.level), builder)
        hi, lo = fn(c1.hi, c1.lo, c2.hi, c2.lo)
        return Ciphertext64(hi, lo, c1.level, c1.scale * c2.scale)

    def multiply_plain(self, ct: Ciphertext64, plain: Ciphertext64) -> Ciphertext64:
        if ct.level != plain.level:
            raise ValueError("[Ckks64Evaluator.multiply_plain] level mismatch")
        lvl = self.ctx.level(ct.level)
        fn = self._jit(("mulp", ct.level, ct.size), lambda: (
            lambda ah, al, ph, pl:
            N64.dyadic_product64(ah, al, ph[0], pl[0], lvl.tab)))
        hi, lo = fn(ct.hi, ct.lo, plain.hi, plain.lo)
        return Ciphertext64(hi, lo, ct.level, ct.scale * plain.scale)

    def add_plain(self, ct: Ciphertext64, plain: Ciphertext64) -> Ciphertext64:
        self._check(ct, plain, "add_plain")
        lvl = self.ctx.level(ct.level)
        fn = self._jit(("addp", ct.level, ct.size), lambda: (
            lambda ah, al, ph, pl: (
                W.add_mod64(ah[:1], al[:1], ph, pl, *_q_cols(lvl.tab)))))
        h0, l0 = fn(ct.hi, ct.lo, plain.hi, plain.lo)
        hi = jnp.concatenate([h0, ct.hi[1:]])
        lo = jnp.concatenate([l0, ct.lo[1:]])
        return Ciphertext64(hi, lo, ct.level, ct.scale)

    # -- keyswitching --------------------------------------------------
    def _switch_key_impl(self, lvl: LevelData, t_hi, t_lo, k_hi, k_lo):
        """Coeff-domain target (L, n) pair + keys (L, 2, O, n) pairs ->
        NTT-form (2, L, n) pair (ref: evaluator_keyswitching_core.cu).
        Digits are Barrett-reduced per output prime — compat primes have
        mixed sizes, so the u32 path's lazy-digit shortcut does not apply."""
        L, n = lvl.L, t_hi.shape[-1]
        O = L + 1
        # keys are generated at the key base: select the first L decomposition
        # digits and the (level limbs + special prime) output columns
        # (ref: evaluator.py _switch_key_impl keys_sel)
        O_key = k_hi.shape[2]
        idx = jnp.asarray(list(range(L)) + [O_key - 1])
        k_hi = k_hi[:L][:, :, idx, :]
        k_lo = k_lo[:L][:, :, idx, :]
        oqh, oql = _q_cols(lvl.otab)
        or3, or2, or1, or0 = (lvl.otab[k][:, None] for k in
                              ("r3", "r2", "r1", "r0"))
        D_hi = jnp.broadcast_to(t_hi[:, None, :], (L, O, n))
        D_lo = jnp.broadcast_to(t_lo[:, None, :], (L, O, n))
        D = W.barrett_reduce_u64(D_hi, D_lo, oqh, oql, or3, or2, or1, or0)
        D = N64.ntt_forward64(*D, lvl.otab)
        pairs = [((D[0][i], D[1][i]), (k_hi[i], k_lo[i])) for i in range(L)]
        acc = W.dot_mod64(pairs, oqh, oql, or3, or2, or1, or0, lvl.max_terms)
        # divide by the special prime (NTT-domain; ref: rns_tool.cu
        # divide_and_round_q_last_ntt on the key base)
        last = (acc[0][:, L:, :], acc[1][:, L:, :])
        last = N64.ntt_inverse64(*last, lvl.sp_tab)
        last = W.add_mod64(*last, *lvl.sp_half_words, *lvl.sp_words)
        qh, ql = _q_cols(lvl.tab)
        r3, r2, r1, r0 = (lvl.tab[k][:, None] for k in ("r3", "r2", "r1", "r0"))
        lb_hi = jnp.broadcast_to(last[0], (2, L, n))
        lb_lo = jnp.broadcast_to(last[1], (2, L, n))
        tmp = W.barrett_reduce_u64(lb_hi, lb_lo, qh, ql, r3, r2, r1, r0)
        tmp = W.sub_mod64(*tmp, *lvl.sp_half_mod_q, qh, ql)
        tmp = N64.ntt_forward64(*tmp, lvl.tab)
        diff = W.sub_mod64(acc[0][:, :L, :], acc[1][:, :L, :], *tmp, qh, ql)
        return W.shoup_mul64(*diff, lvl.inv_sp[0], lvl.inv_sp[1],
                             lvl.inv_sp_shoup[0], lvl.inv_sp_shoup[1], qh, ql)

    def relinearize(self, ct: Ciphertext64, rlk) -> Ciphertext64:
        """size-3 -> size-2 (ref: evaluator_keyswitching.cu:96)."""
        if ct.size != 3:
            raise ValueError("[Ckks64Evaluator.relinearize] size-3 only")
        lvl = self.ctx.level(ct.level)

        def builder():
            def f(hi, lo, k_hi, k_lo):
                qh, ql = _q_cols(lvl.tab)
                t = N64.ntt_inverse64(hi[2], lo[2], lvl.tab)
                sw = self._switch_key_impl(lvl, *t, k_hi, k_lo)
                oh, ol = W.add_mod64(hi[:2], lo[:2], sw[0], sw[1], qh, ql)
                return oh, ol
            return f

        fn = self._jit(("relin", ct.level), builder)
        hi, lo = fn(ct.hi, ct.lo, rlk[0], rlk[1])
        return Ciphertext64(hi, lo, ct.level, ct.scale)

    def apply_galois(self, ct: Ciphertext64, galois_elt: int, glk) -> Ciphertext64:
        """ref: evaluator.cu apply_galois (NTT-domain gather + keyswitch)."""
        if ct.size != 2:
            raise ValueError("[Ckks64Evaluator.apply_galois] size-2 only")
        lvl = self.ctx.level(ct.level)
        tool = GaloisTool.for_context(type("cd", (), {"log_n": self.ctx.log_n})())
        tool.apply_ntt(ct.hi[0], galois_elt)  # build table outside trace

        def builder():
            def f(hi, lo, k_hi, k_lo):
                qh, ql = _q_cols(lvl.tab)
                gh = tool.apply_ntt(hi, galois_elt)
                gl = tool.apply_ntt(lo, galois_elt)
                t = N64.ntt_inverse64(gh[1], gl[1], lvl.tab)
                sw = self._switch_key_impl(lvl, *t, k_hi, k_lo)
                c0 = W.add_mod64(gh[0], gl[0], sw[0][0], sw[1][0], qh, ql)
                oh = jnp.stack([c0[0], sw[0][1]])
                ol = jnp.stack([c0[1], sw[1][1]])
                return oh, ol
            return f

        fn = self._jit(("galois", ct.level, galois_elt), builder)
        hi, lo = fn(ct.hi, ct.lo, glk[0], glk[1])
        return Ciphertext64(hi, lo, ct.level, ct.scale)

    def rotate_vector(self, ct: Ciphertext64, steps: int, glk) -> Ciphertext64:
        return self.apply_galois(
            ct, GaloisTool.get_element_from_step(steps, self.ctx.n), glk)

    def complex_conjugate(self, ct: Ciphertext64, glk) -> Ciphertext64:
        return self.apply_galois(ct, 2 * self.ctx.n - 1, glk)

    # -- rescale / modswitch -------------------------------------------
    def rescale_to_next(self, ct: Ciphertext64) -> Ciphertext64:
        """Drop q_{L-1}, dividing and rounding (ref: rns_tool.cu
        divide_and_round_q_last_ntt_inplace)."""
        lvl = self.ctx.level(ct.level)
        if lvl.L < 2:
            raise ValueError("[Ckks64Evaluator.rescale_to_next] last level")
        nxt = self.ctx.level(ct.level + 1)
        L = lvl.L

        def builder():
            def f(hi, lo):
                n = hi.shape[-1]
                last = (hi[:, L - 1 :, :], lo[:, L - 1 :, :])
                last = N64.ntt_inverse64(*last, lvl.last_tab)
                last = W.add_mod64(*last, *lvl.ql_half_words, *lvl.ql_words)
                qh, ql = _q_cols(nxt.tab)
                r3, r2, r1, r0 = (nxt.tab[k][:, None]
                                  for k in ("r3", "r2", "r1", "r0"))
                sz = hi.shape[0]
                lb_hi = jnp.broadcast_to(last[0], (sz, L - 1, n))
                lb_lo = jnp.broadcast_to(last[1], (sz, L - 1, n))
                tmp = W.barrett_reduce_u64(lb_hi, lb_lo, qh, ql, r3, r2, r1, r0)
                tmp = W.sub_mod64(*tmp, *lvl.ql_half_mod_q, qh, ql)
                tmp = N64.ntt_forward64(*tmp, nxt.tab)
                diff = W.sub_mod64(hi[:, : L - 1, :], lo[:, : L - 1, :],
                                   *tmp, qh, ql)
                return W.shoup_mul64(*diff, lvl.inv_ql[0], lvl.inv_ql[1],
                                     lvl.inv_ql_shoup[0], lvl.inv_ql_shoup[1],
                                     qh, ql)
            return f

        fn = self._jit(("rescale", ct.level, ct.size), builder)
        hi, lo = fn(ct.hi, ct.lo)
        return Ciphertext64(hi, lo, ct.level + 1,
                            ct.scale / lvl.primes[-1])

    def mod_switch_to_next(self, ct: Ciphertext64) -> Ciphertext64:
        """Drop the last limb without division (ref: evaluator.cu
        mod_switch_drop_to for CKKS)."""
        lvl = self.ctx.level(ct.level)
        if lvl.L < 2:
            raise ValueError("[Ckks64Evaluator.mod_switch_to_next] last level")
        return Ciphertext64(ct.hi[:, : lvl.L - 1, :], ct.lo[:, : lvl.L - 1, :],
                            ct.level + 1, ct.scale)
