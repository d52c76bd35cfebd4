"""Negacyclic NTT/INTT for 40-62-bit primes on (hi, lo) u32 pairs.

The compat-mode counterpart of ops/ntt.py (same reshape-only Harvey radix-2
schedule, same output order: position p holds the evaluation at
psi^(2*brv(p)+1)), with every u32 lane op replaced by the u64 pair primitives
from ops/u64.py.  Rebuilds reference src/utils/ntt.{h,cu} at its native
64-bit width for parameter sets fixed by an external protocol (SEAL-default
40-60-bit primes) that the u32 fast path cannot express.

Lazy-reduction invariant is unchanged: intermediates stay in [0, 2q) via
Shoup lazy multiplication; q < 2^62 guarantees 4q < 2^64 so the pair
arithmetic never overflows.  Tables are built host-side with Python ints
(NTT64Tables, mirroring reference NTTTables ntt.h:30).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .jitu import pack_jit, safe_stack
from . import u64 as W
from .u32 import U32
from ..utils import numth

_M32 = (1 << 32) - 1


def _to_words(vals: list[int]):
    """list of python ints -> (hi, lo) u32 numpy arrays."""
    a = np.array(vals, dtype=object)
    hi = np.array([(v >> 32) & _M32 for v in vals], dtype=np.uint32)
    lo = np.array([v & _M32 for v in vals], dtype=np.uint32)
    return hi, lo


class NTT64Tables:
    """Per-(n, prime-list) twiddle tables at 64-bit width, stacked over the
    limb axis.  Primes are python ints with 2n | q-1 and q < 2^62.

    Per-(log_n, q) rows are cached at class level: every chain level reuses
    the key level's rows (the 11-second per-level table rebuild of the old
    compat stack, CLAUDE.md roadmap, is gone by construction)."""

    _row_cache: dict = {}  # (log_n, q) -> row dict

    @classmethod
    def _rows(cls, log_n: int, q: int) -> dict:
        key = (log_n, q)
        if key in cls._row_cache:
            return cls._row_cache[key]
        n = 1 << log_n
        psi = numth.try_minimal_primitive_root(2 * n, q)
        if psi is None:
            raise ValueError(
                f"[NTT64Tables] modulus {q} does not support NTT degree {n}")
        ipsi = numth.invert_mod(psi, q)
        brv = [numth.reverse_bits(i, log_n) for i in range(n)]
        fwd = [0] * n
        inv = [0] * n
        p, ip = 1, 1
        for i in range(n):
            fwd[brv[i]] = p
            inv[brv[i]] = ip
            p = p * psi % q
            ip = ip * ipsi % q
        nv = numth.invert_mod(n, q)
        rows = dict(
            psi=_to_words(fwd),
            psi_shoup=_to_words([(w << 64) // q for w in fwd]),
            inv_psi=_to_words(inv),
            inv_psi_shoup=_to_words([(w << 64) // q for w in inv]),
            n_inv=(nv, (nv << 64) // q),
        )
        cls._row_cache[key] = rows
        return rows

    def __init__(self, log_n: int, primes: list[int]):
        self.log_n = log_n
        self.n = n = 1 << log_n
        self.primes = list(primes)
        for q in primes:
            if q >= (1 << 62):
                raise ValueError("[NTT64Tables] q must be < 2^62")

        host: dict = {}
        rows = [self._rows(log_n, q) for q in self.primes]
        for name in ("psi", "psi_shoup", "inv_psi", "inv_psi_shoup"):
            host[name + "_hi"] = np.stack([r[name][0] for r in rows])
            host[name + "_lo"] = np.stack([r[name][1] for r in rows])
        ninv = [r["n_inv"][0] for r in rows]
        ninvs = [r["n_inv"][1] for r in rows]
        host["n_inv_hi"], host["n_inv_lo"] = _to_words(ninv)
        host["n_inv_shoup_hi"], host["n_inv_shoup_lo"] = _to_words(ninvs)
        host["q_hi"], host["q_lo"] = _to_words(self.primes)
        host["q2_hi"], host["q2_lo"] = _to_words([2 * q for q in self.primes])
        ratios = [(1 << 128) // q for q in self.primes]
        for i, name in enumerate(["r0", "r1", "r2", "r3"]):
            host[name] = np.array(
                [(r >> (32 * i)) & _M32 for r in ratios], dtype=np.uint32)
        self._host = host
        self._device: dict | None = None

    def pack(self) -> dict:
        if self._device is None:
            self._device = {k: jnp.asarray(v) for k, v in self._host.items()}
            self._device["words"] = 2
        return self._device


def wide_scalar_pack(values: list[int]) -> dict:
    """Minimal wide table pack {q words, 2^128-ratio words, words: 2} for a
    base that needs no NTT (aux moduli like gamma / m_tilde in RNSTool)."""
    out = {}
    out["q_hi"], out["q_lo"] = _to_words(values)
    ratios = [(1 << 128) // q for q in values]
    for i, name in enumerate(["r0", "r1", "r2", "r3"]):
        out[name] = np.array([(r >> (32 * i)) & _M32 for r in ratios],
                             dtype=np.uint32)
    pack = {k: jnp.asarray(v) for k, v in out.items()}
    pack["words"] = 2
    return pack


def _slice_pair(t, key, m, axis=1):
    h = jax.lax.slice_in_dim(t[key + "_hi"], m, 2 * m, axis=axis)[..., None]
    l = jax.lax.slice_in_dim(t[key + "_lo"], m, 2 * m, axis=axis)[..., None]
    return h, l


@pack_jit
def ntt_forward64(x_hi, x_lo, t: dict):
    """Forward negacyclic NTT along the last axis of a (hi, lo) pair.
    In: [0, q) natural order; out: [0, q) NTT order.

    Jitted at the function boundary: eager callers (keygen, rlwe encrypt,
    decrypt) would otherwise dispatch ~6 pair primitives x log n stages as
    individual XLA mini-compiles (~3 s per eager wide NTT even at n=32)."""
    n = x_hi.shape[-1]
    L = x_hi.shape[-2]
    lead = x_hi.shape[:-2]
    r = (1,) * len(lead) + (L, 1, 1)
    qh, ql = t["q_hi"].reshape(r), t["q_lo"].reshape(r)
    q2h, q2l = t["q2_hi"].reshape(r), t["q2_lo"].reshape(r)
    m, tt = 1, n // 2
    while m < n:
        shp = lead + (L, m, 2, tt)
        xh = x_hi.reshape(shp)
        xl = x_lo.reshape(shp)
        uh, ul = xh[..., 0, :], xl[..., 0, :]
        vh, vl = xh[..., 1, :], xl[..., 1, :]
        wh, wl = _slice_pair(t, "psi", m)
        sh, sl = _slice_pair(t, "psi_shoup", m)
        th, tl = W.shoup_mul64_lazy(vh, vl, wh, wl, sh, sl, qh, ql)  # [0,2q)
        a = W.add64(uh, ul, th, tl)                                  # < 4q
        x0h, x0l = W.cond_sub64(*a, q2h, q2l)                        # [0,2q)
        b = W.sub64(*W.add64(uh, ul, q2h, q2l), th, tl)              # u+2q-t
        x1h, x1l = W.cond_sub64(*b, q2h, q2l)                        # [0,2q)
        x_hi = safe_stack([x0h, x1h], axis=-2).reshape(lead + (L, n))
        x_lo = safe_stack([x0l, x1l], axis=-2).reshape(lead + (L, n))
        m *= 2
        tt //= 2
    rf = (1,) * len(lead) + (L, 1)
    return W.cond_sub64(x_hi, x_lo, t["q_hi"].reshape(rf),
                        t["q_lo"].reshape(rf))


@pack_jit
def ntt_inverse64(x_hi, x_lo, t: dict):
    """Inverse negacyclic NTT along the last axis of a (hi, lo) pair.
    In: [0, q) NTT order; out: [0, q) natural order, scaled by n^-1."""
    n = x_hi.shape[-1]
    L = x_hi.shape[-2]
    lead = x_hi.shape[:-2]
    r = (1,) * len(lead) + (L, 1, 1)
    qh, ql = t["q_hi"].reshape(r), t["q_lo"].reshape(r)
    q2h, q2l = t["q2_hi"].reshape(r), t["q2_lo"].reshape(r)
    m, tt = n // 2, 1
    while m >= 1:
        shp = lead + (L, m, 2, tt)
        xh = x_hi.reshape(shp)
        xl = x_lo.reshape(shp)
        uh, ul = xh[..., 0, :], xl[..., 0, :]
        vh, vl = xh[..., 1, :], xl[..., 1, :]
        wh, wl = _slice_pair(t, "inv_psi", m)
        sh, sl = _slice_pair(t, "inv_psi_shoup", m)
        a = W.add64(uh, ul, vh, vl)                                  # < 4q
        x0h, x0l = W.cond_sub64(*a, q2h, q2l)                        # [0,2q)
        d = W.sub64(*W.add64(uh, ul, q2h, q2l), vh, vl)              # u+2q-v
        x1h, x1l = W.shoup_mul64_lazy(*d, wh, wl, sh, sl, qh, ql)    # [0,2q)
        x_hi = safe_stack([x0h, x1h], axis=-2).reshape(lead + (L, n))
        x_lo = safe_stack([x0l, x1l], axis=-2).reshape(lead + (L, n))
        m //= 2
        tt *= 2
    rf = (1,) * len(lead) + (L, 1)
    qh, ql = t["q_hi"].reshape(rf), t["q_lo"].reshape(rf)
    x_hi, x_lo = W.cond_sub64(x_hi, x_lo, qh, ql)
    return W.shoup_mul64(
        x_hi, x_lo,
        t["n_inv_hi"].reshape(rf), t["n_inv_lo"].reshape(rf),
        t["n_inv_shoup_hi"].reshape(rf), t["n_inv_shoup_lo"].reshape(rf),
        qh, ql)


@pack_jit
def dyadic_product64(a_hi, a_lo, b_hi, b_lo, t: dict):
    """Elementwise NTT-domain product (ref: utils/poly_smallmod.cu dyadic)."""
    L = a_hi.shape[-2]
    lead = a_hi.shape[:-2]
    r = (1,) * len(lead) + (L, 1)
    return W.mul_mod64(
        a_hi, a_lo, b_hi, b_lo,
        t["q_hi"].reshape(r), t["q_lo"].reshape(r),
        t["r3"].reshape(r), t["r2"].reshape(r),
        t["r1"].reshape(r), t["r0"].reshape(r))
