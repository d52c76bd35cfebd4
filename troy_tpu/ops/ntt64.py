"""Negacyclic NTT/INTT for 40-62-bit primes on (hi, lo) u32 pairs.

The compat-mode counterpart of ops/ntt.py (same output order: position p
holds the evaluation at psi^(2*brv(p)+1)), with every u32 lane op replaced
by the u64 pair primitives from ops/u64.py.  Rebuilds reference
src/utils/ntt.{h,cu} + src/fgk/ntt_grouped.cu:158-246 at their native
64-bit width for parameter sets fixed by an external protocol (SEAL-default
40-60-bit primes) that the u32 fast path cannot express.

Two schedules, bit-identical (same backend knob as the fast path,
TROY_NTT_BACKEND / set_ntt_backend in ops/ntt.py):

  * radix2 — the reshape-only Harvey schedule; oracle, and the only
    schedule for n < 256.  Later stages shrink the last axis to 1 lane.
  * sixstep (default; also chosen for the mxu/pallas/pallas_mxu knob
    values, which have no wide-width kernels: an int8-limb MXU
    decomposition of 64-bit residues needs 8x8=64 partial dot_generals
    per product and loses to the VPU pair path) — the (n1, n2) matrix
    factorization of ops/ntt.py with every lane op at pair width; every
    butterfly stage keeps a full 128-lane last axis.

Lazy-reduction invariants: the radix-2 path keeps intermediates in [0, 2q);
the sixstep forward path runs Harvey-lazy in [0, 4q) (4q < 2^64 since
q < 2^62).  Tables are built host-side with Python ints (NTT64Tables,
mirroring reference NTTTables ntt.h:30); sixstep twiddle matrices are
gathered from a single length-2n power table so the build stays vectorized.
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

    _row_cache: dict = {}  # (log_n, q, psi) -> row dict

    @classmethod
    def _rows(cls, log_n: int, q: int, psi: int | None = None) -> dict:
        key = (log_n, q, psi)
        if key in cls._row_cache:
            return cls._row_cache[key]
        n = 1 << log_n
        if psi is None:
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
        """Device pytree of all tables (uploaded lazily, cached).  Honors the
        ops/ntt.py backend knob: any non-radix2 backend merges the six-step
        tables in (see module docstring for why mxu/pallas map to sixstep at
        wide width)."""
        if self._device is None:
            self._device = {k: jnp.asarray(v) for k, v in self._host.items()}
            self._device["words"] = 2
            from . import ntt as _ntt

            if (_ntt.get_ntt_backend() != "radix2"
                    and self.log_n >= _ntt._MXU_MIN_LOG_N):
                self._device.update(self._sixstep_pack())
        return self._device

    def _sixstep_pack(self) -> dict:
        """Pair-width tables for the six-step transform (see ops/ntt.py
        NTTTables._sixstep_pack for the factorization).  The twiddle matrix
        entry is T[k1', i2] = psi^e with e = i2*(2*brv_a(k1')+1-n1) mod 2n,
        so T, its Shoup companion, and the n^-1-folded inverse Tif are all
        gathers from one length-2n power table — no per-entry big-int ops."""
        import os as _os

        log_n = self.log_n
        n = self.n
        a = int(_os.environ.get("TROY_NTT_SPLIT_A", log_n // 2))
        a = max(1, min(log_n - 1, a))
        b = log_n - a
        n1, n2 = 1 << a, 1 << b
        L = len(self.primes)

        brv = np.array([numth.reverse_bits(i, a) for i in range(n1)],
                       dtype=np.int64)
        i2 = np.arange(n2, dtype=np.int64)
        exps = (i2[None, :] * (2 * brv[:, None] + 1 - n1)) % (2 * n)

        rows1, rows2 = [], []
        T_hi = np.zeros((L, n1, n2), dtype=np.uint32)
        T_lo = np.zeros((L, n1, n2), dtype=np.uint32)
        Ts_hi = np.zeros((L, n1, n2), dtype=np.uint32)
        Ts_lo = np.zeros((L, n1, n2), dtype=np.uint32)
        Tif_hi = np.zeros((L, n1, n2), dtype=np.uint32)
        Tif_lo = np.zeros((L, n1, n2), dtype=np.uint32)
        Tifs_hi = np.zeros((L, n1, n2), dtype=np.uint32)
        Tifs_lo = np.zeros((L, n1, n2), dtype=np.uint32)
        for l, q in enumerate(self.primes):
            psi = numth.try_minimal_primitive_root(2 * n, q)
            rows1.append(self._rows(a, q, pow(psi, n2, q)))
            rows2.append(self._rows(b, q, pow(psi, n1, q)))
            ninv = numth.invert_mod(n, q)
            # one pass over the 2n-cycle of psi powers; every matrix entry
            # (value, Shoup word, n^-1-folded inverse) is a gather from it
            pows = [0] * (2 * n)
            p = 1
            for j in range(2 * n):
                pows[j] = p
                p = p * psi % q
            ph, pl = _to_words(pows)
            sh, sl = _to_words([(w << 64) // q for w in pows])
            fpows = [pows[(2 * n - j) % (2 * n)] * ninv % q
                     for j in range(2 * n)]
            fh, fl = _to_words(fpows)
            fsh, fsl = _to_words([(w << 64) // q for w in fpows])
            T_hi[l], T_lo[l] = ph[exps], pl[exps]
            Ts_hi[l], Ts_lo[l] = sh[exps], sl[exps]
            Tif_hi[l], Tif_lo[l] = fh[exps], fl[exps]
            Tifs_hi[l], Tifs_lo[l] = fsh[exps], fsl[exps]

        out = {}
        for pre, rows in (("ss1", rows1), ("ss2", rows2)):
            for name in ("psi", "psi_shoup", "inv_psi", "inv_psi_shoup"):
                out[f"{pre}_{name}_hi"] = jnp.asarray(
                    np.stack([r[name][0] for r in rows]))
                out[f"{pre}_{name}_lo"] = jnp.asarray(
                    np.stack([r[name][1] for r in rows]))
        out["ss_T_hi"] = jnp.asarray(T_hi)
        out["ss_T_lo"] = jnp.asarray(T_lo)
        out["ss_T_shoup_hi"] = jnp.asarray(Ts_hi)
        out["ss_T_shoup_lo"] = jnp.asarray(Ts_lo)
        out["ss_Tif_hi"] = jnp.asarray(Tif_hi)
        out["ss_Tif_lo"] = jnp.asarray(Tif_lo)
        out["ss_Tif_shoup_hi"] = jnp.asarray(Tifs_hi)
        out["ss_Tif_shoup_lo"] = jnp.asarray(Tifs_lo)
        out["ss_log_n1"] = a  # static under pack_jit (non-array)
        return out


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


def _pair_slice(t, key, m):
    """(L, m, 1, 1) hi/lo twiddle slices for a butterfly stage."""
    h = jax.lax.slice_in_dim(t[key + "_hi"], m, 2 * m, axis=1)[:, :, None, None]
    l = jax.lax.slice_in_dim(t[key + "_lo"], m, 2 * m, axis=1)[:, :, None, None]
    return h, l


def _bf_fwd64(x_hi, x_lo, t, pre, q4, q24, q3, q23, lazy_out=False):
    """Harvey CT butterflies pairing along axis -2 of (..., L, N, M) pairs;
    the last axis M rides the 128 lanes at full width in every stage.
    Accepts [0, 4q) (4q < 2^64 by the q < 2^62 bound); returns [0, q), or
    [0, 2q) when lazy_out.  Pair-width mirror of ops/ntt.py
    _axis2_butterflies_forward."""
    N, M = x_hi.shape[-2], x_hi.shape[-1]
    lead = x_hi.shape[:-3]
    L = x_hi.shape[-3]
    m, tt = 1, N // 2
    while m < N:
        shp = lead + (L, m, 2, tt, M)
        xh, xl = x_hi.reshape(shp), x_lo.reshape(shp)
        uh, ul = W.cond_sub64(xh[..., 0, :, :], xl[..., 0, :, :], *q24)
        vh, vl = xh[..., 1, :, :], xl[..., 1, :, :]
        wh, wl = _pair_slice(t, pre + "_psi", m)
        sh, sl = _pair_slice(t, pre + "_psi_shoup", m)
        th, tl = W.shoup_mul64_lazy(vh, vl, wh, wl, sh, sl, *q4)  # [0, 2q)
        ah, al = W.add64(uh, ul, th, tl)                          # [0, 4q)
        bh, bl = W.sub64(*W.add64(uh, ul, *q24), th, tl)          # [0, 4q)
        x_hi = safe_stack([ah, bh], axis=-3).reshape(lead + (L, N, M))
        x_lo = safe_stack([al, bl], axis=-3).reshape(lead + (L, N, M))
        m *= 2
        tt //= 2
    x_hi, x_lo = W.cond_sub64(x_hi, x_lo, *q23)
    if lazy_out:
        return x_hi, x_lo
    return W.cond_sub64(x_hi, x_lo, *q3)


def _bf_inv64(x_hi, x_lo, t, pre, q4, q24):
    """GS inverse butterflies along axis -2 of (..., L, N, M) pairs; values
    stay in [0, 2q); the n^-1 scaling is always folded into the caller's
    ss_Tif twiddle (skip_scale semantics of ops/ntt.py)."""
    N, M = x_hi.shape[-2], x_hi.shape[-1]
    lead = x_hi.shape[:-3]
    L = x_hi.shape[-3]
    m, tt = N // 2, 1
    while m >= 1:
        shp = lead + (L, m, 2, tt, M)
        xh, xl = x_hi.reshape(shp), x_lo.reshape(shp)
        uh, ul = xh[..., 0, :, :], xl[..., 0, :, :]
        vh, vl = xh[..., 1, :, :], xl[..., 1, :, :]
        wh, wl = _pair_slice(t, pre + "_inv_psi", m)
        sh, sl = _pair_slice(t, pre + "_inv_psi_shoup", m)
        ah, al = W.cond_sub64(*W.add64(uh, ul, vh, vl), *q24)     # [0, 2q)
        dh, dl = W.sub64(*W.add64(uh, ul, *q24), vh, vl)          # u + 2q - v
        bh, bl = W.shoup_mul64_lazy(dh, dl, wh, wl, sh, sl, *q4)  # [0, 2q)
        x_hi = safe_stack([ah, bh], axis=-3).reshape(lead + (L, N, M))
        x_lo = safe_stack([al, bl], axis=-3).reshape(lead + (L, N, M))
        m //= 2
        tt *= 2
    return x_hi, x_lo


def _ss_broadcasts(t, lead_len):
    """Broadcast-shaped (q, 2q) word pairs for the butterfly helpers."""
    r4 = (1,) * lead_len + (-1, 1, 1, 1)
    r3 = (1,) * lead_len + (-1, 1, 1)
    q4 = (t["q_hi"].reshape(r4), t["q_lo"].reshape(r4))
    q24 = (t["q2_hi"].reshape(r4), t["q2_lo"].reshape(r4))
    q3 = (t["q_hi"].reshape(r3), t["q_lo"].reshape(r3))
    q23 = (t["q2_hi"].reshape(r3), t["q2_lo"].reshape(r3))
    return q4, q24, q3, q23


def ntt_forward64_sixstep(x_hi, x_lo, t: dict):
    """Six-step forward NTT at pair width: NTT_n1 along the row axis,
    twiddle, transpose, NTT_n2, transpose back.  Bit-identical to the
    radix-2 path (ref schedule: fgk/ntt_grouped.cu:158-246)."""
    n = x_hi.shape[-1]
    n1 = 1 << t["ss_log_n1"]
    n2 = n // n1
    lead = x_hi.shape[:-1]
    q4, q24, q3, q23 = _ss_broadcasts(t, len(lead) - 1)
    Xh = x_hi.reshape(lead + (n1, n2))
    Xl = x_lo.reshape(lead + (n1, n2))
    Xh, Xl = _bf_fwd64(Xh, Xl, t, "ss1", q4, q24, q3, q23, lazy_out=True)
    Xh, Xl = W.shoup_mul64_lazy(
        Xh, Xl, t["ss_T_hi"], t["ss_T_lo"],
        t["ss_T_shoup_hi"], t["ss_T_shoup_lo"], *q3)              # [0, 2q)
    Xh, Xl = jnp.swapaxes(Xh, -1, -2), jnp.swapaxes(Xl, -1, -2)
    Xh, Xl = _bf_fwd64(Xh, Xl, t, "ss2", q4, q24, q3, q23)
    Xh, Xl = jnp.swapaxes(Xh, -1, -2), jnp.swapaxes(Xl, -1, -2)
    return Xh.reshape(lead + (n,)), Xl.reshape(lead + (n,))


def ntt_inverse64_sixstep(x_hi, x_lo, t: dict):
    n = x_hi.shape[-1]
    n1 = 1 << t["ss_log_n1"]
    n2 = n // n1
    lead = x_hi.shape[:-1]
    q4, q24, q3, q23 = _ss_broadcasts(t, len(lead) - 1)
    Xh = x_hi.reshape(lead + (n1, n2))
    Xl = x_lo.reshape(lead + (n1, n2))
    Xh, Xl = jnp.swapaxes(Xh, -1, -2), jnp.swapaxes(Xl, -1, -2)
    Xh, Xl = _bf_inv64(Xh, Xl, t, "ss2", q4, q24)
    Xh, Xl = jnp.swapaxes(Xh, -1, -2), jnp.swapaxes(Xl, -1, -2)
    # folded twiddle carries n^-1 = n1^-1 * n2^-1: both sub-INTT scaling
    # passes collapse into this one multiply (lazy: [0, 2q) out).
    Xh, Xl = W.shoup_mul64_lazy(
        Xh, Xl, t["ss_Tif_hi"], t["ss_Tif_lo"],
        t["ss_Tif_shoup_hi"], t["ss_Tif_shoup_lo"], *q3)
    Xh, Xl = _bf_inv64(Xh, Xl, t, "ss1", q4, q24)
    Xh, Xl = W.cond_sub64(Xh, Xl, *q3)
    return Xh.reshape(lead + (n,)), Xl.reshape(lead + (n,))


@pack_jit
def ntt_forward64(x_hi, x_lo, t: dict):
    """Forward negacyclic NTT along the last axis of a (hi, lo) pair.
    In: [0, q) natural order; out: [0, q) NTT order.  Dispatches to the
    six-step schedule when the pack carries its tables.

    Jitted at the function boundary: eager callers (keygen, rlwe encrypt,
    decrypt) would otherwise dispatch ~6 pair primitives x log n stages as
    individual XLA mini-compiles (~3 s per eager wide NTT even at n=32)."""
    if "ss_T_hi" in t:
        return ntt_forward64_sixstep(x_hi, x_lo, t)
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
    if "ss_Tif_hi" in t:
        return ntt_inverse64_sixstep(x_hi, x_lo, t)
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
