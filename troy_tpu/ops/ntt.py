"""Negacyclic NTT/INTT over RNS limbs — the hot kernel of the library.

TPU-native rebuild of reference src/utils/ntt.{h,cu} + src/fgk/ntt_grouped.cu.
The reference stages radix-2 Harvey butterflies through CUDA shared memory with
per-element index arithmetic.  On TPU, gathers and bit-reversal permutations
are lane-hostile, so this implementation uses the key observation that the
classic SEAL/Harvey iterative schedule is *reshape-only*:

  stage with m groups:  view the flat (..., n) array as (..., m, 2, t),
  butterfly the two halves elementwise against per-group twiddles (L, m, 1).

Input is natural (coefficient) order; output is the standard "NTT order"
(position p holds the evaluation at psi^(2*brv(p)+1)).  Exactly like SEAL,
NTT-domain order is only ever consumed by elementwise products and by
precomputed Galois permutation tables, so no unscrambling is needed.

Lazy-reduction invariants: the radix-2 path keeps all intermediates in
[0, 2q) via Shoup lazy multiplication (ops/u32.py); the six-step forward
butterflies run Harvey-lazy with stage values in [0, 4q) (4q < 2^32 by the
fast-path modulus bound, core/modulus.py).  Outputs are fully reduced to
[0, q).

Tables are built host-side with Python ints (NTTTables, mirroring
reference NTTTables ntt.h:30) and shipped to device as a pytree dict.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .jitu import pack_jit, safe_stack
from . import u32 as U
from ..utils import numth
from ..core.modulus import Modulus


class NTTTables:
    """Per-(n, modulus-list) twiddle tables, stacked over the limb axis.

    Arrays (numpy host copies; `pack()` returns the device pytree):
      psi_br, psi_br_shoup         (L, n)  psi^brv(i) and Shoup companions
      inv_psi_br, inv_psi_br_shoup (L, n)  inverses of psi_br entries
      n_inv, n_inv_shoup           (L,)    n^-1 mod q
      q, ratio_hi, ratio_lo        (L,)    modulus + Barrett ratio words
    """

    _row_cache: dict = {}  # (log_n, q, psi) -> per-modulus row dict

    @classmethod
    def _rows(cls, log_n: int, mod: Modulus, psi: int | None = None) -> dict:
        key = (log_n, mod.value, psi)
        if key in cls._row_cache:
            return cls._row_cache[key]
        n = 1 << log_n
        q = mod.value
        if psi is None:
            psi = numth.try_minimal_primitive_root(2 * n, q)
        if psi is None:
            raise ValueError(
                f"[NTTTables] modulus {q} does not support NTT of degree {n}"
            )
        ipsi = numth.invert_mod(psi, q)
        brv = [numth.reverse_bits(i, log_n) for i in range(n)]
        fwd = np.zeros(n, dtype=np.uint64)
        inv = np.zeros(n, dtype=np.uint64)
        p, ip = 1, 1
        for i in range(n):
            fwd[brv[i]] = p
            inv[brv[i]] = ip
            p = p * psi % q
            ip = ip * ipsi % q
        ninv = numth.invert_mod(n, q)
        rows = dict(
            psi_br=fwd.astype(np.uint32),
            psi_br_shoup=((fwd.astype(object) << 32) // q).astype(np.uint64).astype(np.uint32),
            inv_psi_br=inv.astype(np.uint32),
            inv_psi_br_shoup=((inv.astype(object) << 32) // q).astype(np.uint64).astype(np.uint32),
            n_inv=np.uint32(ninv),
            n_inv_shoup=np.uint32((ninv << 32) // q),
        )
        cls._row_cache[key] = rows
        return rows

    def __init__(self, log_n: int, moduli: list[Modulus]):
        self.log_n = log_n
        self.n = n = 1 << log_n
        self.moduli = moduli
        L = len(moduli)

        psi_br = np.zeros((L, n), dtype=np.uint32)
        psi_br_sh = np.zeros((L, n), dtype=np.uint32)
        ipsi_br = np.zeros((L, n), dtype=np.uint32)
        ipsi_br_sh = np.zeros((L, n), dtype=np.uint32)
        n_inv = np.zeros((L,), dtype=np.uint32)
        n_inv_sh = np.zeros((L,), dtype=np.uint32)

        for k, mod in enumerate(moduli):
            rows = self._rows(log_n, mod)
            psi_br[k] = rows["psi_br"]
            ipsi_br[k] = rows["inv_psi_br"]
            psi_br_sh[k] = rows["psi_br_shoup"]
            ipsi_br_sh[k] = rows["inv_psi_br_shoup"]
            n_inv[k] = rows["n_inv"]
            n_inv_sh[k] = rows["n_inv_shoup"]

        self._host = dict(
            psi_br=psi_br, psi_br_shoup=psi_br_sh,
            inv_psi_br=ipsi_br, inv_psi_br_shoup=ipsi_br_sh,
            n_inv=n_inv, n_inv_shoup=n_inv_sh,
            q=np.array([m.value for m in moduli], dtype=np.uint32),
            ratio_hi=np.array([m.ratio64_hi for m in moduli], dtype=np.uint32),
            ratio_lo=np.array([m.ratio64_lo for m in moduli], dtype=np.uint32),
        )
        self._device: dict | None = None

    def pack(self) -> dict:
        """Device pytree of all tables (uploaded lazily, cached).  When the
        MXU backend is enabled (set_ntt_backend), the 4-step matmul tables
        are merged in under mxu_* keys and ntt_forward/ntt_inverse dispatch
        to the MXU path."""
        if self._device is None:
            self._device = {k: jnp.asarray(v) for k, v in self._host.items()}
            if _BACKEND == "mxu" and self.log_n >= _MXU_MIN_LOG_N:
                from .ntt_mxu import MxuNTTTables

                mxu = MxuNTTTables(self.log_n, self.moduli)
                self._device.update(mxu.pack_prefixed())
            elif _BACKEND in ("sixstep", "pallas") and self.log_n >= _MXU_MIN_LOG_N:
                self._device.update(self._sixstep_pack())
                if _BACKEND == "pallas":
                    self._device["use_pallas"] = True
                else:
                    # ss_Ti is consumed only by the pallas inverse kernel and
                    # fused_mul (which build their packs explicitly); the XLA
                    # sixstep inverse uses the folded ss_Tif — skip the
                    # 2x(L,n1,n2) upload on the default backend.
                    del self._device["ss_Ti"], self._device["ss_Ti_shoup"]
            elif _BACKEND == "pallas_mxu" and self.log_n >= _MXU_MIN_LOG_N:
                from .ntt_mxu import MxuNTTTables

                mxu = MxuNTTTables(self.log_n, self.moduli)
                self._device.update(mxu.pack_prefixed())
                self._device["use_pallas_mxu"] = True
        return self._device

    def _sixstep_pack(self) -> dict:
        """Tables for the six-step transform (see ntt_forward_sixstep):
        the global negacyclic NTT with root psi factorizes into a size-n1
        negacyclic NTT with root psi^n2 along the matrix row axis, a twiddle
        (with the second-stage twist pre-cancelled), and a size-n2 negacyclic
        NTT with root psi^n1 along the column axis (after a transpose)."""
        import os as _os

        log_n = self.log_n
        n = self.n
        # TROY_NTT_SPLIT_A = log2(n1) overrides the square-ish default
        # (tuning knob: at n=16384 the (128,128) default vs (64,256) etc.)
        a = int(_os.environ.get("TROY_NTT_SPLIT_A", log_n // 2))
        a = max(1, min(log_n - 1, a))
        b = log_n - a
        n1, n2 = 1 << a, 1 << b
        L = len(self.moduli)

        def stack(rows_list, key):
            return np.stack([r[key] for r in rows_list])

        rows1, rows2 = [], []
        T = np.zeros((L, n1, n2), dtype=np.uint32)
        Ti = np.zeros((L, n1, n2), dtype=np.uint32)
        T_sh = np.zeros((L, n1, n2), dtype=np.uint32)
        Ti_sh = np.zeros((L, n1, n2), dtype=np.uint32)
        Tif = np.zeros((L, n1, n2), dtype=np.uint32)
        Tif_sh = np.zeros((L, n1, n2), dtype=np.uint32)
        for l, mod in enumerate(self.moduli):
            q = mod.value
            psi = numth.try_minimal_primitive_root(2 * n, q)
            psi1 = pow(psi, n2, q)
            psi2 = pow(psi, n1, q)
            rows1.append(self._rows(a, mod, psi1))
            rows2.append(self._rows(b, mod, psi2))
            n_inv_full = numth.invert_mod(n, q)  # = n1^-1 * n2^-1 mod q
            # T'[k1', i2] = psi^i2 * w^(i2*brv_a(k1')) * psi^(-n1*i2),
            # w = psi^2  (stage-2 twist of the 4-step, minus the negacyclic
            # twist that the second sub-NTT will re-apply)
            w = psi * psi % q
            ipsi = numth.invert_mod(psi, q)
            base_row = [pow(psi, i2, q) * pow(ipsi, n1 * i2 % (2 * n), q) % q
                        for i2 in range(n2)]
            for k1p in range(n1):
                k1 = numth.reverse_bits(k1p, a)
                step = pow(w, k1, q)
                v = 1
                for i2 in range(n2):
                    tv = base_row[i2] * v % q
                    T[l, k1p, i2] = tv
                    tvi = numth.invert_mod(tv, q)
                    Ti[l, k1p, i2] = tvi
                    T_sh[l, k1p, i2] = (tv << 32) // q
                    Ti_sh[l, k1p, i2] = (tvi << 32) // q
                    # inverse twiddle with both sub-INTT n^-1 scalings folded
                    # in: removes two full-array Shoup passes per INTT.
                    tvif = tvi * n_inv_full % q
                    Tif[l, k1p, i2] = tvif
                    Tif_sh[l, k1p, i2] = (tvif << 32) // q
                    v = v * step % q
        out = {}
        for key in ("psi_br", "psi_br_shoup", "inv_psi_br", "inv_psi_br_shoup"):
            out[f"ss1_{key}"] = jnp.asarray(stack(rows1, key))
            out[f"ss2_{key}"] = jnp.asarray(stack(rows2, key))
        out["ss1_n_inv"] = jnp.asarray(np.stack([r["n_inv"] for r in rows1]))
        out["ss1_n_inv_shoup"] = jnp.asarray(np.stack([r["n_inv_shoup"] for r in rows1]))
        out["ss2_n_inv"] = jnp.asarray(np.stack([r["n_inv"] for r in rows2]))
        out["ss2_n_inv_shoup"] = jnp.asarray(np.stack([r["n_inv_shoup"] for r in rows2]))
        out["ss_T"] = jnp.asarray(T)
        out["ss_T_shoup"] = jnp.asarray(T_sh)
        out["ss_Ti"] = jnp.asarray(Ti)
        out["ss_Ti_shoup"] = jnp.asarray(Ti_sh)
        out["ss_Tif"] = jnp.asarray(Tif)
        out["ss_Tif_shoup"] = jnp.asarray(Tif_sh)
        out["ss_log_n1"] = a          # static under pack_jit (non-array)
        return out

    @property
    def host(self) -> dict:
        return self._host


# ---------------------------------------------------------------------------
# Core transforms.  x has shape (..., L, n); tables dict as NTTTables.pack().
# These are building blocks meant to be called inside larger jitted functions;
# module-level jitted wrappers are provided for direct use.
# ---------------------------------------------------------------------------

import os

# 'sixstep' is the default: bit-identical to radix2, ~2.5x faster end-to-end
# on TPU (full 128-lane utilization in every butterfly stage), and faster on
# CPU as well.  radix2 remains for n < 256 and as the reference oracle.
_BACKEND = os.environ.get("TROY_NTT_BACKEND", "sixstep")
_MXU_MIN_LOG_N = 8


def set_ntt_backend(name: str):
    """'radix2' (reshape+VPU butterflies), 'mxu' (4-step matmul,
    ops/ntt_mxu.py) or 'sixstep' (lane-optimal radix-2 over a matrix view).
    Affects table packs built afterwards (both widths: NTT64Tables packs
    consult this too)."""
    global _BACKEND
    if name not in ("radix2", "mxu", "sixstep", "pallas", "pallas_mxu"):
        raise ValueError(f"[set_ntt_backend] unknown backend {name}")
    _BACKEND = name


def get_ntt_backend() -> str:
    return _BACKEND


def slice_tables(t: dict, lo: int, hi: int) -> dict:
    """Restrict a table pack to limb rows [lo, hi) — aware of the per-key
    limb axis of the mxu_* entries."""
    from .ntt_mxu import MXU_LIMB_AXIS

    out = {}
    for k, v in t.items():
        if not hasattr(v, "ndim"):  # flags like use_pallas pass through
            out[k] = v
            continue
        axis = MXU_LIMB_AXIS.get(k, 0)
        if axis == 0:
            out[k] = v[lo:hi]
        else:
            out[k] = jax.lax.slice_in_dim(v, lo, hi, axis=axis)
    return out


def take_tables(t: dict, idx) -> dict:
    """Gather arbitrary limb rows of a table pack (mxu-axis aware)."""
    from .ntt_mxu import MXU_LIMB_AXIS

    idx = jnp.asarray(idx)
    return {k: (jnp.take(v, idx, axis=MXU_LIMB_AXIS.get(k, 0))
                if hasattr(v, "ndim") else v)
            for k, v in t.items()}


def _axis2_butterflies_forward(x, psi_br, psi_br_shoup, q, lazy_out=False):
    """CT butterflies pairing along axis -2 of (..., L, N, M); the last axis
    M rides the 128-lane dimension at full utilization in every stage.

    Harvey-lazy: stage outputs live in [0, 4q) (4q < 2^32 by the fast-path
    modulus bound); only the u input of each butterfly is conditionally
    subtracted, halving the compare/select traffic vs reducing both outputs.
    Accepts input in [0, 4q).  Returns [0, q), or [0, 2q) when lazy_out.
    """
    N, M = x.shape[-2], x.shape[-1]
    lead = x.shape[:-3]
    L = x.shape[-3]
    qb = q.reshape((1,) * len(lead) + (L, 1, 1, 1))
    two_q = qb * U.U32(2)
    m, tt = 1, N // 2
    while m < N:
        xr = x.reshape(lead + (L, m, 2, tt, M))
        u = U.cond_sub(xr[..., 0, :, :], two_q)      # [0, 4q) -> [0, 2q)
        v = xr[..., 1, :, :]                          # [0, 4q): any u32 is ok
        w = jax.lax.slice_in_dim(psi_br, m, 2 * m, axis=1)[:, :, None, None]
        ws = jax.lax.slice_in_dim(psi_br_shoup, m, 2 * m, axis=1)[:, :, None, None]
        tv = U.shoup_mul_lazy(v, w, ws, qb)           # [0, 2q)
        x0 = u + tv                                   # [0, 4q)
        x1 = u + two_q - tv                           # [0, 4q)
        x = safe_stack([x0, x1], axis=-3).reshape(lead + (L, N, M))
        m *= 2
        tt //= 2
    x = U.cond_sub(x, two_q.reshape((1,) * len(lead) + (L, 1, 1)))
    if lazy_out:
        return x
    return U.cond_sub(x, q.reshape((1,) * len(lead) + (L, 1, 1)))


def _axis2_butterflies_inverse(x, inv_psi_br, inv_psi_br_shoup, n_inv,
                               n_inv_shoup, q, skip_scale=False):
    """GS inverse butterflies; values stay in [0, 2q).  With skip_scale the
    final n^-1 Shoup pass is omitted (the caller folds it into a downstream
    twiddle table) and the lazy [0, 2q) result is returned."""
    N, M = x.shape[-2], x.shape[-1]
    lead = x.shape[:-3]
    L = x.shape[-3]
    qb = q.reshape((1,) * len(lead) + (L, 1, 1, 1))
    two_q = qb * U.U32(2)
    m, tt = N // 2, 1
    while m >= 1:
        xr = x.reshape(lead + (L, m, 2, tt, M))
        u = xr[..., 0, :, :]
        v = xr[..., 1, :, :]
        w = jax.lax.slice_in_dim(inv_psi_br, m, 2 * m, axis=1)[:, :, None, None]
        ws = jax.lax.slice_in_dim(inv_psi_br_shoup, m, 2 * m, axis=1)[:, :, None, None]
        x0 = U.cond_sub(u + v, two_q)
        x1 = U.shoup_mul_lazy(u + two_q - v, w, ws, qb)
        x = safe_stack([x0, x1], axis=-3).reshape(lead + (L, N, M))
        m //= 2
        tt *= 2
    if skip_scale:
        return x
    qf = q.reshape((1,) * len(lead) + (L, 1, 1))
    return U.shoup_mul(x, n_inv[:, None, None], n_inv_shoup[:, None, None], qf)


def ntt_forward_sixstep(x: jnp.ndarray, t: dict) -> jnp.ndarray:
    """Six-step forward NTT: NTT_n1 along the row axis, twiddle, transpose,
    NTT_n2 along the row axis, transpose back.  Bit-identical to the radix-2
    path; every butterfly stage runs with a full 128-lane last axis."""
    n = x.shape[-1]
    log_n = n.bit_length() - 1
    n1 = 1 << t.get("ss_log_n1", log_n // 2)
    n2 = n // n1
    lead = x.shape[:-1]
    q = t["q"]
    X = x.reshape(lead + (n1, n2))
    X = _axis2_butterflies_forward(X, t["ss1_psi_br"], t["ss1_psi_br_shoup"], q,
                                   lazy_out=True)
    qb = q[:, None, None]
    X = U.shoup_mul_lazy(X, t["ss_T"], t["ss_T_shoup"], qb)   # [0, 2q)
    X = jnp.swapaxes(X, -1, -2)
    X = _axis2_butterflies_forward(X, t["ss2_psi_br"], t["ss2_psi_br_shoup"], q)
    X = jnp.swapaxes(X, -1, -2)
    return X.reshape(lead + (n,))


def ntt_inverse_sixstep(x: jnp.ndarray, t: dict) -> jnp.ndarray:
    n = x.shape[-1]
    log_n = n.bit_length() - 1
    n1 = 1 << t.get("ss_log_n1", log_n // 2)
    n2 = n // n1
    lead = x.shape[:-1]
    q = t["q"]
    X = x.reshape(lead + (n1, n2))
    X = jnp.swapaxes(X, -1, -2)
    X = _axis2_butterflies_inverse(X, t["ss2_inv_psi_br"], t["ss2_inv_psi_br_shoup"],
                                   t["ss2_n_inv"], t["ss2_n_inv_shoup"], q,
                                   skip_scale=True)
    X = jnp.swapaxes(X, -1, -2)
    qb = q[:, None, None]
    # folded twiddle carries n^-1 = n1^-1 * n2^-1: both sub-INTT scaling
    # passes collapse into this one multiply (lazy: [0, 2q) out).
    X = U.shoup_mul_lazy(X, t["ss_Tif"], t["ss_Tif_shoup"], qb)
    X = _axis2_butterflies_inverse(X, t["ss1_inv_psi_br"], t["ss1_inv_psi_br_shoup"],
                                   t["ss1_n_inv"], t["ss1_n_inv_shoup"], q,
                                   skip_scale=True)
    X = U.cond_sub(X, q[:, None, None])
    return X.reshape(lead + (n,))


@pack_jit
def ntt_forward(x: jnp.ndarray, t: dict) -> jnp.ndarray:
    """Forward negacyclic NTT along the last axis. In: [0,q) natural order;
    out: [0,q) NTT order (ref: fgk/ntt_grouped.cu:33-295).  Dispatches to the
    MXU 4-step / six-step paths when the pack carries their tables."""
    if "mxu_W1" in t:
        if t.get("use_pallas_mxu") and jax.default_backend() != "cpu":
            from .ntt_pallas import ntt_forward_pallas_mxu

            return ntt_forward_pallas_mxu(x, t)
        from .ntt_mxu import ntt_forward_mxu

        return ntt_forward_mxu(x, t, prefix="mxu_")
    if "ss_T" in t:
        if t.get("use_pallas") and jax.default_backend() != "cpu":
            from .ntt_pallas import ntt_forward_pallas

            return ntt_forward_pallas(x, t)
        return ntt_forward_sixstep(x, t)
    n = x.shape[-1]
    L = x.shape[-2]
    lead = x.shape[:-2]
    q = t["q"].reshape((1,) * len(lead) + (L, 1, 1))
    two_q = q * U.U32(2)
    m = 1
    tt = n // 2
    while m < n:
        xr = x.reshape(lead + (L, m, 2, tt))
        u = xr[..., 0, :]
        v = xr[..., 1, :]
        w = jax.lax.slice_in_dim(t["psi_br"], m, 2 * m, axis=1)[..., None]
        ws = jax.lax.slice_in_dim(t["psi_br_shoup"], m, 2 * m, axis=1)[..., None]
        tv = U.shoup_mul_lazy(v, w, ws, q)          # [0, 2q)
        x0 = U.cond_sub(u + tv, two_q)               # [0, 2q)
        x1 = U.cond_sub(u + two_q - tv, two_q)       # [0, 2q)
        x = safe_stack([x0, x1], axis=-2).reshape(lead + (L, n))
        m *= 2
        tt //= 2
    return U.cond_sub(x, q.reshape((1,) * len(lead) + (L, 1)))


@pack_jit
def ntt_inverse(x: jnp.ndarray, t: dict) -> jnp.ndarray:
    """Inverse negacyclic NTT along the last axis. In: [0,q) NTT order;
    out: [0,q) natural order, scaled by n^-1."""
    if "mxu_W1i" in t:
        if t.get("use_pallas_mxu") and jax.default_backend() != "cpu":
            from .ntt_pallas import ntt_inverse_pallas_mxu

            return ntt_inverse_pallas_mxu(x, t)
        from .ntt_mxu import ntt_inverse_mxu

        return ntt_inverse_mxu(x, t, prefix="mxu_")
    if "ss_Tif" in t:
        if t.get("use_pallas") and jax.default_backend() != "cpu":
            from .ntt_pallas import ntt_inverse_pallas

            return ntt_inverse_pallas(x, t)
        return ntt_inverse_sixstep(x, t)
    n = x.shape[-1]
    L = x.shape[-2]
    lead = x.shape[:-2]
    q = t["q"].reshape((1,) * len(lead) + (L, 1, 1))
    two_q = q * U.U32(2)
    m = n // 2
    tt = 1
    while m >= 1:
        xr = x.reshape(lead + (L, m, 2, tt))
        u = xr[..., 0, :]
        v = xr[..., 1, :]
        w = jax.lax.slice_in_dim(t["inv_psi_br"], m, 2 * m, axis=1)[..., None]
        ws = jax.lax.slice_in_dim(t["inv_psi_br_shoup"], m, 2 * m, axis=1)[..., None]
        x0 = U.cond_sub(u + v, two_q)                        # [0, 2q)
        x1 = U.shoup_mul_lazy(u + two_q - v, w, ws, q)       # [0, 2q)
        x = safe_stack([x0, x1], axis=-2).reshape(lead + (L, n))
        m //= 2
        tt *= 2
    qf = t["q"].reshape((1,) * len(lead) + (L, 1))
    ninv = t["n_inv"].reshape((1,) * len(lead) + (L, 1))
    ninv_sh = t["n_inv_shoup"].reshape((1,) * len(lead) + (L, 1))
    return U.shoup_mul(x, ninv, ninv_sh, qf)


ntt = ntt_forward
intt = ntt_inverse
