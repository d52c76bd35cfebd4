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

Lazy-reduction invariant: all intermediate values stay in [0, 2q) via Shoup
lazy multiplication (ops/u32.py); 4q < 2^32 is guaranteed by the fast-path
modulus bound (core/modulus.py).  Outputs are fully reduced to [0, q).

Tables are built host-side with Python ints (NTTTables, mirroring
reference NTTTables ntt.h:30) and shipped to device as a pytree dict.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

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

    _row_cache: dict = {}  # (log_n, q) -> per-modulus row dict (class-level)

    @classmethod
    def _rows(cls, log_n: int, mod: Modulus) -> dict:
        key = (log_n, mod.value)
        if key in cls._row_cache:
            return cls._row_cache[key]
        n = 1 << log_n
        q = mod.value
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
        """Device pytree of all tables (uploaded lazily, cached)."""
        if self._device is None:
            self._device = {k: jnp.asarray(v) for k, v in self._host.items()}
        return self._device

    @property
    def host(self) -> dict:
        return self._host


# ---------------------------------------------------------------------------
# Core transforms.  x has shape (..., L, n); tables dict as NTTTables.pack().
# These are building blocks meant to be called inside larger jitted functions;
# module-level jitted wrappers are provided for direct use.
# ---------------------------------------------------------------------------

def ntt_forward(x: jnp.ndarray, t: dict) -> jnp.ndarray:
    """Forward negacyclic NTT along the last axis. In: [0,q) natural order;
    out: [0,q) NTT order (ref: fgk/ntt_grouped.cu:33-295)."""
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
        x = jnp.stack([x0, x1], axis=-2).reshape(lead + (L, n))
        m *= 2
        tt //= 2
    return U.cond_sub(x, q.reshape((1,) * len(lead) + (L, 1)))


def ntt_inverse(x: jnp.ndarray, t: dict) -> jnp.ndarray:
    """Inverse negacyclic NTT along the last axis. In: [0,q) NTT order;
    out: [0,q) natural order, scaled by n^-1."""
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
        x = jnp.stack([x0, x1], axis=-2).reshape(lead + (L, n))
        m //= 2
        tt *= 2
    qf = t["q"].reshape((1,) * len(lead) + (L, 1))
    ninv = t["n_inv"].reshape((1,) * len(lead) + (L, 1))
    ninv_sh = t["n_inv_shoup"].reshape((1,) * len(lead) + (L, 1))
    return U.shoup_mul(x, ninv, ninv_sh, qf)


ntt = jax.jit(ntt_forward)
intt = jax.jit(ntt_inverse)
