"""Galois automorphisms x -> x^g on R = Z_q[X]/(X^n + 1).

TPU-native rebuild of reference src/utils/galois.{h,cu}: per-element
permutation tables built lazily host-side, applied as a single gather along
the coefficient axis (identical for every RNS limb, so one jnp.take serves
the whole (.., L, n) tensor).

Coefficient domain: X^i -> X^{i*g mod 2n} with sign (-1)^floor(i*g / n).
NTT domain: position p holds the evaluation at psi^(2*brv(p)+1) (ops/ntt.py
order convention), and applying g permutes evaluation points:
new[p] = old[p'] with (2*brv(p')+1) = (2*brv(p)+1)*g mod 2n — a pure gather,
no arithmetic (ref: galois.cu apply_ntt_ps).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..utils import numth
from . import u32 as U

GENERATOR = 3  # rotation group generator (ref: galois.h:12)


class GaloisTool:
    _instances: dict[int, "GaloisTool"] = {}

    def __init__(self, log_n: int):
        self.log_n = log_n
        self.n = 1 << log_n
        self._coeff_tables: dict[int, tuple[jnp.ndarray, jnp.ndarray]] = {}
        self._ntt_tables: dict[int, jnp.ndarray] = {}

    @classmethod
    def for_context(cls, cd) -> "GaloisTool":
        log_n = cd.log_n
        if log_n not in cls._instances:
            cls._instances[log_n] = cls(log_n)
        return cls._instances[log_n]

    # ------------------------------------------------------------------
    @staticmethod
    def get_element_from_step(step: int, n: int) -> int:
        """Rotation step -> Galois element 3^step mod 2n
        (ref: galois.h get_element_from_step)."""
        if step == 0:
            return 1
        m = 2 * n
        if step > 0:
            return pow(GENERATOR, step, m)
        return pow(numth.invert_mod(GENERATOR, m), -step, m)

    @staticmethod
    def conjugate_element(n: int) -> int:
        return 2 * n - 1

    # ------------------------------------------------------------------
    def _build_coeff(self, g: int):
        n, m = self.n, 2 * self.n
        src = np.arange(n, dtype=np.int64)
        dst = (src * g) % m
        sign = dst >= n          # X^(n+r) = -X^r
        dst = dst % n
        # gather form: out[j] = +-in[perm[j]]
        perm = np.empty(n, dtype=np.int32)
        neg = np.empty(n, dtype=bool)
        perm[dst] = src
        neg[dst] = sign
        return jnp.asarray(perm), jnp.asarray(neg)

    def _build_ntt(self, g: int):
        n = self.n
        log_n = self.log_n
        perm = np.empty(n, dtype=np.int32)
        for p in range(n):
            e = 2 * numth.reverse_bits(p, log_n) + 1
            e2 = (e * g) % (2 * n)
            perm[p] = numth.reverse_bits((e2 - 1) // 2, log_n)
        return jnp.asarray(perm)

    # ------------------------------------------------------------------
    def apply_coeff(self, x: jnp.ndarray, g: int, qtab: dict) -> jnp.ndarray:
        """Coefficient-domain automorphism on (..., L, n) u32 or
        (..., 2, L, n) wide-pair arrays (ref: galois.cu apply_ps)."""
        if g not in self._coeff_tables:
            self._coeff_tables[g] = self._build_coeff(g)
        perm, neg = self._coeff_tables[g]
        gathered = jnp.take(x, perm, axis=-1)
        if qtab.get("words", 1) == 2:
            from . import u64 as W

            qh = qtab["q_hi"][:, None]
            ql = qtab["q_lo"][:, None]
            h = gathered[..., 0, :, :]
            l = gathered[..., 1, :, :]
            nh, nl = W.neg_mod64(h, l, qh, ql)
            return jnp.stack(
                [jnp.where(neg, nh, h), jnp.where(neg, nl, l)], axis=-3)
        q = qtab["q"].reshape((1,) * (x.ndim - 2) + (-1, 1))
        return jnp.where(neg, U.neg_mod(gathered, q), gathered)

    def apply_ntt(self, x: jnp.ndarray, g: int) -> jnp.ndarray:
        """NTT-domain automorphism: pure gather (ref: galois.cu apply_ntt_ps)."""
        if g not in self._ntt_tables:
            self._ntt_tables[g] = self._build_ntt(g)
        return jnp.take(x, self._ntt_tables[g], axis=-1)
