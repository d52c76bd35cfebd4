"""Elementwise RNS-polynomial operations.

TPU-native rebuild of reference src/utils/poly_small_mod.{h,cu} (1573 LoC of
CUDA kernels in four granularities _p/_ps/_b*).  In JAX all granularities and
the reference's `_batched` API family collapse into one broadcasting function
per op: polynomials are (..., L, n) uint32 arrays, moduli are (L,) vectors
broadcast as (L, 1), and arbitrary leading axes provide per-ciphertext /
per-poly batching (vmap-free, XLA fuses the elementwise chains).

All inputs/outputs are fully reduced in [0, q) unless noted.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import u32 as U


def _bq(t: dict, x: jnp.ndarray, key: str = "q"):
    """Broadcast a per-limb (L,) table entry against (..., L, n) data."""
    return t[key].reshape((1,) * (x.ndim - 2) + (-1, 1))


# -- add/sub/negate (ref: poly_small_mod add_ps/sub_ps/negate_ps) -----------

def add(x, y, t):
    return U.add_mod(x, y, _bq(t, x))


def sub(x, y, t):
    return U.sub_mod(x, y, _bq(t, x))


def negate(x, t):
    return U.neg_mod(x, _bq(t, x))


# -- scalar / operand multiplies -------------------------------------------

def multiply_scalar(x, scalar, t):
    """x * scalar mod q; scalar is a host int or u32 scalar array
    (ref: multiply_scalar_ps)."""
    s = U.u32(scalar)
    return U.mul_mod(x, s, _bq(t, x), _bq(t, x, "ratio_hi"), _bq(t, x, "ratio_lo"))


def multiply_operand(x, w, w_shoup, t):
    """x * w mod q with per-limb precomputed Shoup constants w, w_shoup of
    shape (L,) (ref: multiply_uint64operand_ps)."""
    lead = (1,) * (x.ndim - 2)
    return U.shoup_mul(x, w.reshape(lead + (-1, 1)), w_shoup.reshape(lead + (-1, 1)), _bq(t, x))


def dyadic_product(x, y, t):
    """Pointwise x * y mod q (NTT-domain ciphertext products;
    ref: dyadic_product_ps)."""
    return U.mul_mod(x, y, _bq(t, x), _bq(t, x, "ratio_hi"), _bq(t, x, "ratio_lo"))


# -- negacyclic structure ---------------------------------------------------

def negacyclic_shift(x, shift: int, t):
    """Multiply by x^shift in R = Z_q[X]/(X^n+1): rotate coefficients with
    sign wrap (ref: negacyclic_shift_ps).  `shift` is a static Python int."""
    n = x.shape[-1]
    q = _bq(t, x)
    k = shift % (2 * n)
    neg_all = k >= n
    k = k % n
    if k == 0:
        rolled = x
        mask = jnp.zeros((n,), dtype=bool)
    else:
        rolled = jnp.roll(x, k, axis=-1)
        mask = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1) < k
    out = jnp.where(mask, U.neg_mod(rolled, q), rolled)
    if neg_all:
        out = U.neg_mod(out, q)
    return out


def negacyclic_multiply_monomial(x, coeff: int, degree: int, t):
    """x * (coeff * X^degree) (ref: negacyclic_multiply_mononomials_ps)."""
    return multiply_scalar(negacyclic_shift(x, degree, t), coeff, t)


# -- base modulus reduction -------------------------------------------------

def modulo(x, t):
    """Reduce arbitrary u32 values into [0, q) per limb (ref: modulo_ps)."""
    return U.barrett_reduce_u32(x, _bq(t, x), _bq(t, x, "ratio_hi"), _bq(t, x, "ratio_lo"))


def reduce_from_limb(src, t):
    """Reduce a single-limb polynomial (..., n) into every limb of base t:
    returns (..., L, n).  Used for keyswitching digit lifting
    (ref: fgk/switch_key.cu set_accumulate)."""
    x = src[..., None, :]  # broadcast over target limb axis
    L = t["q"].shape[0]
    x = jnp.broadcast_to(x, x.shape[:-2] + (L, x.shape[-1]))
    return modulo(x, t)


def scalar_pack(moduli) -> dict:
    """Build the minimal table dict {q, ratio_hi, ratio_lo} from Modulus list
    or from a host dict — convenience for ops that need no NTT tables."""
    import numpy as np

    q = np.array([m.value for m in moduli], dtype=np.uint32)
    hi = np.array([m.ratio64_hi for m in moduli], dtype=np.uint32)
    lo = np.array([m.ratio64_lo for m in moduli], dtype=np.uint32)
    return {
        "q": jnp.asarray(q),
        "ratio_hi": jnp.asarray(hi),
        "ratio_lo": jnp.asarray(lo),
    }
