"""Width-polymorphic residue-polynomial ops.

The framework supports two residue widths through ONE public API
(ref: the reference library operates on <=61-bit primes natively,
src/utils/basics.h:579; our u32 fast path restricts primes to (2^28, 2^30)):

  * fast path ("words" == 1): residues are single u32 lanes, shape
    (..., L, n); ops delegate to ops/poly.py / ops/u32.py / ops/ntt.py.
  * wide path ("words" == 2): residues are (hi, lo) u32 pairs stored in ONE
    array with the word axis at position -3, shape (..., 2, L, n); ops
    delegate to ops/u64.py / ops/ntt64.py.

Dispatch is keyed off the table pack: NTT64Tables / wide scalar packs carry
"words": 2; u32 packs carry no marker.  The word-axis-at(-3) convention makes
all *limb* indexing (x[..., lo:hi, :]) and all *poly* indexing from the front
(data[k], data[:2], jnp.stack([c0, c1])) identical across widths — only the
poly axis seen from the END differs (-3 fast, -4 wide), which these helpers
absorb.  Scheme layers (evaluator/encryptor/decryptor/keygen/rlwe) call this
module instead of the width-specific ones.
"""

from __future__ import annotations

import jax.numpy as jnp

from .jitu import pack_jit, safe_stack
from . import poly as P
from . import u32 as U
from . import u64 as W
from . import ntt as NTT
from . import ntt64 as N64
from . import dyadic as D


def words(t: dict) -> int:
    return int(t.get("words", 1))


def hi_lo(x):
    """Split a wide (..., 2, L, n) array into its (hi, lo) components."""
    return x[..., 0, :, :], x[..., 1, :, :]


def pair(h, l):
    """Assemble (hi, lo) components into the (..., 2, L, n) wide layout."""
    return safe_stack([h, l], axis=-3)


def poly_axis(t: dict) -> int:
    """Axis of the ciphertext poly index counted from the end."""
    return -3 if words(t) == 1 else -4


def _c2(t):
    """(L, 1) modulus word columns of a wide pack."""
    return t["q_hi"][:, None], t["q_lo"][:, None]


def _r4(t):
    """(L, 1) Barrett 2^128-ratio word columns of a wide pack."""
    return (t["r3"][:, None], t["r2"][:, None],
            t["r1"][:, None], t["r0"][:, None])


# ---------------------------------------------------------------------------
# elementwise modular ops
# ---------------------------------------------------------------------------

@pack_jit
def add(x, y, t):
    if words(t) == 1:
        return P.add(x, y, t)
    qh, ql = _c2(t)
    h1, l1 = hi_lo(x)
    h2, l2 = hi_lo(y)
    return pair(*W.add_mod64(h1, l1, h2, l2, qh, ql))


@pack_jit
def sub(x, y, t):
    if words(t) == 1:
        return P.sub(x, y, t)
    qh, ql = _c2(t)
    h1, l1 = hi_lo(x)
    h2, l2 = hi_lo(y)
    return pair(*W.sub_mod64(h1, l1, h2, l2, qh, ql))


@pack_jit
def negate(x, t):
    if words(t) == 1:
        return P.negate(x, t)
    qh, ql = _c2(t)
    return pair(*W.neg_mod64(*hi_lo(x), qh, ql))


@pack_jit
def dyadic_product(x, y, t):
    if words(t) == 1:
        return P.dyadic_product(x, y, t)
    h1, l1 = hi_lo(x)
    h2, l2 = hi_lo(y)
    return pair(*W.mul_mod64(h1, l1, h2, l2, *_c2(t), *_r4(t)))


@pack_jit
def multiply_scalar(x, scalar, t):
    """x * scalar mod q; scalar is a host int or u32 array < 2^31 (and below
    every modulus on the wide path, where moduli exceed 2^30)."""
    if words(t) == 1:
        return P.multiply_scalar(x, scalar, t)
    if isinstance(scalar, int) and scalar >= (1 << 31):
        raise ValueError("[rp.multiply_scalar] wide-path scalar must be < 2^31")
    s = U.u32(scalar)
    h, l = hi_lo(x)
    return pair(*W.mul_mod64(h, l, jnp.zeros_like(s), s, *_c2(t), *_r4(t)))


@pack_jit
def multiply_operand(x, w, w_shoup, t):
    """x * w mod q with per-limb Shoup constants.  Fast path: w, w_shoup of
    shape (L,); wide path: (2, L) word-stacked arrays."""
    if words(t) == 1:
        return P.multiply_operand(x, w, w_shoup, t)
    qh, ql = _c2(t)
    return pair(*W.shoup_mul64(*hi_lo(x), w[0][:, None], w[1][:, None],
                               w_shoup[0][:, None], w_shoup[1][:, None],
                               qh, ql))


@pack_jit
def modulo(x, t):
    """Reduce arbitrary residues into [0, q) per limb."""
    if words(t) == 1:
        return P.modulo(x, t)
    return pair(*W.barrett_reduce_u64(*hi_lo(x), *_c2(t), *_r4(t)))


@pack_jit
def negacyclic_shift(x, shift: int, t):
    """Multiply by X^shift in Z_q[X]/(X^n+1) (static shift)."""
    if words(t) == 1:
        return P.negacyclic_shift(x, shift, t)
    import jax

    n = x.shape[-1]
    qh, ql = _c2(t)
    k = shift % (2 * n)
    neg_all = k >= n
    k = k % n
    if k == 0:
        rolled = x
        mask = jnp.zeros((n,), dtype=bool)
    else:
        rolled = jnp.roll(x, k, axis=-1)
        mask = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1) < k
    rh, rl = hi_lo(rolled)
    nh, nl = W.neg_mod64(rh, rl, qh, ql)
    out = pair(jnp.where(mask, nh, rh), jnp.where(mask, nl, rl))
    if neg_all:
        out = pair(*W.neg_mod64(*hi_lo(out), qh, ql))
    return out


# ---------------------------------------------------------------------------
# NTT transforms
# ---------------------------------------------------------------------------

@pack_jit
def ntt_forward(x, t):
    if words(t) == 1:
        return NTT.ntt_forward(x, t)
    return pair(*N64.ntt_forward64(*hi_lo(x), t))


@pack_jit
def ntt_inverse(x, t):
    if words(t) == 1:
        return NTT.ntt_inverse(x, t)
    return pair(*N64.ntt_inverse64(*hi_lo(x), t))


def slice_tables(t: dict, lo_: int, hi_: int) -> dict:
    return NTT.slice_tables(t, lo_, hi_)


def take_tables(t: dict, idx) -> dict:
    return NTT.take_tables(t, idx)


# ---------------------------------------------------------------------------
# dyadic composites (NTT-domain ciphertext products)
# ---------------------------------------------------------------------------

@pack_jit
def dyadic_convolute(a, b, t):
    """result[k] = sum_{i+j=k} a_i * b_j pointwise (ref: fgk/dyadic_convolute.cu)."""
    if words(t) == 1:
        return D.dyadic_convolute(a, b, t)
    ax = poly_axis(t)
    s1, s2 = a.shape[ax], b.shape[ax]
    out = [None] * (s1 + s2 - 1)
    for i in range(s1):
        for j in range(s2):
            prod = dyadic_product(a[..., i, :, :, :], b[..., j, :, :, :], t)
            k = i + j
            out[k] = prod if out[k] is None else add(out[k], prod, t)
    return safe_stack(out, axis=ax)


@pack_jit
def dyadic_square(a, t):
    if words(t) == 1:
        return D.dyadic_square(a, t)
    a0 = a[..., 0, :, :, :]
    a1 = a[..., 1, :, :, :]
    c0 = dyadic_product(a0, a0, t)
    cross = dyadic_product(a0, a1, t)
    c1 = add(cross, cross, t)
    c2 = dyadic_product(a1, a1, t)
    return safe_stack([c0, c1, c2], axis=poly_axis(t))


@pack_jit
def dyadic_broadcast_product(a, plain, t):
    """Multiply every ct poly by one NTT-form plaintext poly."""
    if words(t) == 1:
        return D.dyadic_broadcast_product(a, plain, t)
    return dyadic_product(a, plain[..., None, :, :, :], t)


@pack_jit
def dyadic_broadcast_product_accumulate(a, plain, acc, t):
    if words(t) == 1:
        return D.dyadic_broadcast_product_accumulate(a, plain, acc, t)
    return add(acc, dyadic_broadcast_product(a, plain, t), t)
