"""NTT-domain ciphertext polynomial convolution.

TPU-native rebuild of reference src/fgk/dyadic_convolute.cu: given two
ciphertexts with poly counts s1, s2 in NTT form, the product ciphertext has
s1 + s2 - 1 polys with result[k] = sum_{i+j=k} op1_i * op2_j (pointwise mod
q).  Sizes are trace-time constants (2 or 3 in practice) so the double loop
unrolls; XLA fuses the mul/add chains.
"""

from __future__ import annotations

import jax.numpy as jnp

from .jitu import safe_stack
from . import u32 as U, poly as P


def dyadic_convolute(a: jnp.ndarray, b: jnp.ndarray, t: dict) -> jnp.ndarray:
    """a: (..., s1, L, n), b: (..., s2, L, n) NTT form -> (..., s1+s2-1, L, n).
    The poly-count axis is -3 so arbitrary leading batch axes broadcast."""
    s1, s2 = a.shape[-3], b.shape[-3]
    q = t["q"][:, None]
    out = [None] * (s1 + s2 - 1)
    for i in range(s1):
        for j in range(s2):
            prod = P.dyadic_product(a[..., i, :, :], b[..., j, :, :], t)
            k = i + j
            out[k] = prod if out[k] is None else U.add_mod(out[k], prod, q)
    return safe_stack(out, axis=-3)


def dyadic_square(a: jnp.ndarray, t: dict) -> jnp.ndarray:
    """Specialized square of a 2-poly ciphertext: 3 outputs from 2 polys
    (ref: dyadic_convolute.cu dyadic_square)."""
    q = t["q"][:, None]
    a0 = a[..., 0, :, :]
    a1 = a[..., 1, :, :]
    c0 = P.dyadic_product(a0, a0, t)
    cross = P.dyadic_product(a0, a1, t)
    c1 = U.add_mod(cross, cross, q)
    c2 = P.dyadic_product(a1, a1, t)
    return safe_stack([c0, c1, c2], axis=-3)


def dyadic_broadcast_product(a: jnp.ndarray, plain: jnp.ndarray, t: dict) -> jnp.ndarray:
    """Multiply every ct poly by one NTT-form plaintext poly
    (ref: dyadic_convolute.cu broadcast product, used by multiply_plain)."""
    return P.dyadic_product(a, plain[None], t)


def dyadic_broadcast_product_accumulate(
    a: jnp.ndarray, plain: jnp.ndarray, acc: jnp.ndarray, t: dict
) -> jnp.ndarray:
    """acc += a * plain (ref: dyadic_broadcast_product_accumulate, the
    matmul inner loop primitive)."""
    q = t["q"][:, None]
    return U.add_mod(acc, P.dyadic_product(a, plain[None], t), q)
