"""RLWE symmetric/asymmetric encryption cores.

TPU-native rebuild of reference src/utils/rlwe.{h,cu}:
  symmetric : c = (-(a*s + e) [+ m], a), a from PRNG (optionally seed-only)
  asymmetric: c = (pk0*u + e0 [+ m], pk1*u + e1), u ternary, e CBD

Scheme conventions (ref: ciphertext.h notes): BFV ciphertexts live in the
coefficient domain, CKKS/BGV in the NTT domain; BGV noise is scaled by t.
All functions return raw (2, [2,] L, n) arrays at the given context level
(wide contexts carry the extra u32-pair word axis, ops/rp.py); the Encryptor
wraps them into Ciphertext objects.
"""

from __future__ import annotations

import jax.numpy as jnp

from .params import SchemeType
from .context import ContextData
from ..ops import rp as R
from ..ops.jitu import safe_stack
from ..utils.random import RandomGenerator, uniform_from_seed


def _noise(cd: ContextData, prng: RandomGenerator, qtab, shape_n):
    """CBD noise lifted to limbs, coeff domain; BGV scales by t
    (ref: rlwe.cu noise sampling)."""
    e = prng.sample_cbd(shape_n, qtab)
    if cd.parms.scheme == SchemeType.BGV:
        e = R.multiply_scalar(e, cd.parms.plain_modulus.value, qtab)
    return e


def _jit(cd: ContextData, name: str, builder):
    """Per-level compiled-kernel cache shared with the Evaluator
    (ContextData._jit_ops)."""
    import jax

    cache = getattr(cd, "_jit_ops", None)
    if cache is None:
        cache = {}
        cd._jit_ops = cache
    if name not in cache:
        cache[name] = jax.jit(builder())
    return cache[name]


def _symmetric_combine(cd: ContextData, sk_data, a_ntt, e, ntt_form: bool):
    """Pure traceable c = (-(a*s + e), a) assembly (jitted per level/form)."""
    qtab = cd.qtab()
    L = cd.coeff_modulus_size
    s = sk_data[..., :L, :]
    as_ntt = R.dyadic_product(a_ntt, s, qtab)
    if ntt_form:
        c0 = R.negate(R.add(as_ntt, R.ntt_forward(e, qtab), qtab), qtab)
        c1 = a_ntt
    else:
        c0 = R.negate(R.add(R.ntt_inverse(as_ntt, qtab), e, qtab), qtab)
        c1 = R.ntt_inverse(a_ntt, qtab)
    return safe_stack([c0, c1])


def _asymmetric_combine(cd: ContextData, pk_data, u_coeff, e0, e1,
                        ntt_form: bool):
    """Pure traceable c = (pk0*u + e0, pk1*u + e1) assembly."""
    qtab = cd.qtab()
    L = cd.coeff_modulus_size
    pk = pk_data[..., :L, :]
    u_ntt = R.ntt_forward(u_coeff, qtab)
    c0_ntt = R.dyadic_product(pk[0], u_ntt, qtab)
    c1_ntt = R.dyadic_product(pk[1], u_ntt, qtab)
    if ntt_form:
        c0 = R.add(c0_ntt, R.ntt_forward(e0, qtab), qtab)
        c1 = R.add(c1_ntt, R.ntt_forward(e1, qtab), qtab)
    else:
        c0 = R.add(R.ntt_inverse(c0_ntt, qtab), e0, qtab)
        c1 = R.add(R.ntt_inverse(c1_ntt, qtab), e1, qtab)
    return safe_stack([c0, c1])


def encrypt_zero_symmetric(
    cd: ContextData,
    sk_data: jnp.ndarray,
    prng: RandomGenerator,
    ntt_form: bool,
    seed: int | None = None,
) -> jnp.ndarray:
    """(2, [2,] L, n) encryption of zero under s (ref: rlwe.h:7 symmetric).

    If `seed` is given, c1 is regenerated deterministically from it
    (compressed-ciphertext contract, ciphertext.h:255).
    """
    qtab = cd.qtab()
    L = cd.coeff_modulus_size
    n = cd.parms.poly_modulus_degree
    if seed is not None:
        a_ntt = uniform_from_seed(seed, (L, n), qtab)
    else:
        a_ntt = prng.sample_uniform((L, n), qtab)
    e = _noise(cd, prng, qtab, (n,))
    fn = _jit(cd, f"rlwe_sym{int(ntt_form)}", lambda: (
        lambda s, a, ee: _symmetric_combine(cd, s, a, ee, ntt_form)))
    return fn(sk_data, a_ntt, e)


def encrypt_zero_asymmetric(
    cd: ContextData,
    pk_data: jnp.ndarray,
    prng: RandomGenerator,
    ntt_form: bool,
) -> jnp.ndarray:
    """(2, [2,] L, n) encryption of zero under pk (ref: rlwe.h:45 asymmetric).
    pk_data: (2, [2,] L_key, n) NTT form — sliced to this level's limbs."""
    qtab = cd.qtab()
    n = cd.parms.poly_modulus_degree
    u = prng.sample_ternary((n,), qtab)
    e0 = _noise(cd, prng, qtab, (n,))
    e1 = _noise(cd, prng, qtab, (n,))
    fn = _jit(cd, f"rlwe_asym{int(ntt_form)}", lambda: (
        lambda pk, uu, a, b: _asymmetric_combine(cd, pk, uu, a, b, ntt_form)))
    return fn(pk_data, u, e0, e1)
