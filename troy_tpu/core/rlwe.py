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
from ..utils.random import (RandomGenerator, uniform_from_seed,
                            uniform_from_keys, ternary_from_keys,
                            cbd_from_keys, fold_in_keys, _uniform_from_key)


def _noise(cd: ContextData, prng: RandomGenerator, qtab, shape_n):
    """CBD noise lifted to limbs, coeff domain; BGV scales by t
    (ref: rlwe.cu noise sampling)."""
    e = prng.sample_cbd(shape_n, qtab)
    if cd.parms.scheme == SchemeType.BGV:
        e = R.multiply_scalar(e, cd.parms.plain_modulus.value, qtab)
    return e


def _noise_from_keys(cd: ContextData, keys, qtab, shape_n):
    """Traceable twin of _noise for the fused sampling+combine kernels."""
    e = cbd_from_keys(keys, shape_n, qtab)
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
    if prng.mode == "threefry":
        # ONE fused kernel: PRF key derivation + expansion + sampling +
        # combine all jitted (eager per-sampler/fold_in dispatch was ~95% of
        # host encrypt latency).  Counter order matches the eager path: a
        # (skipped when seeded), then e.
        import jax
        import numpy as _np

        ka, kb = prng.base_keys
        if seed is not None:
            c0 = prng.reserve_counters(1)
            fn = _jit(cd, f"rlwe_sym_fs{int(ntt_form)}", lambda: (
                lambda s, sd, a, b, c: _symmetric_combine(
                    cd, s, _uniform_from_key(jax.random.key(sd), (L, n), qtab),
                    _noise_from_keys(cd, fold_in_keys((a, b), c), qtab, (n,)),
                    ntt_form)))
            return fn(sk_data, _np.uint64(seed), ka, kb, _np.uint32(c0))
        c0 = prng.reserve_counters(2)

        def _body(s, a, b, c):
            au = uniform_from_keys(fold_in_keys((a, b), c), (L, n), qtab)
            e = _noise_from_keys(cd, fold_in_keys((a, b), c + 1), qtab, (n,))
            return _symmetric_combine(cd, s, au, e, ntt_form)

        fn = _jit(cd, f"rlwe_sym_f{int(ntt_form)}", lambda: _body)
        return fn(sk_data, ka, kb, _np.uint32(c0))
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
    if prng.mode == "threefry":
        # fused key-derivation+sampling+combine (see encrypt_zero_symmetric);
        # counter order matches the eager path: u, e0, e1
        import numpy as _np

        ka, kb = prng.base_keys
        c0 = prng.reserve_counters(3)

        def _body(pk, a, b, c):
            u = ternary_from_keys(fold_in_keys((a, b), c), (n,), qtab)
            e0 = _noise_from_keys(cd, fold_in_keys((a, b), c + 1), qtab, (n,))
            e1 = _noise_from_keys(cd, fold_in_keys((a, b), c + 2), qtab, (n,))
            return _asymmetric_combine(cd, pk, u, e0, e1, ntt_form)

        fn = _jit(cd, f"rlwe_asym_f{int(ntt_form)}", lambda: _body)
        return fn(pk_data, ka, kb, _np.uint32(c0))
    u = prng.sample_ternary((n,), qtab)
    e0 = _noise(cd, prng, qtab, (n,))
    e1 = _noise(cd, prng, qtab, (n,))
    fn = _jit(cd, f"rlwe_asym{int(ntt_form)}", lambda: (
        lambda pk, uu, a, b: _asymmetric_combine(cd, pk, uu, a, b, ntt_form)))
    return fn(pk_data, u, e0, e1)
