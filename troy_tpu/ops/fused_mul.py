"""Experimental fused Pallas kernel: NTT -> dyadic convolute -> INTT.

The BFV multiply's dyadic stage (evaluator.cu BEHZ steps 3-5) under XLA
materializes every transform stage to HBM.  This kernel performs, per
(batch element, limb) grid cell and base, entirely inside VMEM:

    a (2, L, n), b (2, L, n)  ->  c = a (*) b  (3, L, n)

with the six-step structure and one twist: the forward transform SKIPS the
final transpose-back and the inverse transform skips the initial transpose —
the pointwise products happen in the transposed (n2, n1) orientation, which
is orientation-independent.

Mosaic constraint workaround: no in-kernel scalar broadcasts (unsupported
"broadcast in both sublanes and lanes") — every per-limb scalar and
per-group twiddle is pre-expanded to full lane width on the XLA side and
accessed with pure slices.

Status (round 3): measured consistently SLOWER than letting XLA fuse the
six-step formulation (4.41 vs 3.48 ms per flagship batched step), so it is
NOT wired into the evaluator — kept as a bit-exact standalone kernel
(tests/utils/test_fused_mul.py) and as the starting point for a future
whole-multiply megakernel.  Bit-identical to the unfused path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import u32 as U


def _bf_fwd_laned(x, psi_l, psi_sh_l, q, two_q, N, M):
    """x: (1, N, M); psi_l: (1, N, M) lane-expanded twiddles; q/two_q:
    (1, 1, M).  Row-pair CT butterflies, slice-only access."""
    m, t = 1, N // 2
    while m < N:
        pieces = []
        for i in range(m):
            u = x[:, 2 * i * t : (2 * i + 1) * t, :]
            v = x[:, (2 * i + 1) * t : (2 * i + 2) * t, :]
            w = psi_l[:, m + i : m + i + 1, :]
            ws = psi_sh_l[:, m + i : m + i + 1, :]
            tv = U.shoup_mul_lazy(v, w, ws, q)
            pieces.append(U.cond_sub(u + tv, two_q))
            pieces.append(U.cond_sub(u + two_q - tv, two_q))
        x = pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces, axis=1)
        m *= 2
        t //= 2
    return U.cond_sub(x, q)


def _bf_inv_laned(x, ipsi_l, ipsi_sh_l, ninv, ninv_sh, q, two_q, N, M):
    m, t = N // 2, 1
    while m >= 1:
        pieces = []
        for i in range(m):
            u = x[:, 2 * i * t : (2 * i + 1) * t, :]
            v = x[:, (2 * i + 1) * t : (2 * i + 2) * t, :]
            w = ipsi_l[:, m + i : m + i + 1, :]
            ws = ipsi_sh_l[:, m + i : m + i + 1, :]
            pieces.append(U.cond_sub(u + v, two_q))
            pieces.append(U.shoup_mul_lazy(u + two_q - v, w, ws, q))
        x = pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces, axis=1)
        m //= 2
        t *= 2
    return U.shoup_mul(x, ninv, ninv_sh, q)


def _kernel(q2_ref, q1_ref, hi1_ref, lo1_ref,
            p1_ref, p1s_ref, ip1_ref, ip1s_ref,
            t_ref, ts_ref, ti_ref, tis_ref,
            p2_ref, p2s_ref, ip2_ref, ip2s_ref,
            ni1_ref, ni1s_ref, ni2_ref, ni2s_ref,
            a_ref, b_ref, o_ref, *, n1, n2):
    l = pl.program_id(1)
    sl = pl.ds(l, 1)
    q2 = q2_ref[sl, :][:, None, :]          # (1, 1, n2)
    q1 = q1_ref[sl, :][:, None, :]          # (1, 1, n1)
    hi1 = hi1_ref[sl, :][:, None, :]
    lo1 = lo1_ref[sl, :][:, None, :]
    two_q2 = q2 * U.U32(2)
    two_q1 = q1 * U.U32(2)
    p1, p1s = p1_ref[sl], p1s_ref[sl]       # (1, n1, n2)
    ip1, ip1s = ip1_ref[sl], ip1s_ref[sl]
    p2, p2s = p2_ref[sl], p2s_ref[sl]       # (1, n2, n1)
    ip2, ip2s = ip2_ref[sl], ip2s_ref[sl]
    T, Ts = t_ref[sl], ts_ref[sl]           # (1, n1, n2)
    Ti, Tis = ti_ref[sl], tis_ref[sl]
    ni1 = ni1_ref[sl, :][:, None, :]        # (1, 1, n2)
    ni1s = ni1s_ref[sl, :][:, None, :]
    ni2 = ni2_ref[sl, :][:, None, :]        # (1, 1, n1)
    ni2s = ni2s_ref[sl, :][:, None, :]

    def fwd(x):  # (1, n1, n2) -> (1, n2, n1) [transposed orientation]
        x = _bf_fwd_laned(x, p1, p1s, q2, two_q2, n1, n2)
        x = U.shoup_mul(x, T, Ts, q2)
        x = x.transpose(0, 2, 1)
        return _bf_fwd_laned(x, p2, p2s, q1, two_q1, n2, n1)

    def inv(x):  # (1, n2, n1) -> (1, n1, n2)
        x = _bf_inv_laned(x, ip2, ip2s, ni2, ni2s, q1, two_q1, n2, n1)
        x = x.transpose(0, 2, 1)
        x = U.shoup_mul(x, Ti, Tis, q2)
        return _bf_inv_laned(x, ip1, ip1s, ni1, ni1s, q2, two_q2, n1, n2)

    a0 = fwd(a_ref[0, 0])
    a1 = fwd(a_ref[0, 1])
    b0 = fwd(b_ref[0, 0])
    b1 = fwd(b_ref[0, 1])
    c0 = U.mul_mod(a0, b0, q1, hi1, lo1)
    cross = U.add_mod(U.mul_mod(a0, b1, q1, hi1, lo1),
                      U.mul_mod(a1, b0, q1, hi1, lo1), q1)
    c2 = U.mul_mod(a1, b1, q1, hi1, lo1)
    o_ref[0, 0] = inv(c0)
    o_ref[0, 1] = inv(cross)
    o_ref[0, 2] = inv(c2)


@jax.jit
def _fused(a4, b4, q, hi, lo, p1, p1s, ip1, ip1s, T, Ts, Ti, Tis, p2, p2s,
           ip2, ip2s, ni1, ni1s, ni2, ni2s):
    B, _, L, n1, n2 = a4.shape
    # XLA-side lane expansion of all scalars / 1-D twiddle rows
    ex2 = lambda v: jnp.broadcast_to(v[:, None], (L, n2))
    ex1 = lambda v: jnp.broadcast_to(v[:, None], (L, n1))
    lane12 = lambda tab: jnp.broadcast_to(tab[:, :, None], (L, n1, n2))
    lane21 = lambda tab: jnp.broadcast_to(tab[:, :, None], (L, n2, n1))
    scal2 = pl.BlockSpec((L, n2), lambda b, l: (0, 0), memory_space=pltpu.VMEM)
    scal1 = pl.BlockSpec((L, n1), lambda b, l: (0, 0), memory_space=pltpu.VMEM)
    tw12 = pl.BlockSpec((L, n1, n2), lambda b, l: (0, 0, 0),
                        memory_space=pltpu.VMEM)
    tw21 = pl.BlockSpec((L, n2, n1), lambda b, l: (0, 0, 0),
                        memory_space=pltpu.VMEM)
    inspec = pl.BlockSpec((1, 2, 1, n1, n2), lambda b, l: (b, 0, l, 0, 0),
                          memory_space=pltpu.VMEM)
    outspec = pl.BlockSpec((1, 3, 1, n1, n2), lambda b, l: (b, 0, l, 0, 0),
                           memory_space=pltpu.VMEM)
    kern = functools.partial(_kernel, n1=n1, n2=n2)
    out = pl.pallas_call(
        kern,
        grid=(B, L),
        in_specs=[scal2, scal1, scal1, scal1,
                  tw12, tw12, tw12, tw12,
                  tw12, tw12, tw12, tw12,
                  tw21, tw21, tw21, tw21,
                  scal2, scal2, scal1, scal1,
                  inspec, inspec],
        out_specs=outspec,
        out_shape=jax.ShapeDtypeStruct((B, 3, L, n1, n2), jnp.uint32),
        interpret=jax.default_backend() == "cpu",
    )(ex2(q), ex1(q), ex1(hi), ex1(lo),
      lane12(p1), lane12(p1s), lane12(ip1), lane12(ip1s),
      T, Ts, Ti, Tis,
      lane21(p2), lane21(p2s), lane21(ip2), lane21(ip2s),
      ex2(ni1), ex2(ni1s), ex1(ni2), ex1(ni2s), a4, b4)
    return out


def fused_negacyclic_multiply(a: jnp.ndarray, b: jnp.ndarray, t: dict) -> jnp.ndarray:
    """a, b: (..., 2, L, n) coeff domain -> (..., 3, L, n) coeff domain
    (the dyadic stage of a BFV multiply for one base, fully fused)."""
    lead = a.shape[:-3]
    L, n = a.shape[-2], a.shape[-1]
    log_n = n.bit_length() - 1
    n1 = 1 << (log_n // 2)
    n2 = n // n1
    import numpy as _np

    B = int(_np.prod(lead)) if lead else 1
    a4 = a.reshape(B, 2, L, n1, n2)
    b4 = b.reshape(B, 2, L, n1, n2)
    out = _fused(a4, b4, t["q"], t["ratio_hi"], t["ratio_lo"],
                 t["ss1_psi_br"], t["ss1_psi_br_shoup"],
                 t["ss1_inv_psi_br"], t["ss1_inv_psi_br_shoup"],
                 t["ss_T"], t["ss_T_shoup"], t["ss_Ti"], t["ss_Ti_shoup"],
                 t["ss2_psi_br"], t["ss2_psi_br_shoup"],
                 t["ss2_inv_psi_br"], t["ss2_inv_psi_br_shoup"],
                 t["ss1_n_inv"], t["ss1_n_inv_shoup"],
                 t["ss2_n_inv"], t["ss2_n_inv_shoup"])
    return out.reshape(lead + (3, L, n))
