"""Pallas TPU kernel: fully-fused negacyclic NTT.

The XLA six-step path (ops/ntt.py) materializes the polynomial to HBM after
every butterfly stage (~log n round trips).  This kernel keeps the whole
(L, n1, n2) block resident in VMEM across ALL stages — one HBM read + one
HBM write per transform — with the same six-step structure:

  stage A: radix-2 butterflies on the per-limb flat view, pair stride >= n2
           (full lanes at every stage),
  twiddle: elementwise T (stage-2 twist pre-cancelled),
  stage B: transpose in VMEM, radix-2 on the flat transposed view, transpose
           back.

Grid: one program per batch element; each program transforms all L limbs.
Bit-identical to ops/ntt.py (same tables, same scrambled output order).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import u32 as U


def _row_butterflies_forward(x, psi, psi_sh, q3, two_q, L, N, M):
    """x: (L, N, M) u32; CT butterflies pairing blocks of rows (axis -2) —
    reshape-free (Mosaic cannot relayout cross-lane reshapes), fully
    unrolled: row slices + one concatenate per stage.  psi: (L, N)."""
    L = x.shape[0]
    m, t = 1, N // 2
    while m < N:
        pieces = []
        for i in range(m):
            u = x[:, 2 * i * t : (2 * i + 1) * t, :]
            v = x[:, (2 * i + 1) * t : (2 * i + 2) * t, :]
            # lane-only broadcast first (Mosaic lacks 2D scalar broadcasts)
            w = jnp.broadcast_to(psi[:, m + i][:, None, None], (L, 1, M))
            ws = jnp.broadcast_to(psi_sh[:, m + i][:, None, None], (L, 1, M))
            tv = U.shoup_mul_lazy(v, w, ws, q3)
            pieces.append(U.cond_sub(u + tv, two_q))
            pieces.append(U.cond_sub(u + two_q - tv, two_q))
        x = pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces, axis=1)
        m *= 2
        t //= 2
    return U.cond_sub(x, q3)


def _row_butterflies_inverse(x, ipsi, ipsi_sh, n_inv, n_inv_sh, q3, two_q,
                             L, N, M):
    L = x.shape[0]
    m, t = N // 2, 1
    while m >= 1:
        pieces = []
        for i in range(m):
            u = x[:, 2 * i * t : (2 * i + 1) * t, :]
            v = x[:, (2 * i + 1) * t : (2 * i + 2) * t, :]
            w = jnp.broadcast_to(ipsi[:, m + i][:, None, None], (L, 1, M))
            ws = jnp.broadcast_to(ipsi_sh[:, m + i][:, None, None], (L, 1, M))
            pieces.append(U.cond_sub(u + v, two_q))
            pieces.append(U.shoup_mul_lazy(u + two_q - v, w, ws, q3))
        x = pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces, axis=1)
        m //= 2
        t *= 2
    ninv = n_inv if n_inv.ndim == 3 else n_inv[:, :, None]
    ninv_sh = n_inv_sh if n_inv_sh.ndim == 3 else n_inv_sh[:, :, None]
    return U.shoup_mul(x, ninv, ninv_sh, q3)


def _fwd_kernel(q_ref, p1_ref, p1s_ref, t_ref, ts_ref, p2_ref, p2s_ref,
                x_ref, o_ref, *, n1, n2):
    L = q_ref.shape[0]
    q3 = q_ref[...][:, :, None]           # (L, 1, 1)
    two_q = q3 * U.U32(2)
    x = x_ref[0]                          # (L, n1, n2), no reshapes in-kernel
    x = _row_butterflies_forward(x, p1_ref[...], p1s_ref[...], q3, two_q,
                                 L, n1, n2)
    x = U.shoup_mul(x, t_ref[...], ts_ref[...], q3)
    x = x.transpose(0, 2, 1)
    x = _row_butterflies_forward(x, p2_ref[...], p2s_ref[...], q3, two_q,
                                 L, n2, n1)
    o_ref[...] = x.transpose(0, 2, 1)[None]


def _inv_kernel(q_ref, p1_ref, p1s_ref, ni1_ref, ni1s_ref, t_ref, ts_ref,
                p2_ref, p2s_ref, ni2_ref, ni2s_ref, x_ref, o_ref, *, n1, n2):
    """NOTE: diverges in per-op work from the XLA sixstep inverse, which
    folds both sub-INTT n^-1 scalings into the ss_Tif twiddle and skips the
    two full Shoup scale passes this kernel still runs (it consumes the
    unfolded ss_Ti + per-sub n_inv tables).  Outputs are bit-identical."""
    L = q_ref.shape[0]
    q3 = q_ref[...][:, :, None]
    two_q = q3 * U.U32(2)
    x = x_ref[0]
    x = x.transpose(0, 2, 1)
    x = _row_butterflies_inverse(x, p2_ref[...], p2s_ref[...],
                                 ni2_ref[...], ni2s_ref[...], q3, two_q,
                                 L, n2, n1)
    x = x.transpose(0, 2, 1)
    x = U.shoup_mul(x, t_ref[...], ts_ref[...], q3)
    x = _row_butterflies_inverse(x, p1_ref[...], p1s_ref[...],
                                 ni1_ref[...], ni1s_ref[...], q3, two_q,
                                 L, n1, n2)
    o_ref[...] = x[None]


# ---------------------------------------------------------------------------
# MXU variant: the two sub-transforms are int8-limb matmuls on the MXU with
# recombination kept in VMEM (the pure-XLA mxu backend materializes the
# partial-product tensors to HBM per transform; here they never leave the
# kernel).  Tables from MxuNTTTables — round-4 balanced base-256 scheme:
# 4 signed digit planes, 16 plane-pair dots, and the pairwise-folded
# 4-Shoup recombination (see ops/ntt_mxu.py module docstring).
# ---------------------------------------------------------------------------

from .ntt_mxu import (N_LIMBS, N_DIAGS, PAIR_FOLD_MAX_K, _HALF,
                      split_balanced)

def _use_interpret() -> bool:
    """Interpret mode when the computation will land on CPU: either the
    whole platform is CPU, or an enclosing jax.default_device(cpu) context
    is routing eager/table-setup calls there (client-side setup under the
    remote-TPU platform, see bench.py / stage_bench.py)."""
    if jax.default_backend() == "cpu":
        return True
    d = jax.config.jax_default_device
    return d is not None and getattr(d, "platform", None) == "cpu"



def _kernel_recombine(Pfn, pw16, pws16, corr16, pw8, pws8, corr8, q,
                      contraction):
    """In-kernel mirror of ntt_mxu.recombine_planes: Pfn(i, j) yields the
    int32 dot of plane pair (i, j) lazily; scalars come from SMEM."""
    diags = []
    for s in range(N_DIAGS):
        acc = None
        for i in range(max(0, s - N_LIMBS + 1), min(N_LIMBS, s + 1)):
            term = Pfn(i, s - i)
            acc = term if acc is None else acc + term
        diags.append(acc)
    if contraction <= PAIR_FOLD_MAX_K:
        groups = [diags[0] + (diags[1] << 8), diags[2] + (diags[3] << 8),
                  diags[4] + (diags[5] << 8), diags[6]]
        w, ws, corr = pw16, pws16, corr16
    else:
        groups = diags
        w, ws, corr = pw8, pws8, corr8
    two_q = q * U.U32(2)
    acc = None
    for t, g in enumerate(groups):
        gu = g.astype(jnp.uint32) + _HALF
        contrib = U.shoup_mul_lazy(gu, w[t], ws[t], q)  # [0, 2q)
        acc = contrib if acc is None else U.cond_sub(acc + contrib, two_q)
    return U.sub_mod(U.cond_sub(acc, q), corr, q)


def _mxu_matmul_left(Wl, x, sc, q):
    """sum_b W[a,b] x[b,c] mod q for one limb: W digit planes
    (N_LIMBS, a, b) int8, x (b, c) u32 -> (a, c) u32, VMEM-resident."""
    xl = split_balanced(x, q)

    def P(i, j):
        return jax.lax.dot_general(Wl[i], xl[j], (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)

    return _kernel_recombine(P, *sc, q, contraction=x.shape[0])


def _mxu_matmul_right(x, Wl, sc, q):
    xl = split_balanced(x, q)

    def P(i, j):
        return jax.lax.dot_general(xl[j], Wl[i], (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)

    return _kernel_recombine(P, *sc, q, contraction=x.shape[1])


def _limb_scalars(refs, l):
    (pw16_ref, pws16_ref, c16_ref, pw8_ref, pws8_ref, c8_ref) = refs
    return ([pw16_ref[l, t] for t in range(N_LIMBS)],
            [pws16_ref[l, t] for t in range(N_LIMBS)],
            c16_ref[l, 0],
            [pw8_ref[l, s] for s in range(N_DIAGS)],
            [pws8_ref[l, s] for s in range(N_DIAGS)],
            c8_ref[l, 0])


def _limb_folded(refs, l):
    """Recombination scalars with the mid-transform twiddle FOLDED in: the
    pairwise-fold weights become the elementwise T * 2^(16t) mod q planes
    and the shift excess becomes T * corr16 — one full Shoup pass per
    transform disappears.  (pw8/corr8 fallback unused: the folded tables
    are only built when both contractions are <= PAIR_FOLD_MAX_K.)"""
    (t16_ref, t16s_ref, tc_ref) = refs
    return ([t16_ref[t, l] for t in range(N_LIMBS)],
            [t16s_ref[t, l] for t in range(N_LIMBS)],
            tc_ref[l], None, None, None)


def _fwd_kernel_mxu(q_ref, w1_ref, w2_ref, t16_ref, t16s_ref, tc_ref,
                    pw16_ref, pws16_ref, c16_ref, pw8_ref, pws8_ref, c8_ref,
                    x_ref, o_ref, *, n1, n2, L):
    folded = n1 <= PAIR_FOLD_MAX_K and n2 <= PAIR_FOLD_MAX_K
    outs = []
    for l in range(L):
        q = q_ref[l, 0]
        sc = _limb_scalars((pw16_ref, pws16_ref, c16_ref,
                            pw8_ref, pws8_ref, c8_ref), l)
        x = x_ref[0, l]                                  # (n1, n2)
        w1 = [w1_ref[i, l] for i in range(N_LIMBS)]
        if folded:
            sct = _limb_folded((t16_ref, t16s_ref, tc_ref), l)
            a = _mxu_matmul_left(w1, x, sct, q)          # stage A + twiddle
        else:
            a = U.shoup_mul(_mxu_matmul_left(w1, x, sc, q),
                            t16_ref[0, l], t16s_ref[0, l], q)
        w2 = [w2_ref[i, l] for i in range(N_LIMBS)]
        outs.append(_mxu_matmul_right(a, w2, sc, q))
    o_ref[...] = jnp.stack(outs)[None]


def _inv_kernel_mxu(q_ref, w1_ref, w2_ref, t16_ref, t16s_ref, tc_ref,
                    pw16_ref, pws16_ref, c16_ref, pw8_ref, pws8_ref, c8_ref,
                    x_ref, o_ref, *, n1, n2, L):
    folded = n1 <= PAIR_FOLD_MAX_K and n2 <= PAIR_FOLD_MAX_K
    outs = []
    for l in range(L):
        q = q_ref[l, 0]
        sc = _limb_scalars((pw16_ref, pws16_ref, c16_ref,
                            pw8_ref, pws8_ref, c8_ref), l)
        x = x_ref[0, l]
        w2 = [w2_ref[i, l] for i in range(N_LIMBS)]
        if folded:
            sct = _limb_folded((t16_ref, t16s_ref, tc_ref), l)
            c = _mxu_matmul_right(x, w2, sct, q)         # stage + Ti twiddle
        else:
            c = U.shoup_mul(_mxu_matmul_right(x, w2, sc, q),
                            t16_ref[0, l], t16s_ref[0, l], q)
        w1 = [w1_ref[i, l] for i in range(N_LIMBS)]
        outs.append(_mxu_matmul_left(w1, c, sc, q))
    o_ref[...] = jnp.stack(outs)[None]


def _mxu_specs(L, n1, n2, planes):
    w1 = pl.BlockSpec((N_LIMBS, L, n1, n1), lambda b: (0, 0, 0, 0),
                      memory_space=pltpu.VMEM)
    w2 = pl.BlockSpec((N_LIMBS, L, n2, n2), lambda b: (0, 0, 0, 0),
                      memory_space=pltpu.VMEM)
    tw4 = pl.BlockSpec((planes, L, n1, n2), lambda b: (0, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    tw = pl.BlockSpec((L, n1, n2), lambda b: (0, 0, 0), memory_space=pltpu.VMEM)
    pw16 = pl.BlockSpec((L, N_LIMBS), lambda b: (0, 0),
                        memory_space=pltpu.SMEM)
    pw8 = pl.BlockSpec((L, N_DIAGS), lambda b: (0, 0),
                       memory_space=pltpu.SMEM)
    scal = pl.BlockSpec((L, 1), lambda b: (0, 0), memory_space=pltpu.SMEM)
    xspec = pl.BlockSpec((1, L, n1, n2), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    return [scal, w1, w2, tw4, tw4, tw, pw16, pw16, scal, pw8, pw8, scal,
            xspec], xspec


@functools.partial(jax.jit, static_argnames=("inverse",))
def _ntt_pallas_mxu(x3, q, W1, W2, T16, T16s, Tc, pw16, pws16, c16,
                    pw8, pws8, c8, inverse: bool):
    B, L, n = x3.shape
    n1 = W1.shape[-1]
    n2 = n // n1
    in_specs, out_spec = _mxu_specs(L, n1, n2, T16.shape[0])
    kern = functools.partial(
        _inv_kernel_mxu if inverse else _fwd_kernel_mxu, n1=n1, n2=n2, L=L)
    interpret = _use_interpret()
    out = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, L, n1, n2), jnp.uint32),
        interpret=interpret,
    )(q.reshape(-1, 1), W1, W2, T16, T16s, Tc, pw16, pws16,
      c16.reshape(-1, 1), pw8, pws8, c8.reshape(-1, 1),
      x3.reshape(B, L, n1, n2))
    return out.reshape(B, L, n)


def ntt_forward_pallas_mxu(x: jnp.ndarray, t: dict, prefix: str = "mxu_") -> jnp.ndarray:
    lead = x.shape[:-2]
    L, n = x.shape[-2], x.shape[-1]
    import numpy as _np

    B = int(_np.prod(lead)) if lead else 1
    p = prefix
    out = _ntt_pallas_mxu(x.reshape(B, L, n), t["q"], t[p + "W1"], t[p + "W2"],
                          t[p + "T16"], t[p + "T16_shoup"], t[p + "Tcorr"],
                          t[p + "pow16"],
                          t[p + "pow16_shoup"], t[p + "corr16"],
                          t[p + "pow8"], t[p + "pow8_shoup"], t[p + "corr8"],
                          inverse=False)
    return out.reshape(x.shape)


def ntt_inverse_pallas_mxu(x: jnp.ndarray, t: dict, prefix: str = "mxu_") -> jnp.ndarray:
    lead = x.shape[:-2]
    L, n = x.shape[-2], x.shape[-1]
    import numpy as _np

    B = int(_np.prod(lead)) if lead else 1
    p = prefix
    out = _ntt_pallas_mxu(x.reshape(B, L, n), t["q"], t[p + "W1i"], t[p + "W2i"],
                          t[p + "Ti16"], t[p + "Ti16_shoup"], t[p + "Ticorr"],
                          t[p + "pow16"],
                          t[p + "pow16_shoup"], t[p + "corr16"],
                          t[p + "pow8"], t[p + "pow8_shoup"], t[p + "corr8"],
                          inverse=True)
    return out.reshape(x.shape)


def _specs(L, n, n1, n2, inverse):
    full = lambda b: tuple([0] * 2)
    tab1 = pl.BlockSpec((L, n1), lambda b: (0, 0), memory_space=pltpu.VMEM)
    tab2 = pl.BlockSpec((L, n2), lambda b: (0, 0), memory_space=pltpu.VMEM)
    tw = pl.BlockSpec((L, n1, n2), lambda b: (0, 0, 0), memory_space=pltpu.VMEM)
    # (L, 1) per-limb scalars live in VMEM: Mosaic only loads true scalars
    # from SMEM, and these broadcast against (L, m, K) tiles anyway
    scal = pl.BlockSpec((L, 1), lambda b: (0, 0), memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec((1, L, n1, n2), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    if not inverse:
        return [scal, tab1, tab1, tw, tw, tab2, tab2, xspec], xspec
    return [scal, tab1, tab1, scal, scal, tw, tw, tab2, tab2, scal, scal,
            xspec], xspec


@functools.partial(jax.jit, static_argnames=("inverse",))
def _ntt_pallas(x3, q, p1, p1s, ni1, ni1s, T, Ts, p2, p2s, ni2, ni2s,
                inverse: bool):
    B, L, n = x3.shape
    n1 = p1.shape[1]
    n2 = n // n1
    in_specs, out_spec = _specs(L, n, n1, n2, inverse)
    x3 = x3.reshape(B, L, n1, n2)
    q2 = q.reshape(-1, 1)
    ni1, ni1s = ni1.reshape(-1, 1), ni1s.reshape(-1, 1)
    ni2, ni2s = ni2.reshape(-1, 1), ni2s.reshape(-1, 1)
    if not inverse:
        kern = functools.partial(_fwd_kernel, n1=n1, n2=n2)
        args = (q2, p1, p1s, T, Ts, p2, p2s, x3)
    else:
        kern = functools.partial(_inv_kernel, n1=n1, n2=n2)
        args = (q2, p1, p1s, ni1, ni1s, T, Ts, p2, p2s, ni2, ni2s, x3)
    interpret = _use_interpret()
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, L, n1, n2), jnp.uint32),
        interpret=interpret,
    )(*args).reshape(B, L, n)


def ntt_forward_pallas(x: jnp.ndarray, t: dict) -> jnp.ndarray:
    """x: (..., L, n) u32 -> NTT, bit-identical to ops/ntt.py paths.
    Requires the sixstep (ss_*) tables in `t`."""
    lead = x.shape[:-2]
    L, n = x.shape[-2], x.shape[-1]
    import numpy as _np

    B = int(_np.prod(lead)) if lead else 1
    x3 = x.reshape(B, L, n)
    out = _ntt_pallas(
        x3, t["q"], t["ss1_psi_br"], t["ss1_psi_br_shoup"],
        t["ss1_n_inv"], t["ss1_n_inv_shoup"], t["ss_T"], t["ss_T_shoup"],
        t["ss2_psi_br"], t["ss2_psi_br_shoup"], t["ss2_n_inv"],
        t["ss2_n_inv_shoup"], inverse=False)
    return out.reshape(x.shape)


def ntt_inverse_pallas(x: jnp.ndarray, t: dict) -> jnp.ndarray:
    lead = x.shape[:-2]
    L, n = x.shape[-2], x.shape[-1]
    import numpy as _np

    B = int(_np.prod(lead)) if lead else 1
    x3 = x.reshape(B, L, n)
    out = _ntt_pallas(
        x3, t["q"], t["ss1_inv_psi_br"], t["ss1_inv_psi_br_shoup"],
        t["ss1_n_inv"], t["ss1_n_inv_shoup"], t["ss_Ti"], t["ss_Ti_shoup"],
        t["ss2_inv_psi_br"], t["ss2_inv_psi_br_shoup"], t["ss2_n_inv"],
        t["ss2_n_inv_shoup"], inverse=True)
    return out.reshape(x.shape)


# ---------------------------------------------------------------------------
# Pallas base-conversion kernel (round-4 joint MXU offload): the BEHZ
# fast_convert_array dot y[o, k] = sum_i [x_i * (Q/q_i)^-1]_{q_i} * M[o, i]
# mod p_o, with the input Shoup scaling, the int8 digit-plane split, the
# limb-axis dot_generals, and the pairwise-folded recombination ALL inside
# one VMEM-resident kernel (the XLA-level TROY_BCONV_BACKEND=mxu variant
# materializes the 16 int32 partial planes to HBM and loses ~3x; measured
# BENCH.md round 4).  Bit-identical to the VPU dot.
# ---------------------------------------------------------------------------

_BCONV_TILE = 512


def _bconv_kernel(iq_ref, ip_ref, ips_ref, oq_ref, w_ref,
                  pw16_ref, pws16_ref, c16_ref, pw8_ref, pws8_ref, c8_ref,
                  x_ref, o_ref, *, L_in):
    iq = iq_ref[...]                       # (L_in, 1)
    x = x_ref[0]                           # (L_in, T)
    tmp = U.shoup_mul(x, ip_ref[...], ips_ref[...], iq)
    xl = split_balanced(tmp, iq)
    oq = oq_ref[...]                       # (L_out, 1)

    def P(i, j):
        return jax.lax.dot_general(w_ref[i], xl[j], (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)

    sc = ([pw16_ref[...][:, t : t + 1] for t in range(N_LIMBS)],
          [pws16_ref[...][:, t : t + 1] for t in range(N_LIMBS)],
          c16_ref[...],
          [pw8_ref[...][:, s : s + 1] for s in range(N_DIAGS)],
          [pws8_ref[...][:, s : s + 1] for s in range(N_DIAGS)],
          c8_ref[...])
    o_ref[...] = _kernel_recombine(P, *sc, oq, contraction=L_in)[None]


@jax.jit
def _bconv_pallas(x3, iq, ip, ips, oq, W, pw16, pws16, c16, pw8, pws8, c8):
    B, L_in, n = x3.shape
    L_out = W.shape[1]
    T = min(_BCONV_TILE, n)
    col = lambda b, c: (b, 0, c)
    cvec = lambda r: pl.BlockSpec((r, 1), lambda b, c: (0, 0),
                                  memory_space=pltpu.VMEM)
    ctab = lambda r, k: pl.BlockSpec((r, k), lambda b, c: (0, 0),
                                     memory_space=pltpu.VMEM)
    in_specs = [
        cvec(L_in), cvec(L_in), cvec(L_in), cvec(L_out),
        pl.BlockSpec((N_LIMBS, L_out, L_in), lambda b, c: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        ctab(L_out, N_LIMBS), ctab(L_out, N_LIMBS), cvec(L_out),
        ctab(L_out, N_DIAGS), ctab(L_out, N_DIAGS), cvec(L_out),
        pl.BlockSpec((1, L_in, T), col, memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec((1, L_out, T), col, memory_space=pltpu.VMEM)
    kern = functools.partial(_bconv_kernel, L_in=L_in)
    out = pl.pallas_call(
        kern,
        grid=(B, n // T),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, L_out, n), jnp.uint32),
        interpret=_use_interpret(),
    )(iq[:, None], ip[:, None], ips[:, None], oq[:, None], W,
      pw16, pws16, c16[:, None], pw8, pws8, c8[:, None], x3)
    return out


def bconv_pallas(x, tabs: dict) -> jnp.ndarray:
    """x: (..., L_in, n) raw ibase residues -> (..., L_out, n) obase
    residues (the full fast_convert_array including the input Shoup
    scaling).  `tabs` from BaseConverter._pallas_tables()."""
    import numpy as _np

    lead = x.shape[:-2]
    L_in, n = x.shape[-2], x.shape[-1]
    B = int(_np.prod(lead)) if lead else 1
    out = _bconv_pallas(x.reshape(B, L_in, n), *tabs["args"])
    return out.reshape(lead + (out.shape[-2], n))
