"""MXU-accelerated negacyclic NTT: 4-step matmul formulation.

The radix-2 NTT (ops/ntt.py) is reshape+VPU work whose late stages leave TPU
lanes mostly idle (the pair stride shrinks below the 128-lane width).  This
module reformulates the same transform so the heavy lifting is two MXU
matmuls — the unit with ~100x the integer throughput:

  n = n1 * n2;  view the polynomial as an (n1, n2) matrix.  With the
  negacyclic twist psi^i and the cyclic root w = psi^2 folded in:

    A[k1', i2] = sum_{i1} W1[k1', i1] * x[i1, i2]        (n1 x n1 matmul)
    B[k1', i2] = A[k1', i2] * T[k1', i2]                 (elementwise twiddle)
    X[k1', k2'] = sum_{i2} B[k1', i2] * W2[i2, k2']      (n2 x n2 matmul)

  where k1 = brv(k1'), k2 = brv(k2') are baked into the constant matrices so
  the flat output order is EXACTLY ops/ntt.py's scrambled order — the two
  implementations are bit-interchangeable.

Exact modular matmul on the MXU — balanced base-256 scheme (round 4; the
round-2 scheme used 5 unsigned 7-bit limbs and a 9-diagonal Shoup
recombination, which kept the VPU recombination cost at parity with the
six-step butterflies — pallas_mxu only TIED sixstep, BENCH.md):

  * operands in [0, q), q < 2^30, split into FOUR balanced base-256 digits
    d_p in [-128, 127] (top digit in [0, 64]) stored as int8 planes;
  * one dot_general contracts all 4x4 plane pairs with int32 accumulation;
    |partial| <= 128^2 * K for contraction length K — exact for K <= 2^17;
  * the 7 anti-diagonals P[s] (weight 2^(8s)) are folded PAIRWISE in plain
    int32 — C[t] = P[2t] + 256*P[2t+1], weight 2^(16t) — which is exact for
    K <= 128 (|C| <= 0.76 * 2^31 by the per-diagonal worst case), leaving
    only FOUR modular Shoup multiplies per element instead of nine;
  * C[t] may be negative: a UNIFORM +2^31 shift (u32 wrapping add — exact
    because C + 2^31 lands in [0, 2^32)) makes every group nonnegative
    before its Shoup multiply, and the known excess sum_t 2^31 * w_t mod q
    is removed by ONE precomputed constant subtraction at the end.

For contraction lengths > 128 (n1 or n2 > 128) the pairwise fold would
overflow int32 and the recombination falls back to the 7 single diagonals
(weight 2^(8s), still fewer than the old 9; exact for K <= 2^15).

(ref: the roofline redesign of src/fgk/ntt_grouped.cu — SURVEY.md §7 step 2;
BENCH.md roofline: NTT butterflies 47% of flagship multiplies.)
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import u32 as U
from ..utils import numth
from ..core.modulus import Modulus

LIMB_BITS = 8
N_LIMBS = 4  # balanced base-256 digits covering [0, 2^30)
N_DIAGS = 2 * N_LIMBS - 1
PAIR_FOLD_MAX_K = 128  # max contraction length for the pairwise int32 fold


def _balance_const(m: np.ndarray) -> np.ndarray:
    """(...,) u32 host matrix (entries < 2^30) -> (4, ...) int8 balanced
    base-256 digit planes."""
    v = m.astype(np.int64)
    out = np.empty((N_LIMBS,) + m.shape, dtype=np.int8)
    for p in range(N_LIMBS):
        d = v & 0xFF
        carry = d >= 128
        d = d - (carry << 8)
        v = (v >> 8) + carry
        out[p] = d.astype(np.int8)
    assert (v == 0).all()
    return out


def split_balanced(x: jnp.ndarray, q) -> jnp.ndarray:
    """(...,) u32 device array in [0, 2q) -> (4, ...) int8 balanced digit
    planes of x mod-reduced to [0, q).  q broadcastable to x."""
    x = U.cond_sub(x, q)
    v = x.astype(jnp.int32)
    b0 = v & 255
    b1 = (v >> 8) & 255
    b2 = (v >> 16) & 255
    b3 = v >> 24
    c0 = (b0 >= 128).astype(jnp.int32)
    d0 = b0 - (c0 << 8)
    b1 = b1 + c0
    c1 = (b1 >= 128).astype(jnp.int32)
    d1 = b1 - (c1 << 8)
    b2 = b2 + c1
    c2 = (b2 >= 128).astype(jnp.int32)
    d2 = b2 - (c2 << 8)
    d3 = b3 + c2  # <= 64 for x < 2^30
    return jnp.stack([p.astype(jnp.int8) for p in (d0, d1, d2, d3)])


_HALF = np.uint32(1 << 31)


def recombine_planes(P: jnp.ndarray, pow16, pow16_shoup, pow8, pow8_shoup,
                     corr16, corr8, q, contraction: int) -> jnp.ndarray:
    """P: (i, j, ...) int32 plane-pair partials (i, j = digit indices of the
    two operands) -> (sum_ij P * 2^(8(i+j))) mod q, elementwise over the
    trailing shape.  pow16/pow8: per-limb lists of 2^(16t) / 2^(8s) mod q
    (with Shoup words) broadcastable to the output; corr16/corr8: the
    per-limb constant (sum_t 2^31 * w_t) mod q removed after the uniform
    +2^31 shift.  `contraction` selects the pairwise fold (exact for <= 128)
    or the per-diagonal fallback."""
    diags = []
    for s in range(N_DIAGS):
        acc = None
        for i in range(max(0, s - N_LIMBS + 1), min(N_LIMBS, s + 1)):
            term = P[i, s - i]
            acc = term if acc is None else acc + term
        diags.append(acc)
    if contraction <= PAIR_FOLD_MAX_K:
        groups = [diags[0] + (diags[1] << 8), diags[2] + (diags[3] << 8),
                  diags[4] + (diags[5] << 8), diags[6]]
        weights, wshoups, corr = pow16, pow16_shoup, corr16
    else:
        groups = diags
        weights, wshoups, corr = pow8, pow8_shoup, corr8
    two_q = q * U.U32(2)
    acc = None
    for t, g in enumerate(groups):
        # u32 wrapping view of g + 2^31 — exact since g + 2^31 in [0, 2^32)
        gu = g.astype(jnp.uint32) + _HALF
        contrib = U.shoup_mul_lazy(gu, weights[t], wshoups[t], q)  # [0, 2q)
        if acc is None:
            acc = contrib
        else:
            acc = U.cond_sub(acc + contrib, two_q)
    return U.sub_mod(U.cond_sub(acc, q), corr, q)


def _pow_tables(moduli: list[Modulus]):
    """Per-limb recombination constants: 2^(16t) and 2^(8s) mod q with Shoup
    words, plus the shift corrections corr = (sum_t 2^31 * w_t) mod q for
    each weight set."""
    L = len(moduli)
    pow16 = np.zeros((L, N_LIMBS), dtype=np.uint32)
    pow16_sh = np.zeros((L, N_LIMBS), dtype=np.uint32)
    pow8 = np.zeros((L, N_DIAGS), dtype=np.uint32)
    pow8_sh = np.zeros((L, N_DIAGS), dtype=np.uint32)
    corr16 = np.zeros((L,), dtype=np.uint32)
    corr8 = np.zeros((L,), dtype=np.uint32)
    for l, mod in enumerate(moduli):
        q = mod.value
        for t in range(N_LIMBS):
            c = pow(2, 16 * t, q)
            pow16[l, t] = c
            pow16_sh[l, t] = (c << 32) // q
        for s in range(N_DIAGS):
            c = pow(2, 8 * s, q)
            pow8[l, s] = c
            pow8_sh[l, s] = (c << 32) // q
        corr16[l] = sum((1 << 31) * pow(2, 16 * t, q) for t in range(N_LIMBS)) % q
        corr8[l] = sum((1 << 31) * pow(2, 8 * s, q) for s in range(N_DIAGS)) % q
    return pow16, pow16_sh, pow8, pow8_sh, corr16, corr8


class MxuNTTTables:
    """Per-(n, moduli) constant matrices for the 4-step transform."""

    _cache: dict = {}

    def __init__(self, log_n: int, moduli: list[Modulus]):
        import os as _os

        self.log_n = log_n
        self.n = n = 1 << log_n
        # TROY_NTT_SPLIT_A = log2(n1) overrides the square-ish default
        # (same tuning knob as the sixstep backend, ops/ntt.py)
        a = int(_os.environ.get("TROY_NTT_SPLIT_A", log_n // 2))
        a = max(1, min(log_n - 1, a))
        self.n1 = n1 = 1 << a
        self.n2 = n2 = n // n1
        self.a = a
        self.b = log_n - a
        L = len(moduli)
        self.moduli = moduli

        W1 = np.zeros((L, n1, n1), dtype=np.uint32)
        T = np.zeros((L, n1, n2), dtype=np.uint32)
        W2 = np.zeros((L, n2, n2), dtype=np.uint32)
        W1i = np.zeros((L, n1, n1), dtype=np.uint32)
        Ti = np.zeros((L, n1, n2), dtype=np.uint32)
        W2i = np.zeros((L, n2, n2), dtype=np.uint32)

        brv_a = [numth.reverse_bits(i, self.a) for i in range(n1)]
        brv_b = [numth.reverse_bits(i, self.b) for i in range(n2)]

        for l, mod in enumerate(moduli):
            q = mod.value
            key = (log_n, q, a)  # split-dependent matrices
            if key in self._cache:
                w1, t, w2, w1i, ti, w2i = self._cache[key]
            else:
                psi = numth.try_minimal_primitive_root(2 * n, q)
                ipsi = numth.invert_mod(psi, q)
                w = psi * psi % q
                iw = ipsi * ipsi % q
                n_inv = numth.invert_mod(n, q)
                # forward: W1[k1', i1] = w^(n2*i1*k1) * psi^(n2*i1)
                w_n2 = pow(w, n2, q)
                psi_n2 = pow(psi, n2, q)
                w_n1 = pow(w, n1, q)
                w1 = np.zeros((n1, n1), dtype=np.uint32)
                for k1p in range(n1):
                    k1 = brv_a[k1p]
                    base = pow(w_n2, k1, q)
                    v = 1
                    for i1 in range(n1):
                        w1[k1p, i1] = v * pow(psi_n2, i1, q) % q
                        v = v * base % q
                t = np.zeros((n1, n2), dtype=np.uint32)
                for k1p in range(n1):
                    k1 = brv_a[k1p]
                    step = pow(w, k1, q)
                    v = 1
                    for i2 in range(n2):
                        t[k1p, i2] = v * pow(psi, i2, q) % q
                        v = v * step % q
                w2 = np.zeros((n2, n2), dtype=np.uint32)
                for i2 in range(n2):
                    for k2p in range(n2):
                        w2[i2, k2p] = pow(w_n1, i2 * brv_b[k2p], q)
                # inverse: x = W1i @ (Ti * (X @ W2i)), n^-1 folded into W1i
                iw_n1 = pow(iw, n1, q)
                iw_n2 = pow(iw, n2, q)
                ipsi_n2 = pow(ipsi, n2, q)
                w2i = np.zeros((n2, n2), dtype=np.uint32)
                for k2p in range(n2):
                    for i2 in range(n2):
                        w2i[k2p, i2] = pow(iw_n1, i2 * brv_b[k2p], q)
                ti = np.zeros((n1, n2), dtype=np.uint32)
                for k1p in range(n1):
                    k1 = brv_a[k1p]
                    for i2 in range(n2):
                        ti[k1p, i2] = pow(iw, i2 * k1, q) * pow(ipsi, i2, q) % q
                w1i = np.zeros((n1, n1), dtype=np.uint32)
                for i1 in range(n1):
                    c = n_inv * pow(ipsi_n2, i1, q) % q
                    for k1p in range(n1):
                        k1 = brv_a[k1p]
                        w1i[i1, k1p] = c * pow(iw_n2, i1 * k1, q) % q
                self._cache[key] = (w1, t, w2, w1i, ti, w2i)
            W1[l], T[l], W2[l], W1i[l], Ti[l], W2i[l] = w1, t, w2, w1i, ti, w2i

        pow16, pow16_sh, pow8, pow8_sh, corr16, corr8 = _pow_tables(moduli)

        def shoup(m):
            out = np.zeros_like(m, dtype=np.uint32)
            for l, mod in enumerate(moduli):
                q = mod.value
                out[l] = ((m[l].astype(np.uint64) << 32) // q).astype(np.uint32)
            return out

        self._host = dict(
            W1=_balance_const(W1), W2=_balance_const(W2),
            W1i=_balance_const(W1i), W2i=_balance_const(W2i),
            T=T, T_shoup=shoup(T), Ti=Ti, Ti_shoup=shoup(Ti),
            pow16=pow16, pow16_shoup=pow16_sh,
            pow8=pow8, pow8_shoup=pow8_sh, corr16=corr16, corr8=corr8,
            q=np.array([m.value for m in moduli], dtype=np.uint32),
        )
        # twiddle-folded recombination weights (pallas kernel, pairwise-fold
        # regime only): the mid-transform twiddle multiply collapses into
        # the adjacent matmul's recombination — weight tables become the
        # ELEMENTWISE T[l, r, c] * 2^(16t) mod q (and the +2^31-shift excess
        # becomes the elementwise T * corr16), saving one full Shoup pass
        # per transform.
        if n1 <= PAIR_FOLD_MAX_K and n2 <= PAIR_FOLD_MAX_K:
            qv = np.array([m.value for m in moduli],
                          dtype=np.uint64)[:, None, None]
            for name, base in (("T16", T), ("Ti16", Ti)):
                b = base.astype(np.uint64)
                rows = [b % qv]  # iterate <<16 mod q: stays under 2^46
                for _ in range(N_LIMBS - 1):
                    rows.append((rows[-1] << np.uint64(16)) % qv)
                planes = np.stack(rows).astype(np.uint32)
                self._host[name] = planes
                sh = np.zeros_like(planes)
                for l, mod in enumerate(moduli):
                    sh[:, l] = ((planes[:, l].astype(np.uint64) << 32)
                                // mod.value).astype(np.uint32)
                self._host[name + "_shoup"] = sh
                corr = (b * corr16.astype(np.uint64)[:, None, None]) % qv
                self._host[name.replace("16", "corr")] = corr.astype(np.uint32)
        else:
            # contraction > 128: per-diagonal recombination, twiddle stays a
            # separate Shoup pass — ship single-plane stacks (plane 0 = T)
            # so the kernel signature is uniform without the 4x VMEM cost
            self._host["T16"] = T[None]
            self._host["T16_shoup"] = self._host["T_shoup"][None]
            self._host["Ti16"] = Ti[None]
            self._host["Ti16_shoup"] = self._host["Ti_shoup"][None]
            z = np.zeros_like(T)
            self._host["Tcorr"] = z
            self._host["Ticorr"] = z
        self._device = None

    def pack(self) -> dict:
        if self._device is None:
            self._device = {k: jnp.asarray(v) for k, v in self._host.items()}
        return self._device

    def pack_prefixed(self) -> dict:
        """Keys prefixed mxu_* for merging into an NTTTables pack."""
        return {f"mxu_{k}": v for k, v in self.pack().items() if k != "q"}


# per-limb axis of each mxu_* key, for table row slicing (see ops/ntt.py)
MXU_LIMB_AXIS = {
    "mxu_W1": 1, "mxu_W2": 1, "mxu_W1i": 1, "mxu_W2i": 1,
    "mxu_T": 0, "mxu_T_shoup": 0, "mxu_Ti": 0, "mxu_Ti_shoup": 0,
    "mxu_pow16": 0, "mxu_pow16_shoup": 0,
    "mxu_pow8": 0, "mxu_pow8_shoup": 0, "mxu_corr16": 0, "mxu_corr8": 0,
    "mxu_T16": 1, "mxu_T16_shoup": 1, "mxu_Tcorr": 0,
    "mxu_Ti16": 1, "mxu_Ti16_shoup": 1, "mxu_Ticorr": 0,
}


def _factors(n: int, t: dict, prefix: str) -> tuple[int, int]:
    n1 = t[prefix + "W1"].shape[-1]  # split comes from the table build
    return n1, n // n1


def _recombine(P: jnp.ndarray, t: dict, out_ndim: int, prefix: str,
               contraction: int) -> jnp.ndarray:
    """Broadcast-shape wrapper over recombine_planes for (i, j, ..., L, r, c)
    partials."""
    lead = (1,) * (out_ndim - 3)
    sh = lead + (-1, 1, 1)
    p = prefix
    return recombine_planes(
        P,
        [t[p + "pow16"][:, k].reshape(sh) for k in range(N_LIMBS)],
        [t[p + "pow16_shoup"][:, k].reshape(sh) for k in range(N_LIMBS)],
        [t[p + "pow8"][:, k].reshape(sh) for k in range(N_DIAGS)],
        [t[p + "pow8_shoup"][:, k].reshape(sh) for k in range(N_DIAGS)],
        t[p + "corr16"].reshape(sh), t[p + "corr8"].reshape(sh),
        t["q"].reshape(sh), contraction)


def _modular_matmul_left(Wl: jnp.ndarray, x: jnp.ndarray, t: dict,
                         prefix: str = "") -> jnp.ndarray:
    """C[..., L, a, c] = sum_b W[L, a, b] * x[..., L, b, c] mod q.
    Wl: (limbs, L, a, b) int8 constant planes; x: (..., L, b, c) u32 in
    [0, 2q)."""
    lead = (1,) * (x.ndim - 3)
    xl = split_balanced(x, t["q"].reshape(lead + (-1, 1, 1)))
    P = jnp.einsum("ilab,j...lbc->ij...lac", Wl, xl,
                   preferred_element_type=jnp.int32)
    return _recombine(P, t, x.ndim, prefix, contraction=x.shape[-2])


def _modular_matmul_right(x: jnp.ndarray, Wl: jnp.ndarray, t: dict,
                          prefix: str = "") -> jnp.ndarray:
    """C[..., L, a, d] = sum_c x[..., L, a, c] * W[L, c, d] mod q."""
    lead = (1,) * (x.ndim - 3)
    xl = split_balanced(x, t["q"].reshape(lead + (-1, 1, 1)))
    P = jnp.einsum("j...lac,ilcd->ij...lad", xl, Wl,
                   preferred_element_type=jnp.int32)
    return _recombine(P, t, x.ndim, prefix, contraction=x.shape[-1])


def ntt_forward_mxu(x: jnp.ndarray, t: dict, prefix: str = "") -> jnp.ndarray:
    """Forward negacyclic NTT, bit-identical to ops/ntt.ntt_forward.
    x: (..., L, n) u32 in [0, 2q).  `t` is either an MxuNTTTables.pack() or an
    NTTTables pack with merged mxu_* keys (prefix="mxu_")."""
    p = prefix
    n1, n2 = _factors(x.shape[-1], t, p)
    lead = x.shape[:-1]
    X = x.reshape(lead + (n1, n2))
    A = _modular_matmul_left(t[p + "W1"], X, t, p)
    q = t["q"][:, None, None]
    B = U.shoup_mul(A, t[p + "T"], t[p + "T_shoup"], q)
    C = _modular_matmul_right(B, t[p + "W2"], t, p)
    return C.reshape(lead + (n1 * n2,))


def ntt_inverse_mxu(x: jnp.ndarray, t: dict, prefix: str = "") -> jnp.ndarray:
    """Inverse negacyclic NTT, bit-identical to ops/ntt.ntt_inverse."""
    p = prefix
    n1, n2 = _factors(x.shape[-1], t, p)
    lead = x.shape[:-1]
    X = x.reshape(lead + (n1, n2))
    C = _modular_matmul_right(X, t[p + "W2i"], t, p)
    q = t["q"][:, None, None]
    B = U.shoup_mul(C, t[p + "Ti"], t[p + "Ti_shoup"], q)
    A = _modular_matmul_left(t[p + "W1i"], B, t, p)
    return A.reshape(lead + (n1 * n2,))
