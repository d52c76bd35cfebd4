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

Exact modular matmul on the MXU: operands split into 7-bit limbs stored as
int8 (values <= 127, no signed-offset corrections needed); one dot_general
contracts all limb pairs at once with int32 accumulation (partial sums
<= 127^2 * n1 * 5 < 2^25, exact); recombination multiplies each diagonal
limb-weight 2^(7s) mod q back in with Shoup constants on the VPU.

(ref: the roofline redesign of src/fgk/ntt_grouped.cu — SURVEY.md §7 step 2.)
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import u32 as U
from ..utils import numth
from ..core.modulus import Modulus

LIMB_BITS = 7
N_LIMBS = 5  # ceil(30 / 7)
_LIMB_MASK = (1 << LIMB_BITS) - 1


def _split_limbs_const(m: np.ndarray) -> np.ndarray:
    """(...,) u32 host matrix -> (N_LIMBS, ...) int8 limb planes."""
    out = np.empty((N_LIMBS,) + m.shape, dtype=np.int8)
    for i in range(N_LIMBS):
        out[i] = ((m >> (LIMB_BITS * i)) & _LIMB_MASK).astype(np.int8)
    return out


def _split_limbs(x: jnp.ndarray) -> jnp.ndarray:
    """(...,) u32 device array -> (N_LIMBS, ...) int8 limb planes."""
    planes = [
        ((x >> U.U32(LIMB_BITS * i)) & U.U32(_LIMB_MASK)).astype(jnp.int8)
        for i in range(N_LIMBS)
    ]
    return jnp.stack(planes)


class MxuNTTTables:
    """Per-(n, moduli) constant matrices for the 4-step transform."""

    _cache: dict = {}

    def __init__(self, log_n: int, moduli: list[Modulus]):
        self.log_n = log_n
        self.n = n = 1 << log_n
        a = log_n // 2
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
        pow_mod_q = np.zeros((L, 2 * N_LIMBS - 1), dtype=np.uint32)
        pow_shoup = np.zeros((L, 2 * N_LIMBS - 1), dtype=np.uint32)

        brv_a = [numth.reverse_bits(i, self.a) for i in range(n1)]
        brv_b = [numth.reverse_bits(i, self.b) for i in range(n2)]

        for l, mod in enumerate(moduli):
            q = mod.value
            key = (log_n, q)
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
            for s in range(2 * N_LIMBS - 1):
                c = pow(2, LIMB_BITS * s, mod.value)
                pow_mod_q[l, s] = c
                pow_shoup[l, s] = (c << 32) // mod.value

        def shoup(m, col=False):
            out = np.zeros_like(m, dtype=np.uint32)
            for l, mod in enumerate(moduli):
                q = mod.value
                out[l] = ((m[l].astype(np.uint64) << 32) // q).astype(np.uint32)
            return out

        self._host = dict(
            W1=_split_limbs_const(W1), W2=_split_limbs_const(W2),
            W1i=_split_limbs_const(W1i), W2i=_split_limbs_const(W2i),
            T=T, T_shoup=shoup(T), Ti=Ti, Ti_shoup=shoup(Ti),
            pow_mod_q=pow_mod_q, pow_shoup=pow_shoup,
            q=np.array([m.value for m in moduli], dtype=np.uint32),
        )
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
    "mxu_pow_mod_q": 0, "mxu_pow_shoup": 0,
}


def _factors(n: int) -> tuple[int, int]:
    log_n = n.bit_length() - 1
    n1 = 1 << (log_n // 2)
    return n1, n // n1


def _modular_matmul_left(Wl: jnp.ndarray, x: jnp.ndarray, t: dict,
                         prefix: str = "") -> jnp.ndarray:
    """C[..., L, a, c] = sum_b W[L, a, b] * x[..., L, b, c] mod q.
    Wl: (limbs, L, a, b) int8 constant planes; x: (..., L, b, c) u32."""
    xl = _split_limbs(x)  # (j, ..., L, b, c)
    P = jnp.einsum("ilab,j...lbc->ij...lac", Wl, xl,
                   preferred_element_type=jnp.int32)
    return _recombine(P, t, x.ndim, prefix)


def _modular_matmul_right(x: jnp.ndarray, Wl: jnp.ndarray, t: dict,
                          prefix: str = "") -> jnp.ndarray:
    """C[..., L, a, d] = sum_c x[..., L, a, c] * W[L, c, d] mod q."""
    xl = _split_limbs(x)
    P = jnp.einsum("j...lac,ilcd->ij...lad", xl, Wl,
                   preferred_element_type=jnp.int32)
    return _recombine(P, t, x.ndim, prefix)


def _recombine(P: jnp.ndarray, t: dict, out_ndim: int,
               prefix: str = "") -> jnp.ndarray:
    """P: (i, j, ..., L, r, c) int32 partials -> sum_ij P * 2^(7(i+j)) mod q."""
    lead = (1,) * (out_ndim - 3)
    q = t["q"].reshape(lead + (-1, 1, 1))
    acc = None
    for s in range(2 * N_LIMBS - 1):
        ss = None
        for i in range(max(0, s - N_LIMBS + 1), min(N_LIMBS, s + 1)):
            term = P[i, s - i]
            ss = term if ss is None else ss + term
        ssu = ss.astype(jnp.uint32)
        w = t[prefix + "pow_mod_q"][:, s].reshape(lead + (-1, 1, 1))
        wsh = t[prefix + "pow_shoup"][:, s].reshape(lead + (-1, 1, 1))
        contrib = U.shoup_mul(ssu, w, wsh, q)
        acc = contrib if acc is None else U.add_mod(acc, contrib, q)
    return acc


def ntt_forward_mxu(x: jnp.ndarray, t: dict, prefix: str = "") -> jnp.ndarray:
    """Forward negacyclic NTT, bit-identical to ops/ntt.ntt_forward.
    x: (..., L, n) u32 in [0, q).  `t` is either an MxuNTTTables.pack() or an
    NTTTables pack with merged mxu_* keys (prefix="mxu_")."""
    n1, n2 = _factors(x.shape[-1])
    p = prefix
    lead = x.shape[:-1]
    X = x.reshape(lead + (n1, n2))
    A = _modular_matmul_left(t[p + "W1"], X, t, p)
    q = t["q"][:, None, None]
    B = U.shoup_mul(A, t[p + "T"], t[p + "T_shoup"], q)
    C = _modular_matmul_right(B, t[p + "W2"], t, p)
    return C.reshape(lead + (n1 * n2,))


def ntt_inverse_mxu(x: jnp.ndarray, t: dict, prefix: str = "") -> jnp.ndarray:
    """Inverse negacyclic NTT, bit-identical to ops/ntt.ntt_inverse."""
    n1, n2 = _factors(x.shape[-1])
    p = prefix
    lead = x.shape[:-1]
    X = x.reshape(lead + (n1, n2))
    C = _modular_matmul_right(X, t[p + "W2i"], t, p)
    q = t["q"][:, None, None]
    B = U.shoup_mul(C, t[p + "Ti"], t[p + "Ti_shoup"], q)
    A = _modular_matmul_left(t[p + "W1i"], B, t, p)
    return A.reshape(lead + (n1 * n2,))
