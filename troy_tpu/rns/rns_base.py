"""RNS base and fast base conversion.

TPU-native rebuild of reference src/utils/rns_base.{h,cu} (RNSBase, CRT
compose/decompose, BaseConverter with the HPS/BEHZ fast_convert_array).

Host side keeps Python-int CRT machinery for setup/encoders/tests; device
side is pure u32: the base-change "matrix" multiply

    y_j = sum_i [x_i * (Q/q_i)^-1]_{q_i} * [(Q/q_i)]_{p_j}  mod p_j

is evaluated with Shoup multiplies for the per-limb constants and a static
Python loop over input limbs with modular accumulation (the limb count is a
trace-time constant, so XLA fully unrolls and fuses the chain).  A future
MXU path can lower this to int8-limb matmuls (ops/ntt roadmap).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.modulus import Modulus
from ..utils import numth
from ..ops import u32 as U


def _int_lanes(values) -> np.ndarray:
    """Coerce an int iterable to the widest exact numpy representation:
    integer-dtype ndarrays pass through (uint64 stays unsigned — a silent
    int64 wrap would corrupt residues), Python ints use int64 lanes when
    they fit and object dtype otherwise."""
    if isinstance(values, np.ndarray) and values.dtype.kind in "iu":
        return values
    try:
        return np.asarray(values, dtype=np.int64)
    except (OverflowError, TypeError):
        return np.asarray(values, dtype=object)


class RNSBase:
    """An ordered set of pairwise-coprime word-size moduli
    (ref: rns_base.h:11-17)."""

    def __init__(self, moduli: list[Modulus]):
        if not moduli:
            raise ValueError("[RNSBase] empty base")
        vals = [m.value for m in moduli]
        for i in range(len(vals)):
            for j in range(i + 1, len(vals)):
                if not numth.are_coprime(vals[i], vals[j]):
                    raise ValueError("[RNSBase] moduli must be pairwise coprime")
        self.moduli = moduli
        self.values = vals
        self.size = len(vals)
        self.prod: int = 1
        for v in vals:
            self.prod *= v
        # punctured products Q/q_i and their inverses mod q_i (Shoup form)
        self.punctured = [self.prod // v for v in vals]
        self.inv_punctured = [
            numth.invert_mod(p % v, v) for p, v in zip(self.punctured, vals)
        ]
        self._pack = None

    # -- host CRT (ref: rns_base compose/decompose_single) ------------------
    def decompose(self, value: int) -> list[int]:
        value %= self.prod
        return [value % v for v in self.values]

    def compose(self, residues: list[int]) -> int:
        acc = 0
        for r, p, ip, v in zip(residues, self.punctured, self.inv_punctured, self.values):
            acc += (r * ip % v) * p
        return acc % self.prod

    def compose_centered(self, residues: list[int]) -> int:
        """Compose then center into (-Q/2, Q/2]."""
        v = self.compose(residues)
        return v - self.prod if v > self.prod // 2 else v

    def decompose_array_host(self, values) -> np.ndarray:
        """Python-int iterable (length n) -> (L, n) u32 residues.
        Vectorized: int64 lanes when the inputs fit, else one object-dtype
        numpy mod per prime (C-driven loop over Python ints) — never a
        per-coefficient Python loop (ref three-tier decomposition,
        src/ckks_encoder.cu:454-692)."""
        arr = _int_lanes(values)
        return np.stack([(arr % q).astype(np.uint32) for q in self.values])

    def residues_host(self, values) -> np.ndarray:
        """Python-int iterable -> (L, n) residues at full modulus width
        (uint64 rows); vectorized like decompose_array_host but without the
        u32 narrowing."""
        arr = _int_lanes(values)
        return np.stack([np.asarray(arr % q, dtype=np.uint64)
                         for q in self.values])

    def compose_array_host(self, arr: np.ndarray) -> list[int]:
        """(L, n) residues -> list of Python ints in [0, Q).  Vectorized CRT:
        object-dtype numpy elementwise ops instead of per-coefficient
        Python-loop compose."""
        acc = np.zeros(arr.shape[1], dtype=object)
        for i in range(self.size):
            row = arr[i].astype(object)
            acc += (row * self.inv_punctured[i] % self.values[i]) \
                * self.punctured[i]
        return list(acc % self.prod)

    def compose_centered_f64_host(self, arr: np.ndarray) -> np.ndarray:
        """(L, n) residues -> CENTERED coefficients as float64, via a
        fixed-point fractional CRT in u64 numpy (no Python big ints):

            frac = sum_i (r_i * inv_punc_i mod q_i) * floor(2^(32K)/q_i)
                   mod 2^(32K)            (exact integer accumulation)
            value = centered(frac) * Q    (two f64 roundings)

        K is sized so the fraction carries >= 53 significant bits for ANY
        value magnitude (32K >= bits(Q) + 64), so the result matches
        float64(compose_centered(...)) to <= 2 ulp relative at every
        value magnitude (including +-1).  The
        accumulation runs as TWO u64 einsums over (limb, word) — the
        object-dtype compose cost ~11 ms/call at L=7, n=8192; this is ~3 ms.
        (The device twin is ops/ddfft.frac_crt_fixed.)  Falls back to the
        big-int path when f64 exponent range cannot hold Q."""
        n = arr.shape[-1]
        if self.prod.bit_length() > 900:
            comp = np.array(self.compose_array_host(arr), dtype=object)
            return np.where(comp > self.prod // 2, comp - self.prod,
                            comp).astype(np.float64)
        cache = getattr(self, "_fcrt_cache", None)
        if cache is None:
            # truncation of floor(2^(32K)/q_i) costs |err| <= L*q_i in
            # 2^-(32K) frac units; for value=1 that must sit 53 bits below
            # 1/Q: 32K >= bits(Q) + bits(L*q_max) + 53 (+ slack)
            K = (self.prod.bit_length() + 128 + 31) // 32
            W16 = 2 * K
            r16 = np.zeros((self.size, W16), dtype=np.uint64)
            for i, q in enumerate(self.values):
                r = (1 << (32 * K)) // q
                for w in range(W16):
                    r16[i, w] = (r >> (16 * w)) & 0xFFFF
            cache = (K, W16, r16)
            self._fcrt_cache = cache
        K, W16, r16 = cache
        if self.size > 30:  # L*2^48 must stay under 2^53 for exact f64 sums
            comp = np.array(self.compose_array_host(arr), dtype=object)
            return np.where(comp > self.prod // 2, comp - self.prod,
                            comp).astype(np.float64)
        # c~_i = r_i * inv_punc_i mod q_i (u64-safe below 2^31, object above)
        ctil = np.empty((self.size, n), dtype=np.uint64)
        for i, q in enumerate(self.values):
            if q < (1 << 31):
                ctil[i] = (arr[i].astype(np.uint64)
                           * np.uint64(self.inv_punctured[i])) % np.uint64(q)
            else:
                # wide primes (q < 2^61): Shoup multiply in numpy u64 lanes
                # (a 64x64 product overflows u64, so use hi = floor(r*ws /
                # 2^64) via 32-bit split products, then r*w - hi*q in
                # wrapping u64 — exact, value < 2q, one csub); the previous
                # object-dtype row was ~60% of the wide compose cost
                w = self.inv_punctured[i]
                ws = (w << 64) // q
                r = arr[i].astype(np.uint64)
                m32 = np.uint64(0xFFFFFFFF)
                r_lo, r_hi = r & m32, r >> np.uint64(32)
                s_lo, s_hi = np.uint64(ws & 0xFFFFFFFF), np.uint64(ws >> 32)
                t0 = r_lo * s_lo
                t1 = r_hi * s_lo
                t2 = r_lo * s_hi
                t3 = r_hi * s_hi
                cross = (t0 >> np.uint64(32)) + (t1 & m32) + (t2 & m32)
                hi = t3 + (t1 >> np.uint64(32)) + (t2 >> np.uint64(32)) \
                    + (cross >> np.uint64(32))
                v = r * np.uint64(w) - hi * np.uint64(q)  # wrapping, < 2q
                ctil[i] = np.where(v >= np.uint64(q), v - np.uint64(q), v)
        # acc16[p] = sum_{l, c, j: j+2c=p} ctil_chunk[l,c] * r16[l,j].
        # The WHOLE pipeline runs in f64 (BLAS matmul + vector ops, no
        # u64 casts): every intermediate is an integer < 2^53, so no f64
        # rounding ever occurs — products are 48-bit, per-position sums
        # < L*2^49, carry-normalized words are 16-bit.
        c_lo = (ctil & np.uint64(0xFFFFFFFF)).astype(np.float64)
        c_hi = (ctil >> np.uint64(32)).astype(np.float64)
        cache2 = getattr(self, "_fcrt_cache2", None)
        if cache2 is None:
            r16f = r16.astype(np.float64)
            # group-conversion matrix: words in triples (48-bit groups sum
            # exactly in f64), combined compensated below
            G = (W16 + 2) // 3
            gmat = np.zeros((G, W16), dtype=np.float64)
            for w in range(W16):
                gmat[w // 3, w] = 2.0 ** (16.0 * (w - 3 * (w // 3)))
            gscale = np.power(2.0, 48.0 * np.arange(G) - 32.0 * K)
            cache2 = (r16f, gmat, gscale)
            self._fcrt_cache2 = cache2
        r16f, gmat, gscale = cache2
        acc = np.zeros((W16 + 2, n), dtype=np.float64)
        acc[:W16] += r16f.T @ c_lo
        acc[2:W16 + 2] += r16f.T @ c_hi
        # carry-normalize to 16-bit words (exact f64 floor/sub)
        s16 = 1.0 / 65536.0
        for w in range(W16 - 1):
            cr = np.floor(acc[w] * s16)
            acc[w] -= cr * 65536.0
            acc[w + 1] += cr
        acc[W16 - 1] -= np.floor(acc[W16 - 1] * s16) * 65536.0  # mod 2^(32K)
        # center: frac >= 1/2 <=> top bit of the top word; the negative
        # branch converts the exact two's complement 2^(32K) - acc
        negb = acc[W16 - 1] >= 32768.0
        comp16 = 65535.0 - acc[:W16]
        carry = np.ones(n, dtype=np.float64)
        for w in range(W16):
            comp16[w] += carry
            carry = np.floor(comp16[w] * s16)
            comp16[w] -= carry * 65536.0

        def to_f64(words):
            # triple-grouped exact partial sums (one small dgemm), then a
            # top-down compensated combine of the ~6 group values
            g = gmat @ words[:W16] if words.shape[0] != gmat.shape[1] \
                else gmat @ words
            val = np.zeros(n, dtype=np.float64)
            comp = np.zeros(n, dtype=np.float64)
            for k in range(g.shape[0] - 1, -1, -1):
                x = g[k] * gscale[k]
                t = val + x
                comp += np.where(val >= x, (val - t) + x, (x - t) + val)
                val = t
            return val + comp

        frac = np.where(negb, -to_f64(comp16), to_f64(acc[:W16]))
        return frac * float(self.prod)

    # -- device tables ------------------------------------------------------
    def pack(self) -> dict:
        if self._pack is None:
            q = np.array(self.values, dtype=np.uint32)
            hi = np.array([m.ratio64_hi for m in self.moduli], dtype=np.uint32)
            lo = np.array([m.ratio64_lo for m in self.moduli], dtype=np.uint32)
            invp = np.array(self.inv_punctured, dtype=np.uint32)
            invp_sh = np.array(
                [ (ip << 32) // v for ip, v in zip(self.inv_punctured, self.values)],
                dtype=np.uint64,
            ).astype(np.uint32)
            self._pack = {
                "q": jnp.asarray(q),
                "ratio_hi": jnp.asarray(hi),
                "ratio_lo": jnp.asarray(lo),
                "inv_punctured": jnp.asarray(invp),
                "inv_punctured_shoup": jnp.asarray(invp_sh),
            }
        return self._pack


def _pair_cols(vals: list[int]) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Python ints -> ((L,1) hi, (L,1) lo) u32 word columns."""
    hi = np.array([(v >> 32) & 0xFFFFFFFF for v in vals], dtype=np.uint32)
    lo = np.array([v & 0xFFFFFFFF for v in vals], dtype=np.uint32)
    return jnp.asarray(hi)[:, None], jnp.asarray(lo)[:, None]


class BaseConverter64:
    """Wide-width fast base conversion on (..., 2, L, n) pair arrays
    (ref: rns_base.h:158-207 fast_convert_array at the reference's native
    <=61-bit prime width; products accumulate in 128-bit four-word vectors
    with one Barrett per chunk, ops/u64.py dot_mod64)."""

    def __init__(self, ibase: RNSBase, obase: RNSBase):
        from ..ops import u64 as W

        self.ibase = ibase
        self.obase = obase
        self.inv_punc = _pair_cols(ibase.inv_punctured)
        self.inv_punc_shoup = _pair_cols(
            [(ip << 64) // v for ip, v in zip(ibase.inv_punctured, ibase.values)]
        )
        self.iq = _pair_cols(ibase.values)
        self.oq = _pair_cols(obase.values)
        ratios = [(1 << 128) // p for p in obase.values]
        self.oratio = tuple(
            jnp.asarray(np.array([(r >> (32 * w)) & 0xFFFFFFFF for r in ratios],
                                 dtype=np.uint32))[:, None]
            for w in (3, 2, 1, 0)
        )
        # mat[:, i] = (Q/q_i) mod p_j as pair columns, one per input limb
        self.mat = [
            _pair_cols([punc % p for p in obase.values])
            for punc in ibase.punctured
        ]
        self.max_terms = W.dot_mod64_terms(max(obase.values))

    def convert(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (..., 2, L_in, n) -> (..., 2, L_out, n)."""
        from ..ops import u64 as W
        from ..ops import rp as R

        h, l = R.hi_lo(x)
        th, tl = W.shoup_mul64(
            h, l, self.inv_punc[0], self.inv_punc[1],
            self.inv_punc_shoup[0], self.inv_punc_shoup[1],
            self.iq[0], self.iq[1],
        )
        pairs = [
            ((th[..., i : i + 1, :], tl[..., i : i + 1, :]), self.mat[i])
            for i in range(self.ibase.size)
        ]
        acc = W.dot_mod64(pairs, self.oq[0], self.oq[1], *self.oratio,
                          self.max_terms)
        return R.pair(*acc)


import os as _os

# 'vpu' (default): wide (hi, lo) accumulation dot (one Barrett per output).
# 'mxu': balanced int8 digit planes contracted over the input-limb axis on
# the MXU with the pairwise-folded Shoup recombination (ops/ntt_mxu.py) at
# the XLA level — bit-identical but ~3x SLOWER on TPU (the 16 int32 partial
# planes materialize to HBM; measured BENCH.md round 4), kept as the
# documented negative result.
# 'pallas': the same scheme fused into one VMEM-resident kernel
# (ntt_pallas.bconv_pallas) — the round-4 joint-MXU-offload path (BENCH.md
# roofline: bconv-family dots are ~44% of flagship multiplies).
_BCONV_BACKEND = _os.environ.get("TROY_BCONV_BACKEND", "vpu")


def set_bconv_backend(name: str):
    global _BCONV_BACKEND
    if name not in ("vpu", "mxu", "pallas"):
        raise ValueError(f"[set_bconv_backend] unknown backend {name}")
    _BCONV_BACKEND = name


def get_bconv_backend() -> str:
    return _BCONV_BACKEND


class BaseConverter:
    """Fast (approximate) base conversion ibase -> obase
    (ref: rns_base.h:158-207 fast_convert_array).

    Output equals the input integer plus alpha * prod(ibase) for some
    0 <= alpha < len(ibase) — the BEHZ machinery corrects alpha where needed.
    """

    def __init__(self, ibase: RNSBase, obase: RNSBase):
        self.ibase = ibase
        self.obase = obase
        # matrix[j, i] = (Q/q_i) mod p_j
        mat = np.empty((obase.size, ibase.size), dtype=np.uint32)
        for j, p in enumerate(obase.values):
            for i, punc in enumerate(ibase.punctured):
                mat[j, i] = punc % p
        self._mat = jnp.asarray(mat)
        self._mxu = None

    def _mxu_pack(self) -> dict:
        # host numpy values (NOT jnp): convert() is called inside traces,
        # and jnp constants created there would be cached as leaked tracers
        if self._mxu is None:
            from ..ops import ntt_mxu as MX

            (pow16, pow16_sh, pow8, pow8_sh,
             corr16, corr8) = MX._pow_tables(self.obase.moduli)
            self._mxu = {
                "mat_planes": MX._balance_const(np.asarray(self._mat)),
                "pow16": pow16, "pow16_shoup": pow16_sh,
                "pow8": pow8, "pow8_shoup": pow8_sh,
                "corr16": corr16, "corr8": corr8,
            }
        return self._mxu

    def _convert_mxu(self, tmp: jnp.ndarray) -> jnp.ndarray:
        """tmp: (..., L_in, n) residues in [0, q_i) -> (..., L_out, n); the
        limb-axis contraction runs as int8-plane dot_generals with int32
        accumulation — bit-identical to the VPU dot (same integer sum,
        same final reduction)."""
        from ..ops import ntt_mxu as MX

        mx = self._mxu_pack()
        op = self.obase.pack()
        lead = (1,) * (tmp.ndim - 2)
        planes = MX.split_balanced(
            tmp, self.ibase.pack()["q"].reshape(lead + (-1, 1)))
        P = jnp.einsum("j...lk,iol->ij...ok", planes, mx["mat_planes"],
                       preferred_element_type=jnp.int32)
        sh = lead + (-1, 1)
        return MX.recombine_planes(
            P,
            [mx["pow16"][:, t].reshape(sh) for t in range(MX.N_LIMBS)],
            [mx["pow16_shoup"][:, t].reshape(sh) for t in range(MX.N_LIMBS)],
            [mx["pow8"][:, s].reshape(sh) for s in range(MX.N_DIAGS)],
            [mx["pow8_shoup"][:, s].reshape(sh) for s in range(MX.N_DIAGS)],
            mx["corr16"].reshape(sh), mx["corr8"].reshape(sh),
            op["q"].reshape(sh), contraction=self.ibase.size)

    def _pallas_tables(self) -> dict:
        """Host-numpy argument tuple for ntt_pallas.bconv_pallas (cached;
        numpy so traced callers embed constants instead of leaking tracers)."""
        if getattr(self, "_pallas_tabs", None) is None:
            from ..ops import ntt_mxu as MX

            (pow16, pow16_sh, pow8, pow8_sh,
             corr16, corr8) = MX._pow_tables(self.obase.moduli)
            ib = self.ibase
            iq = np.array(ib.values, dtype=np.uint32)
            ip = np.array(ib.inv_punctured, dtype=np.uint32)
            ips = np.array([(p << 32) // v for p, v
                            in zip(ib.inv_punctured, ib.values)],
                           dtype=np.uint32)
            oq = np.array(self.obase.values, dtype=np.uint32)
            self._pallas_tabs = {"args": (
                iq, ip, ips, oq, MX._balance_const(np.asarray(self._mat)),
                pow16, pow16_sh, corr16, pow8, pow8_sh, corr8)}
        return self._pallas_tabs

    def convert(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (..., L_in, n) residues in ibase -> (..., L_out, n) in obase."""
        if _BCONV_BACKEND == "pallas":
            from ..ops.ntt_pallas import bconv_pallas

            return bconv_pallas(x, self._pallas_tables())
        ip = self.ibase.pack()
        op = self.obase.pack()
        lead = (1,) * (x.ndim - 2)
        # tmp_i = [x_i * (Q/q_i)^-1]_{q_i}
        tmp = U.shoup_mul(
            x,
            ip["inv_punctured"].reshape(lead + (-1, 1)),
            ip["inv_punctured_shoup"].reshape(lead + (-1, 1)),
            ip["q"].reshape(lead + (-1, 1)),
        )
        if _BCONV_BACKEND == "mxu":
            return self._convert_mxu(tmp)
        p = op["q"].reshape(lead + (-1, 1))
        p_hi = op["ratio_hi"].reshape(lead + (-1, 1))
        p_lo = op["ratio_lo"].reshape(lead + (-1, 1))
        # wide (hi, lo) accumulation: one Barrett per output element instead
        # of one per (i, j) term
        pairs = [
            (tmp[..., i : i + 1, :], self._mat[:, i].reshape(lead + (-1, 1)))
            for i in range(self.ibase.size)
        ]
        return U.dot_mod(pairs, p, p_hi, p_lo)

    def convert_single_limb(self, x: jnp.ndarray) -> jnp.ndarray:
        """Shortcut when the target base has one modulus — returns (..., 1, n)."""
        return self.convert(x)
