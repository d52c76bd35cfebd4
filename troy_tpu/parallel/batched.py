"""Batched ciphertext operations on stacked arrays.

TPU-native replacement for the reference's `_batched` API family
(SURVEY.md §2.10: every op has a `*_batched` variant driving one CUDA kernel
with a blockIdx.y batch index).  Here a batch of ciphertexts is ONE
(B, size, L, n) uint32 array and every kernel broadcasts over the leading
axis — batching is the default layout, not a separate API — and the batch
axis is also the data-parallel sharding axis for multi-chip meshes
(parallel/mesh.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.context import HeContext, ContextData
from ..core.evaluator import Evaluator
from ..core.ciphertext import Ciphertext
from ..core.params import SchemeType
from ..ops import rp as R


class BatchedEvaluator:
    """Operates on raw stacked ciphertext arrays (B, size, L, n) at one
    chain level; pure-jittable step builders for benches and meshes."""

    def __init__(self, evaluator: Evaluator, cd: ContextData):
        self.ev = evaluator
        self.cd = cd
        # materialize every lazy table now: the step builders below are
        # traced by caller-side jit, and building packs inside a trace would
        # leak tracers into the long-lived caches
        cd.qtab()
        if cd.parms.scheme == SchemeType.BFV:
            cd.rns_tool.materialize()
        if evaluator.context.using_keyswitching:
            evaluator._switch_tables(cd)

    # -- stacking helpers ---------------------------------------------------
    @staticmethod
    def stack(cts: list[Ciphertext]) -> jnp.ndarray:
        return jnp.stack([ct.data for ct in cts])

    def unstack(self, data: jnp.ndarray, proto: Ciphertext) -> list[Ciphertext]:
        out = []
        for i in range(data.shape[0]):
            ct = proto.clone()
            ct.data = data[i]
            ct.seed = None
            out.append(ct)
        return out

    # -- batched primitives (pure, traceable) -------------------------------
    def add(self, d1: jnp.ndarray, d2: jnp.ndarray) -> jnp.ndarray:
        return R.add(d1, d2, self.cd.qtab())

    def multiply(self, d1: jnp.ndarray, d2: jnp.ndarray | None = None) -> jnp.ndarray:
        if self.cd.parms.scheme != SchemeType.BFV:
            qtab = self.cd.qtab()
            return (R.dyadic_square(d1, qtab) if d2 is None
                    else R.dyadic_convolute(d1, d2, qtab))
        return self.ev.bfv_multiply_impl(self.cd, d1, d2)

    def relinearize(self, d3: jnp.ndarray, rlk_key: jnp.ndarray,
                    ntt_form: bool) -> jnp.ndarray:
        """d3: (..., 3, [2,] L, n) -> (..., 2, [2,] L, n) (the optional
        axis is the wide path's (hi, lo) word pair, ops/rp.py)."""
        import jax.lax as lax

        qtab = self.cd.qtab()
        pax = R.poly_axis(qtab)
        target = jnp.take(d3, 2, axis=pax)
        if ntt_form:
            target = R.ntt_inverse(target, qtab)
        sw = self.ev._switch_key_impl(self.cd, target, rlk_key, out_ntt=ntt_form)
        keep = lax.slice_in_dim(d3, 0, 2, axis=pax)
        return R.add(keep, sw, qtab)

    # -- fused step builders ------------------------------------------------
    def build_mul_relin_step(self, rlk_key: jnp.ndarray):
        """Returns a pure fn (d1, d2, keys) -> (..., 2, L, n): the flagship
        multiply+relinearize benchmark step."""
        ntt_form = self.cd.parms.scheme in (SchemeType.CKKS, SchemeType.BGV)

        def step(d1, d2, keys):
            prod = self.multiply(d1, d2)
            return self.relinearize(prod, keys, ntt_form)

        return step
