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
from ..ops.jitu import safe_stack


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
    # Every builder returns a PURE jittable fn over raw stacked arrays; bench
    # scripts (bench.py, scripts/app_bench.py) and the mesh tests import
    # these instead of assembling ad-hoc closures (round-4 uniform surface;
    # ref: the reference's `_batched` method family, src/evaluator.h).
    def _ntt_form(self) -> bool:
        return self.cd.parms.scheme in (SchemeType.CKKS, SchemeType.BGV)

    def build_mul_relin_step(self, rlk_key: jnp.ndarray):
        """Returns a pure fn (d1, d2, keys) -> (..., 2, L, n): the flagship
        multiply+relinearize benchmark step."""
        ntt_form = self._ntt_form()

        def step(d1, d2, keys):
            prod = self.multiply(d1, d2)
            return self.relinearize(prod, keys, ntt_form)

        return step

    def build_square_relin_step(self, rlk_key: jnp.ndarray):
        """(d, keys) -> (..., 2, L, n): homomorphic square + relinearize."""
        ntt_form = self._ntt_form()

        def step(d, keys):
            return self.relinearize(self.multiply(d, None), keys, ntt_form)

        return step

    # -- galois rotations ----------------------------------------------------
    def _galois_round(self, d, elt: int, key, ntt_form: bool, tool):
        """One batched apply_galois + keyswitch round on raw arrays (the
        batch-axis-aware mirror of Evaluator._apply_galois_impl)."""
        qtab = self.cd.qtab()
        pax = R.poly_axis(qtab)
        c0 = jnp.take(d, 0, axis=pax)
        c1 = jnp.take(d, 1, axis=pax)
        if ntt_form:
            c0g = tool.apply_ntt(c0, elt)
            target = R.ntt_inverse(tool.apply_ntt(c1, elt), qtab)
        else:
            c0g = tool.apply_coeff(c0, elt, qtab)
            target = tool.apply_coeff(c1, elt, qtab)
        sw = self.ev._switch_key_impl(self.cd, target, key, out_ntt=ntt_form)
        sw0 = jnp.take(sw, 0, axis=pax)
        sw1 = jnp.take(sw, 1, axis=pax)
        return safe_stack([R.add(sw0, c0g, qtab), sw1], axis=pax)

    def galois_elements_for_steps(self, steps: int) -> list[int]:
        """Galois elements for a rotation, NAF-decomposed for non-powers of
        two exactly like the object API (ref: evaluator_keyswitching.cu:
        276-292).  One element per keyswitch round."""
        from ..utils.numth import naf
        from ..ops.galois import GaloisTool

        n = self.cd.parms.poly_modulus_degree
        if steps == 0:
            raise ValueError("[BatchedEvaluator] rotation step must be nonzero")
        comps = ([steps] if steps > 0 and steps & (steps - 1) == 0
                 else [s for s in naf(steps) if s])
        return [GaloisTool.get_element_from_step(s, n) for s in comps]

    def build_galois_step(self, elts: list[int]):
        """(d, keys) -> d applying the given galois elements in sequence;
        `keys` is a tuple of per-element keyswitch key arrays (glk.key(elt))."""
        from ..ops.galois import GaloisTool

        ntt_form = self._ntt_form()
        tool = GaloisTool.for_context(self.cd)
        for elt in elts:  # materialize permutation tables before tracing
            if ntt_form and elt not in tool._ntt_tables:
                tool._ntt_tables[elt] = tool._build_ntt(elt)
            if not ntt_form and elt not in tool._coeff_tables:
                tool._coeff_tables[elt] = tool._build_coeff(elt)
        self.ev._switch_tables(self.cd)

        def step(d, keys):
            for elt, k in zip(elts, keys):
                d = self._galois_round(d, elt, k, ntt_form, tool)
            return d

        return step

    def build_rotate_rows_step(self, steps: int):
        """(d, keys) -> d: batched rotate_rows(steps) (BFV/BGV row rotation,
        ref: evaluator_keyswitching.cu:263).  Returns (step, elts); pass
        keys = tuple(glk.key(e) for e in elts)."""
        elts = self.galois_elements_for_steps(steps)
        return self.build_galois_step(elts), elts

    def build_rotate_columns_step(self):
        """(d, keys) -> d: batched rotate_columns / complex_conjugate
        (the conjugation element)."""
        from ..ops.galois import GaloisTool

        n = self.cd.parms.poly_modulus_degree
        elts = [GaloisTool.conjugate_element(n)]
        return self.build_galois_step(elts), elts

    # -- modswitch / rescale -------------------------------------------------
    def build_rescale_step(self):
        """(d) -> d at the next level: CKKS divide-and-round by q_last
        (ref: evaluator_modswitch.cu:445).  Scale/parms bookkeeping is the
        caller's (object-API) concern; this is the raw kernel."""
        if self.cd.parms.scheme != SchemeType.CKKS:
            raise ValueError("[BatchedEvaluator.build_rescale_step] CKKS only")
        if self.cd.is_last():
            raise ValueError("[BatchedEvaluator.build_rescale_step] last level")
        cd = self.cd
        cd.rns_tool.materialize()
        qtab = cd.qtab()
        return lambda d: cd.rns_tool.divide_and_round_q_last_ntt(d, qtab)

    def build_mod_switch_step(self):
        """(d) -> d at the next level (ref: evaluator_modswitch.cu:14).
        BGV correction-factor bookkeeping stays object-level (the step
        returns raw residues only)."""
        if self.cd.is_last():
            raise ValueError("[BatchedEvaluator.build_mod_switch_step] last level")
        cd = self.cd
        scheme = cd.parms.scheme
        cd.rns_tool.materialize()
        qtab = cd.qtab()
        if scheme == SchemeType.BFV:
            return lambda d: cd.rns_tool.divide_and_round_q_last(d)
        if scheme == SchemeType.CKKS:
            return lambda d: d[..., :-1, :]
        return lambda d: cd.rns_tool.mod_t_and_divide_q_last_ntt(d, qtab)


class BatchedClient:
    """Device-batched CLIENT operations (encrypt / decrypt / encode) as pure
    jittable step builders on stacked (B, ...) arrays — the TPU counterpart
    of the reference's device-side client bench columns (ref:
    test/bench/he_operations.cu:15-50; device encryption kernels
    src/utils/rlwe.cu:1-477, encoder kernels src/batch_encoder.cu:169-228).

    Encryption steps draw fresh per-iteration randomness by folding a
    data-dependent probe of the chained state into the PRF base keys, so a
    chained fori_loop times genuinely fresh encryptions (nothing is
    loop-invariant)."""

    def __init__(self, context: HeContext, cd: ContextData):
        self.context = context
        self.cd = cd
        cd.qtab()
        if cd.parms.scheme == SchemeType.BFV:
            cd.rns_tool.materialize()
            cd.scaler  # materialize the lazy scale-up tables before tracing

    @property
    def _ntt_form(self) -> bool:
        return self.cd.parms.scheme in (SchemeType.CKKS, SchemeType.BGV)

    @staticmethod
    def _probe(cur) -> jnp.ndarray:
        """One u32 scalar of the chained state (data dependence anchor)."""
        return cur.reshape(-1)[0]

    def _payload(self, plain_data, plain_ntt: bool, is_rns: bool):
        from ..core.encryptor import Encryptor
        from ..ops import u32 as U

        return Encryptor._plain_payload(self.cd, plain_data, U.u32(1),
                                        is_rns, plain_ntt)

    # -- encryption ---------------------------------------------------------
    def build_encrypt_asymmetric_step(self, base_keys, plain_data=None,
                                      plain_ntt: bool = False,
                                      is_rns: bool = False):
        """(cur, pk_data) -> fresh batch of asymmetric encryptions of
        `plain_data` (or of zero), shape (B, 2, [2,] L, n)."""
        from ..core.rlwe import _asymmetric_combine, _noise_from_keys
        from ..utils.random import ternary_from_keys, fold_in_keys

        cd = self.cd
        qtab = cd.qtab()
        n = cd.parms.poly_modulus_degree
        ntt_form = self._ntt_form
        m = (None if plain_data is None
             else self._payload(plain_data, plain_ntt, is_rns))

        def step(cur, pk):
            B = cur.shape[0]
            kc = fold_in_keys(base_keys, self._probe(cur))
            u = ternary_from_keys(fold_in_keys(kc, 0), (B, n), qtab)
            e0 = _noise_from_keys(cd, fold_in_keys(kc, 1), qtab, (B, n))
            e1 = _noise_from_keys(cd, fold_in_keys(kc, 2), qtab, (B, n))
            out = _asymmetric_combine(cd, pk, u, e0, e1, ntt_form)
            out = jnp.moveaxis(out, 0, 1)  # (2, B, ...) -> (B, 2, ...)
            if m is not None:
                out = out.at[:, 0].set(R.add(out[:, 0], m, qtab))
            return out

        return step

    def build_encrypt_symmetric_step(self, base_keys, plain_data=None,
                                     plain_ntt: bool = False,
                                     is_rns: bool = False):
        """(cur, sk_data) -> fresh batch of symmetric encryptions."""
        from ..core.rlwe import _symmetric_combine, _noise_from_keys
        from ..utils.random import uniform_from_keys, fold_in_keys

        cd = self.cd
        qtab = cd.qtab()
        L = cd.coeff_modulus_size
        n = cd.parms.poly_modulus_degree
        ntt_form = self._ntt_form
        m = (None if plain_data is None
             else self._payload(plain_data, plain_ntt, is_rns))

        def step(cur, sk):
            B = cur.shape[0]
            kc = fold_in_keys(base_keys, self._probe(cur))
            a = uniform_from_keys(fold_in_keys(kc, 0), (B, L, n), qtab)
            e = _noise_from_keys(cd, fold_in_keys(kc, 1), qtab, (B, n))
            out = jnp.moveaxis(_symmetric_combine(cd, sk, a, e, ntt_form),
                               0, 1)
            if m is not None:
                out = out.at[:, 0].set(R.add(out[:, 0], m, qtab))
            return out

        return step

    # -- decryption ---------------------------------------------------------
    def build_decrypt_step(self, sk_pows, size: int = 2, inv_cf: int = 1):
        """(cur) -> decrypted plaintext batch.

        cur: (B, size, [2,] L, n) ciphertexts at this level; sk_pows:
        [s, s^2, ...] at KEY level (sliced to this level's limbs inside).
        Output: BFV/BGV (B, n) mod-t coefficients; CKKS (B, [2,] L, n)
        NTT-form residues (the scheme's plaintext contract)."""
        from ..ops import u32 as U

        cd = self.cd
        qtab = cd.qtab()
        L = cd.coeff_modulus_size
        scheme = cd.parms.scheme
        ntt_form = self._ntt_form

        def phase(cur):
            if ntt_form:
                acc = cur[:, 0]
                for i in range(1, size):
                    acc = R.add(acc, R.dyadic_product(
                        cur[:, i], sk_pows[i - 1][..., :L, :], qtab), qtab)
                return acc
            acc = None
            for i in range(1, size):
                ci = R.ntt_forward(cur[:, i], qtab)
                term = R.dyadic_product(ci, sk_pows[i - 1][..., :L, :], qtab)
                acc = term if acc is None else R.add(acc, term, qtab)
            return R.add(R.ntt_inverse(acc, qtab), cur[:, 0], qtab)

        if scheme == SchemeType.BFV:
            return lambda cur: cd.rns_tool.decrypt_scale_and_round(phase(cur))
        if scheme == SchemeType.CKKS:
            return phase
        t = cd.parms.plain_modulus

        def bgv_step(cur):
            ph = R.ntt_inverse(phase(cur), qtab)
            m = cd.rns_tool.decrypt_mod_t(ph)
            return U.mul_mod(m, U.u32(inv_cf), U.u32(t.value),
                             U.u32(t.ratio64_hi), U.u32(t.ratio64_lo))

        return bgv_step

    # -- SIMD batch encode / decode (BFV/BGV mod-t ring) --------------------
    def build_batch_encode_step(self, encoder):
        """(vals) -> coefficient encodings: vals (B, n) u32 slot values
        mod t; output (B, n) u32 coefficients (an INTT mod t after the
        matrix_reps index map, ref: batch_encoder.cu:169)."""
        from ..ops.ntt import ntt_inverse

        pos = jnp.asarray(encoder._slot_to_pos)
        ttab = encoder.tables.pack()

        def step(vals):
            slots = jnp.zeros_like(vals).at[..., pos].set(vals)
            return ntt_inverse(slots[..., None, :], ttab)[..., 0, :]

        return step

    def build_batch_decode_step(self, encoder):
        """(coeffs) -> slot values (the forward NTT mod t + gather)."""
        from ..ops.ntt import ntt_forward

        pos = jnp.asarray(encoder._slot_to_pos)
        ttab = encoder.tables.pack()

        def step(coeffs):
            evals = ntt_forward(coeffs[..., None, :], ttab)[..., 0, :]
            return evals[..., pos]

        return step
