"""Key generation.

TPU-native rebuild of reference src/key_generator.{h,cu}: ternary secret key
(NTT form), public key = symmetric zero encryption, keyswitching keys per
decomposition prime with the single-special-prime (GHS-style) layout:

  KSK_i = Enc_s(0) + (q_special mod q_i) * target * unit_i      (NTT form)

where unit_i places the term only in RNS limb i
(ref: key_generator.cu:136-157).  All decomposition keys are generated as one
batched (decomp, 2, L_key, n) tensor — the reference's per-key loop becomes a
leading axis.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .context import HeContext, ContextData
from .params import SchemeType
from .keys import SecretKey, PublicKey, KSwitchKeys, RelinKeys, GaloisKeys
from .ciphertext import Ciphertext
from .rlwe import encrypt_zero_symmetric, _noise
from ..ops import ntt as NTT, poly as P, u32 as U, u64 as W, rp as R
from ..ops.jitu import safe_stack
from ..utils.random import RandomGenerator
from ..utils import numth


class KeyGenerator:
    """ref: key_generator.h:112"""

    def __init__(self, context: HeContext, sk: SecretKey | None = None,
                 prng: RandomGenerator | None = None):
        self.context = context
        # domain-separated from the Encryptor's stream (see encryptor.py)
        self.prng = prng or RandomGenerator(context.seed, domain="keygen")
        cd = context.key_context_data()
        if sk is not None:
            self._sk = sk
        else:
            qtab = cd.qtab()
            n = cd.parms.poly_modulus_degree
            s = self.prng.sample_ternary((n,), qtab)
            self._sk = SecretKey(R.ntt_forward(s, qtab), cd.parms_id)
        self._sk_powers: dict[int, jnp.ndarray] = {1: self._sk.data}

    @property
    def secret_key(self) -> SecretKey:
        return self._sk

    def secret_key_power(self, k: int) -> jnp.ndarray:
        """s^k in NTT form at key level (cached; ref: key_generator.cu:84)."""
        if k not in self._sk_powers:
            cd = self.context.key_context_data()
            qtab = cd.qtab()
            prev = self.secret_key_power(k - 1)
            self._sk_powers[k] = R.dyadic_product(prev, self._sk.data, qtab)
        return self._sk_powers[k]

    # ------------------------------------------------------------------
    def create_public_key(self, save_seed: bool = False) -> PublicKey:
        cd = self.context.key_context_data()
        seed = self.prng.new_seed() if save_seed else None
        data = encrypt_zero_symmetric(cd, self._sk.data, self.prng,
                                      ntt_form=True, seed=seed)
        ct = Ciphertext(data, cd.parms_id, is_ntt_form=True, seed=seed)
        return PublicKey(ct)

    # ------------------------------------------------------------------
    def _generate_one_kswitch_key(self, target_ntt: jnp.ndarray) -> jnp.ndarray:
        """target_ntt: ([2,] L_key, n) NTT-form poly to switch from.
        Returns (decomp, 2, [2,] L_key, n) (ref: key_generator.cu:136-157)."""
        cd = self.context.key_context_data()
        if not self.context.using_keyswitching:
            raise ValueError("[KeyGenerator] context has no special prime")
        qtab = cd.qtab()
        L_key = cd.coeff_modulus_size
        n = cd.parms.poly_modulus_degree
        decomp = L_key - 1
        # batched zero encryptions at key level, NTT form
        a = self.prng.sample_uniform((decomp, L_key, n), qtab)
        e = _noise(cd, self.prng, qtab, (decomp, n))
        from .rlwe import _jit

        fn = _jit(cd, "kskgen", lambda: (
            lambda tgt, aa, ee, s: self._kswitch_combine(cd, tgt, aa, ee, s)))
        return fn(target_ntt, a, e, self._sk.data)

    def _kswitch_combine(self, cd: ContextData, target_ntt, a, e, s):
        """Pure traceable ksk assembly (jitted once per key level)."""
        qtab = cd.qtab()
        L_key = cd.coeff_modulus_size
        decomp = L_key - 1
        q_sp = cd.parms.coeff_modulus[-1].value
        c0 = R.negate(
            R.add(R.dyadic_product(a, s[None], qtab),
                  R.ntt_forward(e, qtab), qtab),
            qtab,
        )
        # add (q_sp mod q_i) * target at limb i of key i only
        factor_vals = [q_sp % m.value for m in cd.parms.coeff_modulus]
        if cd.wide:
            from ..rns.rns_base import _pair_cols

            fh, fl = _pair_cols(factor_vals)
            qh, ql = qtab["q_hi"][:, None], qtab["q_lo"][:, None]
            r4 = (qtab["r3"][:, None], qtab["r2"][:, None],
                  qtab["r1"][:, None], qtab["r0"][:, None])
            term = R.pair(*W.mul_mod64(*R.hi_lo(target_ntt), fh, fl,
                                       qh, ql, *r4))  # (2, L_key, n)
            mask = jnp.eye(decomp, L_key, dtype=bool)[:, None, :, None]
        else:
            term = U.mul_mod(
                target_ntt, jnp.asarray(np.array(factor_vals, np.uint32))[:, None],
                qtab["q"][:, None], qtab["ratio_hi"][:, None],
                qtab["ratio_lo"][:, None],
            )  # (L_key, n)
            mask = jnp.eye(decomp, L_key, dtype=bool)[:, :, None]
        c0 = jnp.where(mask, R.add(c0, term[None], qtab), c0)
        return safe_stack([c0, a], axis=1)

    # ------------------------------------------------------------------
    def create_relin_keys(self, max_power: int = 2) -> RelinKeys:
        """Switch keys for s^2 .. s^max_power (ref: key_generator.cu:191)."""
        keys = {}
        for p in range(2, max_power + 1):
            keys[p - 2] = self._generate_one_kswitch_key(self.secret_key_power(p))
        return RelinKeys(keys, self.context.key_parms_id)

    def create_galois_keys_from_elements(self, elements: list[int]) -> GaloisKeys:
        """Keys for x -> x^g (ref: key_generator.h:79-92)."""
        from ..ops.galois import GaloisTool

        cd = self.context.key_context_data()
        tool = GaloisTool.for_context(cd)
        keys = {}
        for g in elements:
            sg = tool.apply_ntt(self._sk.data, g)
            keys[g] = self._generate_one_kswitch_key(sg)
        return GaloisKeys(keys, self.context.key_parms_id)

    def create_galois_keys_from_steps(self, steps: list[int]) -> GaloisKeys:
        from ..ops.galois import GaloisTool

        cd = self.context.key_context_data()
        n = cd.parms.poly_modulus_degree
        elems = sorted({GaloisTool.get_element_from_step(s, n) for s in steps})
        return self.create_galois_keys_from_elements(elems)

    def create_galois_keys(self, include_conjugate: bool = True) -> GaloisKeys:
        """Power-of-two rotation steps plus conjugation — the default set
        (ref: galois.h get_elements_all)."""
        cd = self.context.key_context_data()
        n = cd.parms.poly_modulus_degree
        steps: list[int] = []
        step = 1
        while step < n // 2:
            steps += [step, -step]
            step *= 2
        from ..ops.galois import GaloisTool

        elems = sorted({GaloisTool.get_element_from_step(s, n) for s in steps})
        if include_conjugate:
            elems.append(2 * n - 1)
        return self.create_galois_keys_from_elements(sorted(set(elems)))

    def create_automorphism_keys(self) -> GaloisKeys:
        """Keys for the PackLWEs trace: elements 2^j + 1, 1 <= j <= log2 n
        (ref: key_generator.h create_galois_keys for pack_lwe)."""
        cd = self.context.key_context_data()
        n = cd.parms.poly_modulus_degree
        elems = [(1 << j) + 1 for j in range(1, n.bit_length())]
        return self.create_galois_keys_from_elements(elems)

    def create_keyswitching_key(self, new_key: SecretKey) -> KSwitchKeys:
        """Key to switch ciphertexts under self's key to `new_key`: generated
        by the *new* key's holder over the old secret (ref:
        key_generator.cu:159 create_keyswitching_key semantics)."""
        gen_new = KeyGenerator(self.context, sk=new_key, prng=self.prng)
        return KSwitchKeys(
            {0: gen_new._generate_one_kswitch_key(self._sk.data)},
            self.context.key_parms_id,
        )
