"""Encryptor.

TPU-native rebuild of reference src/encryptor.{h,cu}: asymmetric (public-key)
and symmetric (secret-key, seed-compressible) encryption for all three
schemes.  Scheme plaintext fusion (encryptor.cu encrypt_internal):

  BFV : zero-ct (coeff domain) + scale_up(m)         [m mod t, coeff domain]
  CKKS: zero-ct (NTT domain)  + m                    [m already RNS/NTT]
  BGV : zero-ct (NTT domain)  + NTT(centralize(m))   [m mod t]
"""

from __future__ import annotations

import jax.numpy as jnp

from .context import HeContext, ContextData
from .params import SchemeType, ParmsID
from .plaintext import Plaintext
from .ciphertext import Ciphertext
from .keys import PublicKey, SecretKey
from .rlwe import encrypt_zero_symmetric, encrypt_zero_asymmetric
from ..ops import ntt as NTT, u32 as U, rp as R
from ..utils.random import RandomGenerator


class Encryptor:
    def __init__(self, context: HeContext, pk: PublicKey | None = None,
                 sk: SecretKey | None = None,
                 prng: RandomGenerator | None = None):
        self.context = context
        self.pk = pk
        self.sk = sk
        # domain separation: a shared context seed (reproducible benchmarks)
        # must not give the Encryptor the same PRF stream as the KeyGenerator
        self.prng = prng or RandomGenerator(context.seed, domain="encryptor")

    # ------------------------------------------------------------------
    def _level(self, parms_id: ParmsID | None) -> ContextData:
        pid = parms_id or self.context.first_parms_id
        return self.context.get_context_data(pid)

    def _use_special_prime(self, cd: ContextData) -> bool:
        """Special-prime encryption (ref: encryptor.cu:264-301,
        test/special_prime_for_encryption.cu): encrypt at the key level then
        divide by the special prime, shrinking fresh noise by ~q_special."""
        return (cd.parms.use_special_prime_for_encryption
                and cd.parms_id == self.context.first_parms_id
                and self.context.using_keyswitching)

    def _divide_special(self, data, key_cd: ContextData, ntt_form: bool):
        from .rlwe import _jit

        scheme = key_cd.parms.scheme
        key_cd.rns_tool.materialize()
        key_cd.qtab()
        if not ntt_form:
            fn = _jit(key_cd, "divspecial0", lambda: (
                lambda d: key_cd.rns_tool.divide_and_round_q_last(d)))
        elif scheme == SchemeType.BGV:
            fn = _jit(key_cd, "divspecial_bgv", lambda: (
                lambda d: key_cd.rns_tool.mod_t_and_divide_q_last_ntt(
                    d, key_cd.qtab())))
        else:
            fn = _jit(key_cd, "divspecial1", lambda: (
                lambda d: key_cd.rns_tool.divide_and_round_q_last_ntt(
                    d, key_cd.qtab())))
        return fn(data)

    def encrypt_zero_asymmetric(self, parms_id: ParmsID | None = None) -> Ciphertext:
        if self.pk is None:
            raise ValueError("[Encryptor] no public key set")
        cd = self._level(parms_id)
        ntt_form = cd.parms.scheme in (SchemeType.CKKS, SchemeType.BGV)
        if self._use_special_prime(cd):
            key_cd = self.context.key_context_data()
            data = encrypt_zero_asymmetric(key_cd, self.pk.data(), self.prng, ntt_form)
            data = self._divide_special(data, key_cd, ntt_form)
            ct = Ciphertext(data, cd.parms_id, is_ntt_form=ntt_form)
            if cd.parms.scheme == SchemeType.BGV:
                t = cd.parms.plain_modulus.value
                q_sp = key_cd.parms.coeff_modulus[-1].value
                from ..utils import numth

                ct.correction_factor = numth.invert_mod(q_sp % t, t)
            return ct
        data = encrypt_zero_asymmetric(cd, self.pk.data(), self.prng, ntt_form)
        return Ciphertext(data, cd.parms_id, is_ntt_form=ntt_form)

    def encrypt_zero_symmetric(self, parms_id: ParmsID | None = None,
                               save_seed: bool = False) -> Ciphertext:
        if self.sk is None:
            raise ValueError("[Encryptor] no secret key set")
        cd = self._level(parms_id)
        ntt_form = cd.parms.scheme in (SchemeType.CKKS, SchemeType.BGV)
        if self._use_special_prime(cd):
            # seed compression is incompatible with the post-encryption
            # division (c1 is no longer the raw PRNG output)
            key_cd = self.context.key_context_data()
            data = encrypt_zero_symmetric(key_cd, self.sk.data, self.prng,
                                          ntt_form, None)
            data = self._divide_special(data, key_cd, ntt_form)
            ct = Ciphertext(data, cd.parms_id, is_ntt_form=ntt_form)
            if cd.parms.scheme == SchemeType.BGV:
                t = cd.parms.plain_modulus.value
                q_sp = key_cd.parms.coeff_modulus[-1].value
                from ..utils import numth

                ct.correction_factor = numth.invert_mod(q_sp % t, t)
            return ct
        seed = self.prng.new_seed() if save_seed else None
        data = encrypt_zero_symmetric(cd, self.sk.data, self.prng, ntt_form, seed)
        return Ciphertext(data, cd.parms_id, is_ntt_form=ntt_form, seed=seed)

    # ------------------------------------------------------------------
    @staticmethod
    def _plain_payload(cd: ContextData, plain_data, cf_u32, is_rns: bool,
                       plain_ntt: bool):
        """Pure traceable message payload in the ciphertext's domain
        (shared by _add_plain_impl and the device-batched encrypt steps,
        parallel/batched.BatchedClient)."""
        scheme = cd.parms.scheme
        qtab = cd.qtab()
        if scheme == SchemeType.BFV:
            return plain_data if is_rns else cd.scaler.scale_up(plain_data[0])
        if scheme == SchemeType.CKKS:
            return plain_data if plain_ntt else R.ntt_forward(plain_data, qtab)
        # BGV: special-prime encryption divided the phase by
        # q_special — scale the payload to match (ref: encryptor.cu)
        t = cd.parms.plain_modulus
        pm = U.mul_mod(plain_data[0], cf_u32, U.u32(t.value),
                       U.u32(t.ratio64_hi), U.u32(t.ratio64_lo))
        return R.ntt_forward(_centralize_bgv(cd, pm), qtab)

    def _add_plain_impl(self, cd: ContextData, data, plain_data, cf_u32,
                        is_rns: bool, plain_ntt: bool):
        """Pure traceable message add onto a zero encryption."""
        m = self._plain_payload(cd, plain_data, cf_u32, is_rns, plain_ntt)
        return data.at[0].set(R.add(data[0], m, cd.qtab()))

    def _add_plain(self, ct: Ciphertext, plain: Plaintext, cd: ContextData) -> Ciphertext:
        from .rlwe import _jit

        scheme = cd.parms.scheme
        cd.rns_tool.materialize()
        cd.qtab()
        if scheme == SchemeType.CKKS and plain.parms_id != cd.parms_id:
            raise ValueError("[Encryptor] CKKS plaintext level mismatch")
        # materialize lazy scalers before tracing (tracer-leak safety)
        if scheme == SchemeType.BFV:
            cd.scaler
        elif scheme == SchemeType.BGV and getattr(cd, "_bgv_centralizer",
                                                  None) is None:
            from .evaluator import _make_centralizer

            cd._bgv_centralizer = _make_centralizer(cd)
        if not cd.wide:
            cd.base_q.pack()
        is_rns = (plain.data.ndim >= 3 if cd.wide
                  else plain.coeff_modulus_size > 1)
        plain_ntt = bool(plain.is_ntt_form)
        cf = (ct.correction_factor % cd.parms.plain_modulus.value
              if scheme == SchemeType.BGV else 1)
        fn = _jit(cd, f"encmsg{int(is_rns)}{int(plain_ntt)}", lambda: (
            lambda d, p, c: self._add_plain_impl(cd, d, p, c, is_rns,
                                                 plain_ntt)))
        ct.data = fn(ct.data, plain.data, U.u32(cf))
        if scheme == SchemeType.CKKS:
            ct.scale = plain.scale
        return ct

    def encrypt_asymmetric(self, plain: Plaintext,
                           parms_id: ParmsID | None = None) -> Ciphertext:
        cd = self._level(
            plain.parms_id if self.context.scheme == SchemeType.CKKS else parms_id
        )
        ct = self.encrypt_zero_asymmetric(cd.parms_id)
        return self._add_plain(ct, plain, cd)

    def encrypt_symmetric(self, plain: Plaintext,
                          parms_id: ParmsID | None = None,
                          save_seed: bool = False) -> Ciphertext:
        cd = self._level(
            plain.parms_id if self.context.scheme == SchemeType.CKKS else parms_id
        )
        ct = self.encrypt_zero_symmetric(cd.parms_id, save_seed)
        # adding the message into c0 leaves the seeded c1 untouched
        return self._add_plain(ct, plain, cd)

    # -- batched variants (ref: encryptor.h *_batched) ----------------------
    def encrypt_asymmetric_batched(self, plains: list[Plaintext],
                                   parms_id: ParmsID | None = None) -> list[Ciphertext]:
        return [self.encrypt_asymmetric(p, parms_id) for p in plains]

    def encrypt_symmetric_batched(self, plains: list[Plaintext],
                                  parms_id: ParmsID | None = None,
                                  save_seed: bool = False) -> list[Ciphertext]:
        return [self.encrypt_symmetric(p, parms_id, save_seed) for p in plains]


def _centralize_bgv(cd: ContextData, m_mod_t):
    """Centered lift of a mod-t polynomial into the level's RNS base
    (shared by BGV encrypt/add_plain; ref: scaling_variant centralize)."""
    scaler = getattr(cd, "_bgv_centralizer", None)
    if scaler is None:
        from .evaluator import _make_centralizer

        scaler = _make_centralizer(cd)
        cd._bgv_centralizer = scaler
    return scaler.centralize(m_mod_t)
