"""Modulus-switching chain: ContextData + HeContext.

TPU-native rebuild of reference src/context_data.{h,cu} + src/he_context.{h,cu}.
Each ContextData bundles the per-level precomputed machinery (NTT tables,
RNSTool, BFV scaler); HeContext builds the chain key-level -> first -> ... ->
last by dropping the trailing prime (he_context.cu:5-44).

TPU-specific departures from the reference:
  * no to_device_inplace cascade — tables are numpy until first use, then
    cached on device as jnp pytrees (JAX manages placement),
  * the ParmsID doubles as the jit-compilation cache key: every evaluator op
    compiles once per (level shape) and is reused across calls
    (SURVEY.md §7 hard part (f)).
"""

from __future__ import annotations

import numpy as np

from .modulus import Modulus
from .params import EncryptionParameters, ParmsID, SchemeType
from .coeff_modulus import CoeffModulus, SecurityLevel
from ..ops.ntt import NTTTables
from ..rns.rns_base import RNSBase
from ..rns.rns_tool import RNSTool
from ..rns.scaling import BFVScaler
from ..utils import numth


from dataclasses import dataclass, replace as _dc_replace


@dataclass(frozen=True)
class EncryptionParameterQualifiers:
    """Feature flags for a validated parameter set (ref:
    encryption_parameters.h:277).  parameter_error is always "Success" on a
    constructed context — invalid parameters raise instead (the error names
    match the reference's EncryptionParameterErrorType values)."""

    parameter_error: str = "Success"
    using_fft: bool = True
    using_ntt: bool = True
    using_batching: bool = False
    using_fast_plain_lift: bool = False
    using_descending_modulus_chain: bool = False
    security_level: SecurityLevel = SecurityLevel.Nil

    def parameters_set(self) -> bool:
        return self.parameter_error == "Success"


class ContextData:
    """Per-level bundle (ref: context_data.h:14-165)."""

    def __init__(self, parms: EncryptionParameters, chain_index: int = 0):
        self.parms = parms
        self.chain_index = chain_index
        self.prev: ContextData | None = None   # towards key level (more primes)
        self.next: ContextData | None = None   # towards last level (fewer primes)

        n = parms.poly_modulus_degree
        self.log_n = n.bit_length() - 1
        moduli = parms.coeff_modulus
        # residue width: all primes on the u32 fast path, or all on the wide
        # u32-pair path (SEAL-default 40-60-bit sets; ref: the reference's
        # single <=61-bit width, src/utils/basics.h:579)
        self.wide = any(not m.fits_fast_path() for m in moduli)
        # qualifiers (ref: encryption_parameters.h:277 validate())
        for m in moduli:
            if not m.is_prime:
                raise ValueError(f"[ContextData] coeff modulus {m.value} not prime")
            if self.wide:
                if not m.fits_wide_path():
                    raise ValueError(
                        f"[ContextData] coeff modulus {m.value} outside the "
                        "wide-path range (2^30, 2^61) — widths cannot mix"
                    )
            elif not m.fits_fast_path():
                raise ValueError(
                    f"[ContextData] coeff modulus {m.value} outside the u32 "
                    "fast-path range [2^28, 2^30)"
                )
            if m.value % (2 * n) != 1:
                raise ValueError(f"[ContextData] modulus {m.value} is not NTT-friendly")
        if self.wide and parms.plain_modulus.value >= (1 << 31):
            raise ValueError(
                "[ContextData] plain modulus must be < 2^31 (use ring2k for "
                "wider plaintext moduli)")
        t = parms.plain_modulus
        if t.value and parms.scheme in (SchemeType.BFV, SchemeType.BGV):
            if any(m.value == t.value for m in moduli):
                raise ValueError("[ContextData] plain modulus equals a coeff modulus")

        self.base_q = RNSBase(moduli)
        self.total_coeff_modulus: int = self.base_q.prod
        # heavy per-level machinery is built lazily (most chain levels are
        # never touched; the reference pays this cost eagerly in create())
        self._ntt_tables: NTTTables | None = None
        self._rns_tool: RNSTool | None = None
        self._scaler: BFVScaler | None = None
        # SIMD batching support (ref: batch_encoder.h:55)
        self.simd_supported = bool(
            t.value and t.is_prime and t.value % (2 * n) == 1
        )
        # queryable qualifiers (ref: encryption_parameters.h:277
        # EncryptionParameterQualifiers, context_data.h:61).  Unlike the
        # reference — which records an error code and hands back a context
        # you must test with parameters_set() — invalid parameters here
        # raise at construction, so a constructed ContextData always carries
        # parameter_error == "Success"; the flags remain useful for feature
        # queries.
        self.qualifiers = EncryptionParameterQualifiers(
            using_batching=(self.simd_supported
                            or parms.scheme == SchemeType.CKKS),
            using_fast_plain_lift=bool(
                t.value and all(m.value > t.value for m in moduli)),
            using_descending_modulus_chain=all(
                moduli[i].value > moduli[i + 1].value
                for i in range(len(moduli) - 1)),
        )

    @property
    def ntt_tables(self):
        if self._ntt_tables is None:
            if self.wide:
                from ..ops.ntt64 import NTT64Tables

                self._ntt_tables = NTT64Tables(
                    self.log_n, [m.value for m in self.parms.coeff_modulus])
            else:
                self._ntt_tables = NTTTables(self.log_n, self.parms.coeff_modulus)
        return self._ntt_tables

    @property
    def rns_tool(self):
        if self._rns_tool is None:
            t = self.parms.plain_modulus
            use_t = (
                t if (t.value and self.parms.scheme != SchemeType.CKKS) else None
            )
            if self.wide:
                from ..rns.rns_tool64 import RNSTool64

                self._rns_tool = RNSTool64(self.log_n, self.base_q, use_t)
            else:
                self._rns_tool = RNSTool(self.log_n, self.base_q, use_t)
        return self._rns_tool

    @property
    def scaler(self):
        if self._scaler is None and self.parms.scheme == SchemeType.BFV and self.parms.plain_modulus.value:
            if self.wide:
                from ..rns.scaling import BFVScaler64

                self._scaler = BFVScaler64(self.base_q, self.parms.plain_modulus)
            else:
                self._scaler = BFVScaler(self.base_q, self.parms.plain_modulus)
        return self._scaler

    @property
    def parms_id(self) -> ParmsID:
        return self.parms.parms_id

    @property
    def coeff_modulus_size(self) -> int:
        return len(self.parms.coeff_modulus)

    def qtab(self) -> dict:
        """Device NTT-table pack for base q at this level."""
        return self.ntt_tables.pack()

    def is_last(self) -> bool:
        return self.next is None


class HeContext:
    """Chain of ContextData keyed by ParmsID (ref: he_context.{h,cu}).

    Convention (as in the reference / SEAL): the *last* modulus in
    parms.coeff_modulus is the special prime, used at the key level for
    keyswitching; the first (data) level drops it unless
    use_special_prime_for_encryption is set.
    """

    def __init__(self):
        self._data: dict[ParmsID, ContextData] = {}
        self.key_parms_id: ParmsID = ""
        self.first_parms_id: ParmsID = ""
        self.last_parms_id: ParmsID = ""
        self.using_keyswitching = False
        self.seed: int | None = None
        self.security_level = SecurityLevel.Nil

    @staticmethod
    def create(
        parms: EncryptionParameters,
        expand_mod_chain: bool = True,
        sec_level: SecurityLevel = SecurityLevel.Classical128,
        seed: int | None = None,
    ) -> "HeContext":
        ctx = HeContext()
        ctx.security_level = sec_level
        ctx.seed = seed
        n = parms.poly_modulus_degree
        total_bits = sum(m.bit_count for m in parms.coeff_modulus)
        if sec_level != SecurityLevel.Nil:
            if total_bits > CoeffModulus.max_bit_count(n, sec_level):
                raise ValueError(
                    f"[HeContext.create] log q = {total_bits} exceeds the "
                    f"{int(sec_level)}-bit security bound for n={n}"
                )

        key_data = ContextData(parms.clone(), chain_index=0)
        ctx._data[key_data.parms_id] = key_data
        ctx.key_parms_id = key_data.parms_id

        # first (data) level: drop the special prime (he_context.cu:95)
        chain: list[ContextData] = [key_data]
        if len(parms.coeff_modulus) > 1:
            ctx.using_keyswitching = True
            first_parms = parms.clone().set_coeff_modulus(parms.coeff_modulus[:-1])
            first = ContextData(first_parms)
            first.prev = key_data
            key_data.next = first
            ctx._data[first.parms_id] = first
            chain.append(first)
            if expand_mod_chain:
                cur = first
                while len(cur.parms.coeff_modulus) > 1:
                    nxt_parms = cur.parms.clone().set_coeff_modulus(
                        cur.parms.coeff_modulus[:-1]
                    )
                    nxt = ContextData(nxt_parms)
                    nxt.prev = cur
                    cur.next = nxt
                    ctx._data[nxt.parms_id] = nxt
                    chain.append(nxt)
                    cur = nxt
        else:
            ctx.using_keyswitching = False

        for i, cd in enumerate(chain[1:], start=1):
            cd.chain_index = i
        for cd in chain:
            cd.qualifiers = _dc_replace(cd.qualifiers, security_level=sec_level)
        ctx.first_parms_id = chain[1].parms_id if len(chain) > 1 else ctx.key_parms_id
        ctx.last_parms_id = chain[-1].parms_id
        return ctx

    def parameters_set(self) -> bool:
        """True when the context's parameters validated (ref:
        he_context.h:97).  Always True on a constructed context — invalid
        parameters raise from create() instead of producing an error
        context."""
        return self.first_context_data().qualifiers.parameters_set()

    # -- lookups (ref: he_context.h get_context_data) -----------------------
    def get_context_data(self, parms_id: ParmsID) -> ContextData:
        if parms_id not in self._data:
            raise KeyError(f"[HeContext] unknown parms_id {parms_id[:16]}...")
        return self._data[parms_id]

    def key_context_data(self) -> ContextData:
        return self._data[self.key_parms_id]

    def first_context_data(self) -> ContextData:
        return self._data[self.first_parms_id]

    def last_context_data(self) -> ContextData:
        return self._data[self.last_parms_id]

    @property
    def scheme(self) -> SchemeType:
        return self.key_context_data().parms.scheme
