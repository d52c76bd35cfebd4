"""Serialization: save/load for every HE object + optional compression.

TPU-native rebuild of reference src/utils/serialize.h + compression*.{h,cpp}
+ the per-object save/load methods (plaintext.h:210, ciphertext.h:154-288,
kswitch_keys.cu).  Little-endian binary framing over bytes objects / streams:

  * CompressionMode {Nil, Zstd, Zlib}: zstd binds the system libzstd via
    ctypes (the reference FetchContents zstd); zlib is the stdlib fallback;
    incompressible payloads fall back to raw (serialize.h:59-91 semantics),
  * seed-compressed symmetric ciphertexts store (c0, seed) only; c1 is
    regenerated deterministically on load (ciphertext.h:255 expand_seed),
  * save_terms/load_terms: sparse c0 coefficients + full remaining polys,
    for matmul output wires (ciphertext.h:272).
"""

from __future__ import annotations

import ctypes
import ctypes.util
import enum
import io
import struct
import zlib

import numpy as np
import jax.numpy as jnp

from ..core.plaintext import Plaintext
from ..core.ciphertext import Ciphertext
from ..core.keys import SecretKey, PublicKey, KSwitchKeys, RelinKeys, GaloisKeys
from ..core.lwe import LWECiphertext
from ..core.params import SchemeType


class CompressionMode(enum.IntEnum):
    Nil = 0
    Zstd = 1
    Zlib = 2


# -- zstd via ctypes --------------------------------------------------------
_zstd = None


def _load_zstd():
    global _zstd
    if _zstd is not None:
        return _zstd
    path = ctypes.util.find_library("zstd") or "libzstd.so.1"
    try:
        lib = ctypes.CDLL(path)
        lib.ZSTD_compressBound.restype = ctypes.c_size_t
        lib.ZSTD_compressBound.argtypes = [ctypes.c_size_t]
        lib.ZSTD_compress.restype = ctypes.c_size_t
        lib.ZSTD_compress.argtypes = [
            ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p,
            ctypes.c_size_t, ctypes.c_int]
        lib.ZSTD_decompress.restype = ctypes.c_size_t
        lib.ZSTD_decompress.argtypes = [
            ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p, ctypes.c_size_t]
        lib.ZSTD_isError.restype = ctypes.c_uint
        lib.ZSTD_isError.argtypes = [ctypes.c_size_t]
        _zstd = lib
    except OSError:
        _zstd = False
    return _zstd


def _zstd_compress(data: bytes) -> bytes | None:
    lib = _load_zstd()
    if not lib:
        return None
    bound = lib.ZSTD_compressBound(len(data))
    buf = ctypes.create_string_buffer(bound)
    n = lib.ZSTD_compress(buf, bound, data, len(data), 3)
    if lib.ZSTD_isError(n):
        return None
    return buf.raw[:n]


def _zstd_decompress(data: bytes, raw_size: int) -> bytes:
    lib = _load_zstd()
    if not lib:
        raise RuntimeError("[serialize] libzstd unavailable for decompression")
    buf = ctypes.create_string_buffer(raw_size)
    n = lib.ZSTD_decompress(buf, raw_size, data, len(data))
    if lib.ZSTD_isError(n) or n != raw_size:
        raise ValueError("[serialize] zstd decompression failed")
    return buf.raw


def compress(payload: bytes, mode: CompressionMode = CompressionMode.Nil) -> bytes:
    """Frame a payload with optional compression; falls back to raw when the
    compressed form is not smaller (ref: serialize.h:59-91)."""
    mode = CompressionMode(mode)
    comp = None
    if mode == CompressionMode.Zstd:
        comp = _zstd_compress(payload)
    elif mode == CompressionMode.Zlib:
        comp = zlib.compress(payload, 6)
    if comp is None or len(comp) >= len(payload):
        return struct.pack("<BQ", int(CompressionMode.Nil), len(payload)) + payload
    return struct.pack("<BQQ", int(mode), len(payload), len(comp)) + comp


def decompress(data: bytes, offset: int = 0) -> tuple[bytes, int]:
    """Returns (payload, next_offset)."""
    mode = data[offset]
    if mode == CompressionMode.Nil:
        (raw_len,) = struct.unpack_from("<Q", data, offset + 1)
        start = offset + 9
        return data[start : start + raw_len], start + raw_len
    raw_len, comp_len = struct.unpack_from("<QQ", data, offset + 1)
    start = offset + 17
    blob = data[start : start + comp_len]
    if mode == CompressionMode.Zstd:
        return _zstd_decompress(blob, raw_len), start + comp_len
    return zlib.decompress(blob), start + comp_len


# -- low-level writers ------------------------------------------------------

class Writer:
    def __init__(self):
        self.buf = io.BytesIO()

    def u8(self, v):  self.buf.write(struct.pack("<B", v))
    def u32(self, v): self.buf.write(struct.pack("<I", v))
    def u64(self, v): self.buf.write(struct.pack("<Q", v))
    def f64(self, v): self.buf.write(struct.pack("<d", v))
    def raw(self, b): self.buf.write(b)

    def hexid(self, s: str):
        self.buf.write(bytes.fromhex(s))

    def array_u32(self, a):
        arr = np.asarray(a, dtype=np.uint32)
        self.u8(arr.ndim)
        for d in arr.shape:
            self.u64(d)
        self.raw(arr.tobytes())

    def getvalue(self) -> bytes:
        return self.buf.getvalue()


class Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.off = 0

    def _unpack(self, fmt, size):
        v = struct.unpack_from(fmt, self.data, self.off)[0]
        self.off += size
        return v

    def u8(self):  return self._unpack("<B", 1)
    def u32(self): return self._unpack("<I", 4)
    def u64(self): return self._unpack("<Q", 8)
    def f64(self): return self._unpack("<d", 8)

    def hexid(self) -> str:
        v = self.data[self.off : self.off + 32].hex()
        self.off += 32
        return v

    def array_u32(self) -> np.ndarray:
        ndim = self.u8()
        shape = tuple(self.u64() for _ in range(ndim))
        count = int(np.prod(shape)) if shape else 1
        arr = np.frombuffer(self.data, dtype=np.uint32, count=count,
                            offset=self.off).reshape(shape)
        self.off += count * 4
        return arr.copy()


# -- Plaintext --------------------------------------------------------------

def save_plaintext(pt: Plaintext, mode: CompressionMode = CompressionMode.Nil) -> bytes:
    w = Writer()
    w.hexid(pt.parms_id)
    w.u8(int(pt.is_ntt_form))
    w.f64(pt.scale)
    w.u64(pt.coeff_count)
    w.array_u32(np.asarray(pt.data))
    return compress(w.getvalue(), mode)


def load_plaintext(data: bytes) -> Plaintext:
    payload, _ = decompress(data)
    r = Reader(payload)
    parms_id = r.hexid()
    ntt = bool(r.u8())
    scale = r.f64()
    cc = r.u64()
    arr = r.array_u32()
    return Plaintext(jnp.asarray(arr), parms_id, scale, ntt, cc)


# -- Ciphertext -------------------------------------------------------------

def save_ciphertext(ct: Ciphertext, context=None,
                    mode: CompressionMode = CompressionMode.Nil,
                    terms: list[int] | None = None) -> bytes:
    w = Writer()
    w.hexid(ct.parms_id)
    w.u8(ct.size)
    flags = int(ct.is_ntt_form) | (int(ct.seed is not None) << 1) | (int(terms is not None) << 3)
    w.u8(flags)
    w.f64(ct.scale)
    w.u64(ct.correction_factor)
    if ct.seed is not None:
        if ct.size != 2:
            raise ValueError("[save_ciphertext] seeded ciphertext must be size 2")
        w.u64(ct.seed)
    if terms is None:
        if ct.seed is not None:
            w.array_u32(np.asarray(ct.data[0]))
        else:
            w.array_u32(np.asarray(ct.data))
    else:
        # sparse c0 terms (coeff domain) + full remaining polys
        if context is None:
            raise ValueError("[save_ciphertext] save_terms requires context")
        cd = context.get_context_data(ct.parms_id)
        c0 = ct.data[0]
        if ct.is_ntt_form:
            from ..ops import ntt as NTT

            c0 = NTT.ntt_inverse(c0, cd.qtab())
        c0 = np.asarray(c0)
        w.u64(len(terms))
        for t in terms:
            w.u64(t)
        w.array_u32(c0[:, terms])
        start = 2 if ct.seed is not None else 1
        w.array_u32(np.asarray(ct.data[start:]))
    return compress(w.getvalue(), mode)


def load_ciphertext(data: bytes, context) -> Ciphertext:
    payload, _ = decompress(data)
    r = Reader(payload)
    parms_id = r.hexid()
    size = r.u8()
    flags = r.u8()
    ntt = bool(flags & 1)
    has_seed = bool(flags & 2)
    has_terms = bool(flags & 8)
    scale = r.f64()
    cf = r.u64()
    cd = context.get_context_data(parms_id)
    n = cd.parms.poly_modulus_degree
    L = cd.coeff_modulus_size
    seed = r.u64() if has_seed else None
    from ..ops import ntt as NTT
    from .random import uniform_from_seed

    def expand_c1():
        a_ntt = uniform_from_seed(seed, (L, n), cd.qtab())
        return a_ntt if ntt else NTT.ntt_inverse(a_ntt, cd.qtab())

    if not has_terms:
        if has_seed:
            c0 = jnp.asarray(r.array_u32())
            dat = jnp.stack([c0, expand_c1()])
        else:
            dat = jnp.asarray(r.array_u32())
    else:
        cnt = r.u64()
        terms = [r.u64() for _ in range(cnt)]
        sparse = r.array_u32()  # (L, len(terms)) coeff domain
        c0 = np.zeros((L, n), dtype=np.uint32)
        c0[:, terms] = sparse
        c0 = jnp.asarray(c0)
        if ntt:
            c0 = NTT.ntt_forward(c0, cd.qtab())
        rest = r.array_u32()
        polys = [c0]
        if has_seed:
            polys.append(expand_c1())
        for i in range(rest.shape[0]):
            polys.append(jnp.asarray(rest[i]))
        dat = jnp.stack(polys)
    return Ciphertext(dat, parms_id, ntt, scale, cf,
                      seed=None)


# -- keys -------------------------------------------------------------------

def save_secret_key(sk: SecretKey, mode=CompressionMode.Nil) -> bytes:
    w = Writer()
    w.hexid(sk.parms_id)
    w.array_u32(np.asarray(sk.data))
    return compress(w.getvalue(), mode)


def load_secret_key(data: bytes) -> SecretKey:
    r = Reader(decompress(data)[0])
    pid = r.hexid()
    return SecretKey(jnp.asarray(r.array_u32()), pid)


def save_public_key(pk: PublicKey, context=None, mode=CompressionMode.Nil) -> bytes:
    return save_ciphertext(pk.ciphertext, context, mode)


def load_public_key(data: bytes, context) -> PublicKey:
    return PublicKey(load_ciphertext(data, context))


def save_kswitch_keys(keys: KSwitchKeys, mode=CompressionMode.Nil) -> bytes:
    w = Writer()
    w.hexid(keys.parms_id)
    w.u64(len(keys.keys))
    for idx, arr in sorted(keys.keys.items()):
        w.u64(idx)
        w.array_u32(np.asarray(arr))
    return compress(w.getvalue(), mode)


def _load_ksk_dict(data: bytes):
    r = Reader(decompress(data)[0])
    pid = r.hexid()
    count = r.u64()
    keys = {}
    for _ in range(count):
        idx = r.u64()
        keys[idx] = jnp.asarray(r.array_u32())
    return keys, pid


def load_kswitch_keys(data: bytes) -> KSwitchKeys:
    keys, pid = _load_ksk_dict(data)
    return KSwitchKeys(keys, pid)


def load_relin_keys(data: bytes) -> RelinKeys:
    keys, pid = _load_ksk_dict(data)
    return RelinKeys(keys, pid)


def load_galois_keys(data: bytes) -> GaloisKeys:
    keys, pid = _load_ksk_dict(data)
    return GaloisKeys(keys, pid)


# -- size upper bounds (ref: serialized_size_upperbound on every object) ----

_FRAME_OVERHEAD = 17  # compression frame header worst case


def plaintext_size_upperbound(pt: Plaintext) -> int:
    arr = np.asarray(pt.data)
    return 32 + 1 + 8 + 8 + (1 + 8 * arr.ndim) + arr.nbytes + _FRAME_OVERHEAD


def ciphertext_size_upperbound(ct: Ciphertext) -> int:
    arr = np.asarray(ct.data)
    polys = 1 if ct.seed is not None else ct.size
    data = polys * (arr.nbytes // ct.size)  # covers wide (hi, lo) layouts
    seed = 8 if ct.seed is not None else 0
    return 32 + 2 + 8 + 8 + seed + (1 + 8 * arr.ndim) + data + _FRAME_OVERHEAD


def kswitch_keys_size_upperbound(keys: KSwitchKeys) -> int:
    total = 32 + 8 + _FRAME_OVERHEAD
    for arr in keys.keys.values():
        total += 8 + (1 + 8 * 4) + np.asarray(arr).nbytes
    return total


# -- LWE --------------------------------------------------------------------

def save_lwe(lwe: LWECiphertext, mode=CompressionMode.Nil) -> bytes:
    w = Writer()
    w.hexid(lwe.parms_id)
    w.f64(lwe.scale)
    w.u64(lwe.correction_factor)
    w.array_u32(np.asarray(lwe.c0))
    w.array_u32(np.asarray(lwe.c1))
    return compress(w.getvalue(), mode)


def load_lwe(data: bytes) -> LWECiphertext:
    r = Reader(decompress(data)[0])
    pid = r.hexid()
    scale = r.f64()
    cf = r.u64()
    c0 = jnp.asarray(r.array_u32())
    c1 = jnp.asarray(r.array_u32())
    return LWECiphertext(c0, c1, pid, scale, cf)


# -- EncryptionParameters (ref: serialize.cu EncryptionParameters cases) ----

def save_parms(parms, mode=CompressionMode.Nil) -> bytes:
    """scheme / n / coeff moduli (u64 — wide primes) / plain modulus /
    special-prime flag (ref: encryption_parameters.h save)."""
    w = Writer()
    w.u8(int(parms.scheme.value))
    w.u64(parms.poly_modulus_degree)
    w.u64(len(parms.coeff_modulus))
    for m in parms.coeff_modulus:
        w.u64(m.value)
    w.u64(parms.plain_modulus.value)
    w.u8(int(parms.use_special_prime_for_encryption))
    return compress(w.getvalue(), mode)


def load_parms(data: bytes):
    from ..core.params import EncryptionParameters, SchemeType

    r = Reader(decompress(data)[0])
    parms = EncryptionParameters(SchemeType(r.u8()))
    parms.set_poly_modulus_degree(r.u64())
    parms.set_coeff_modulus([r.u64() for _ in range(r.u64())])
    t = r.u64()
    if t:
        parms.set_plain_modulus(t)
    parms.use_special_prime_for_encryption = bool(r.u8())
    return parms


def parms_size_upperbound(parms) -> int:
    return 1 + 8 + 8 + 8 * len(parms.coeff_modulus) + 8 + 1 + _FRAME_OVERHEAD


def secret_key_size_upperbound(sk: SecretKey) -> int:
    arr = np.asarray(sk.data)
    return 32 + (1 + 8 * arr.ndim) + arr.nbytes + _FRAME_OVERHEAD


def public_key_size_upperbound(pk: PublicKey) -> int:
    return ciphertext_size_upperbound(pk.ciphertext)


def lwe_size_upperbound(lwe: LWECiphertext) -> int:
    c0 = np.asarray(lwe.c0)
    c1 = np.asarray(lwe.c1)
    return (32 + 8 + 8 + (1 + 8 * c0.ndim) + c0.nbytes
            + (1 + 8 * c1.ndim) + c1.nbytes + _FRAME_OVERHEAD)
