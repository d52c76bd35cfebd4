"""ctypes bindings for the native host components (built lazily via make).

Provides:
  aes128_ctr_bytes(key16, counter, nbytes)  — AES-128-CTR keystream (PRF
      parity with the reference's AES-CTR generator, aes_impl.inc)
  ntt64_forward / ntt64_inverse             — fast u64 host NTT oracle

Falls back gracefully (raises RuntimeError on use) if no C toolchain built
the library; nothing in the TPU compute path depends on this.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libtroynative.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _DIR, "-s"], check=True,
                           capture_output=True)
        except Exception as e:  # no toolchain / build failure
            _lib = False
            raise RuntimeError(f"[native] build failed: {e}") from e
    lib = ctypes.CDLL(_LIB_PATH)
    lib.aes128_ctr_fill.argtypes = [
        ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint64,
        ctypes.c_void_p, ctypes.c_uint64]
    lib.ntt64_forward.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64]
    lib.ntt64_inverse.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64,
        ctypes.c_uint64]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except RuntimeError:
        return False


def aes128_ctr_bytes(key: bytes, counter: int, nbytes: int) -> bytes:
    """Deterministic AES-128-CTR keystream (ref: random_generator.h:42-47)."""
    lib = _load()
    if len(key) != 16:
        raise ValueError("[native.aes128_ctr_bytes] key must be 16 bytes")
    out = ctypes.create_string_buffer(nbytes)
    lib.aes128_ctr_fill(key, counter & ((1 << 64) - 1), counter >> 64,
                        out, nbytes)
    return out.raw


def ntt64_forward(values: np.ndarray, psi_br: np.ndarray, q: int) -> np.ndarray:
    lib = _load()
    v = np.ascontiguousarray(values, dtype=np.uint64).copy()
    p = np.ascontiguousarray(psi_br, dtype=np.uint64)
    lib.ntt64_forward(v.ctypes.data, p.ctypes.data, q, len(v))
    return v


def ntt64_inverse(values: np.ndarray, inv_psi_br: np.ndarray, n_inv: int,
                  q: int) -> np.ndarray:
    lib = _load()
    v = np.ascontiguousarray(values, dtype=np.uint64).copy()
    p = np.ascontiguousarray(inv_psi_br, dtype=np.uint64)
    lib.ntt64_inverse(v.ctypes.data, p.ctypes.data, n_inv, q, len(v))
    return v
