"""Compat mode: 40-62-bit-prime parameter sets on (hi, lo) u32 pairs.

The u32 fast path (the default framework) restricts primes to 29/30 bits —
the TPU-optimal choice.  This package runs parameter sets fixed by an
external protocol (SEAL-default CKKS with scale 2^40 and 40-60-bit primes)
on the emulated 64-bit arithmetic of ops/u64.py / ops/ntt64.py.
"""

from .ckks64 import (  # noqa: F401
    Ckks64Context,
    Ckks64Encoder,
    Ckks64KeyGenerator,
    Ckks64Encryptor,
    Ckks64Decryptor,
    Ckks64Evaluator,
    Ciphertext64,
)
