"""Compat mode: CKKS with SEAL-default 40-60-bit primes and scale 2^40,
running on emulated 64-bit (hi, lo)-pair arithmetic (troy_tpu/compat/).

Use this path when a protocol fixes the parameter set (e.g. a SEAL peer
expects {60, 40, 40, 60} primes); otherwise prefer the u32 fast path
(5_ckks_basics.py) — equal modulus budget via more 30-bit limbs, ~4x the
throughput per limb."""

import common  # noqa: F401
import numpy as np

from troy_tpu.compat import (Ckks64Context, Ckks64Encoder, Ckks64KeyGenerator,
                             Ckks64Encryptor, Ckks64Decryptor, Ckks64Evaluator)
from troy_tpu.ops.galois import GaloisTool

log_n = 7  # demo size; TPU-verified at log_n=13 (n=8192)
scale = 2.0 ** 40
ctx = Ckks64Context(log_n, (60, 40, 40, 60), scale=scale, seed=1)
print("data primes:", ctx.data_primes, "special:", ctx.special)

encoder = Ckks64Encoder(ctx)
keygen = Ckks64KeyGenerator(ctx)
encryptor = Ckks64Encryptor(ctx, keygen)
decryptor = Ckks64Decryptor(ctx, keygen, encoder)
evaluator = Ckks64Evaluator(ctx)

v = np.linspace(0, 1, encoder.slot_count)
ct = encryptor.encrypt(encoder.encode(v))

# multiply + relinearize + rescale at full 2^40 scale
rlk = keygen.create_relin_key()
prod = evaluator.rescale_to_next(
    evaluator.relinearize(evaluator.multiply(ct, ct), rlk))
out = decryptor.decrypt(prod).real
err = np.abs(out - v * v).max()
print(f"x^2 max error after rescale (scale 2^40): {err:.2e}")
assert err < 1e-6  # 2^40 scale gives ~7 more digits than the 2^27 demo

# rotation at compat width
steps = 5
glk = keygen.create_galois_key(GaloisTool.get_element_from_step(steps, ctx.n))
rot = evaluator.rotate_vector(ct, steps, glk)
err_r = np.abs(decryptor.decrypt(rot).real - np.roll(v, -steps)).max()
print(f"rotate({steps}) max error: {err_r:.2e}")
assert err_r < 1e-6
