"""Per-operation benchmark harness.

TPU-native rebuild of the reference `troybench` binary
(test/bench/he_operations.cu:15-50: encode / encrypt / negate / add /
mul+relin / mul_plain / mod_switch_to_next / rescale_to_next / rotate,
defaults n=8192, 200 reps with warmup, correctness-checked unless
--no-test-correct).  Output format is the timer table parsed by
scripts/compare_bench.py.

Usage:
  python scripts/troybench.py --scheme bfv -n 8192 --reps 50 --device tpu
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def bench_op(name, fn, probe_fn, reps, warmup=3):
    import jax

    for _ in range(warmup):
        out = fn()
    jax.block_until_ready(probe_fn(out))
    t0 = time.perf_counter_ns()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(probe_fn(out))
    avg = (time.perf_counter_ns() - t0) / reps
    unit = ("%.0f ns" if avg < 1e3 else "%.2f us" if avg < 1e6 else
            "%.2f ms" if avg < 1e9 else "%.3f s")
    scale = 1 if avg < 1e3 else 1e3 if avg < 1e6 else 1e6 if avg < 1e9 else 1e9
    print(f"\t{name}: " + unit % (avg / scale) + f" ({reps} runs)")
    return avg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scheme", default="bfv", choices=["bfv", "bgv", "ckks"])
    ap.add_argument("-n", "--poly-degree", type=int, default=8192)
    ap.add_argument("--limbs", type=int, default=7)
    ap.add_argument("--q-bits", default=None,
                    help="comma-separated prime bit sizes (e.g. 60,40,40,60 "
                         "for the wide path); overrides --limbs x30")
    ap.add_argument("--log-t", type=int, default=20)
    ap.add_argument("--reps", type=int, default=50)
    ap.add_argument("--device", default="default", choices=["default", "cpu", "tpu"])
    ap.add_argument("--no-test-correct", action="store_true")
    args = ap.parse_args()

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from troy_tpu.core.params import EncryptionParameters, SchemeType
    from troy_tpu.core.context import HeContext
    from troy_tpu.core.coeff_modulus import CoeffModulus, PlainModulus, SecurityLevel
    from troy_tpu.core.keygen import KeyGenerator
    from troy_tpu.core.encryptor import Encryptor
    from troy_tpu.core.decryptor import Decryptor
    from troy_tpu.core.evaluator import Evaluator
    from troy_tpu.core.batch_encoder import BatchEncoder
    from troy_tpu.core.ckks_encoder import CKKSEncoder

    scheme = SchemeType[args.scheme.upper()]
    n = args.poly_degree
    print(f"troybench: scheme={args.scheme} n={n} limbs={args.limbs} "
          f"reps={args.reps} device={jax.devices()[0]}")

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        parms = EncryptionParameters(scheme)
        parms.set_poly_modulus_degree(n)
        q_bits = ([int(b) for b in args.q_bits.split(",")]
                  if args.q_bits else [30] * args.limbs)
        parms.set_coeff_modulus(CoeffModulus.create(n, q_bits))
        if scheme != SchemeType.CKKS:
            parms.set_plain_modulus(PlainModulus.batching(n, args.log_t))
        context = HeContext.create(parms, True, SecurityLevel.Nil, 1)
        keygen = KeyGenerator(context)
        encryptor = Encryptor(context, sk=keygen.secret_key,
                              pk=keygen.create_public_key())
        decryptor = Decryptor(context, keygen.secret_key)
        evaluator = Evaluator(context)
        rlk = keygen.create_relin_keys()
        glk = keygen.create_galois_keys_from_steps([1])
        rng = np.random.default_rng(0)
        if scheme == SchemeType.CKKS:
            encoder = CKKSEncoder(context)
            scale = 2.0 ** 25
            v = rng.uniform(-1, 1, encoder.slot_count)
            pt = encoder.encode(v, scale=scale)
        else:
            encoder = BatchEncoder(context)
            t = parms.plain_modulus.value
            v = rng.integers(0, t, encoder.slot_count, dtype=np.uint64)
            pt = encoder.encode(v)
        ct1 = encryptor.encrypt_asymmetric(pt)
        ct2 = encryptor.encrypt_asymmetric(pt)

    from troy_tpu.ops.galois import GaloisTool

    with jax.default_device(cpu):
        conj_elt = GaloisTool.conjugate_element(n)
        cglk = keygen.create_galois_keys_from_elements([conj_elt])

    reps = args.reps
    # client-side ops (host CPU by design: encode/decode run client-side)
    if scheme == SchemeType.CKKS:
        bench_op("encode_simd", lambda: encoder.encode(v, scale=scale),
                 lambda p: p.data, reps)
    else:
        bench_op("encode_simd", lambda: encoder.encode(v),
                 lambda p: p.data, reps)
    bench_op("decode_simd", lambda: encoder.decode(pt), lambda x: x, reps)
    bench_op("encrypt_asymmetric",
             lambda: encryptor.encrypt_asymmetric(pt), lambda c: c.data, reps)
    bench_op("encrypt_symmetric",
             lambda: encryptor.encrypt_symmetric(pt), lambda c: c.data, reps)
    bench_op("decrypt", lambda: decryptor.decrypt(ct1), lambda p: p.data, reps)
    bench_op("negate", lambda: evaluator.negate(ct1), lambda c: c.data, reps)
    bench_op("add", lambda: evaluator.add(ct1, ct2), lambda c: c.data, reps)
    bench_op("sub", lambda: evaluator.sub(ct1, ct2), lambda c: c.data, reps)
    bench_op("add_plain", lambda: evaluator.add_plain(ct1, pt),
             lambda c: c.data, reps)
    bench_op("sub_plain", lambda: evaluator.sub_plain(ct1, pt),
             lambda c: c.data, reps)
    prod = evaluator.multiply(ct1, ct2)
    bench_op("multiply", lambda: evaluator.multiply(ct1, ct2), lambda c: c.data, reps)
    bench_op("relinearize", lambda: evaluator.relinearize(prod, rlk),
             lambda c: c.data, reps)
    bench_op("multiply_plain", lambda: evaluator.multiply_plain(ct1, pt),
             lambda c: c.data, reps)
    bench_op("mod_switch_to_next", lambda: evaluator.mod_switch_to_next(ct1),
             lambda c: c.data, reps)
    if scheme == SchemeType.CKKS:
        mul = evaluator.multiply(ct1, ct2)
        bench_op("rescale_to_next", lambda: evaluator.rescale_to_next(mul),
                 lambda c: c.data, reps)
    bench_op("rotate(1)", lambda: evaluator._rotate_internal(ct1, 1, glk),
             lambda c: c.data, reps)
    if scheme == SchemeType.CKKS:
        bench_op("complex_conjugate",
                 lambda: evaluator.complex_conjugate(ct1, cglk),
                 lambda c: c.data, reps)
    else:
        bench_op("rotate_columns",
                 lambda: evaluator.rotate_columns(ct1, cglk),
                 lambda c: c.data, reps)

    if not args.no_test_correct and scheme != SchemeType.CKKS:
        rel = evaluator.relinearize(prod, rlk)
        out = encoder.decode(decryptor.decrypt(rel))
        assert (out == v * v % t).all(), "correctness check failed"
        print("correctness: OK")


if __name__ == "__main__":
    main()
