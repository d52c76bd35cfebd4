"""Diagnose the n=16384 batch cliff (VERDICT r03 item 3).

AOT-compiles the flagship mul+relin step at a sweep of (n, batch,
TROY_NTT_SPLIT_A) points on the current backend and prints XLA's own
memory analysis per point — peak/argument/output/temp/generated-code bytes
— plus the compile-estimated cost.  The round-3 observation was a ~2x
per-step cliff the moment batch exceeds 8 at n=16384 ("VMEM pressure",
asserted, not diagnosed); this prints the compiler-side facts.

Run on the real TPU:  python scripts/vmem_probe.py [--n 16384]
(no timing — compile only, so one run is cheap per point after the first).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def probe(n: int, batches, split_a: int | None):
    import jax
    import jax.numpy as jnp

    if os.environ.get("TROY_PEROP_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    if split_a is not None:
        os.environ["TROY_NTT_SPLIT_A"] = str(split_a)
    from troy_tpu.core.params import EncryptionParameters, SchemeType
    from troy_tpu.core.context import HeContext
    from troy_tpu.core.coeff_modulus import (CoeffModulus, PlainModulus,
                                             SecurityLevel)
    from troy_tpu.core.evaluator import Evaluator
    from troy_tpu.parallel.batched import BatchedEvaluator

    limbs = {8192: 7, 16384: 8, 32768: 9}.get(n, 8)
    with jax.default_device(jax.devices("cpu")[0]):
        parms = EncryptionParameters(SchemeType.BFV)
        parms.set_poly_modulus_degree(n)
        parms.set_coeff_modulus(CoeffModulus.create(n, [30] * limbs))
        parms.set_plain_modulus(PlainModulus.batching(n, 20))
        context = HeContext.create(parms, True, SecurityLevel.Nil, 1)
        evaluator = Evaluator(context)
        cd = context.first_context_data()
        be = BatchedEvaluator(evaluator, cd)
        L = cd.coeff_modulus_size
        keys = jnp.zeros((limbs - 1, 2, limbs, n), dtype=jnp.uint32)
        step = be.build_mul_relin_step(keys)

    dev = jax.devices()[0]
    split = os.environ.get("TROY_NTT_SPLIT_A", "default")
    print(f"# n={n} L={L} split_a={split} backend="
          f"{os.environ.get('TROY_NTT_BACKEND', 'sixstep')} device={dev}")
    print("| batch | peak MiB | temp MiB | args MiB | output MiB |")
    print("|---|---|---|---|---|")
    for B in batches:
        shape = jax.ShapeDtypeStruct((B, 2, L, n), jnp.uint32)
        kshape = jax.ShapeDtypeStruct(keys.shape, jnp.uint32)
        t0 = time.time()
        compiled = jax.jit(step).lower(shape, shape, kshape).compile()
        try:
            ma = compiled.memory_analysis()
            row = (f"| {B} | {ma.peak_memory_in_bytes / 2**20:.0f} "
                   f"| {ma.temp_size_in_bytes / 2**20:.0f} "
                   f"| {ma.argument_size_in_bytes / 2**20:.0f} "
                   f"| {ma.output_size_in_bytes / 2**20:.0f} |")
        except Exception as e:  # noqa: BLE001 — backend without the API
            row = f"| {B} | memory_analysis unavailable: {e} |"
        print(row + f"  (compile {time.time() - t0:.0f}s)", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--batches", default="4,8,10,12,16")
    ap.add_argument("--split-a", type=int, default=None)
    args = ap.parse_args()
    probe(args.n, [int(b) for b in args.batches.split(",")], args.split_a)


if __name__ == "__main__":
    main()
