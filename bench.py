"""Benchmark: BFV ciphertext multiply + relinearize throughput per chip.

Runs the flagship op (SURVEY.md §3.3, BASELINE.md north star) at n=8192 with
a 7x30-bit modulus chain (≈218-bit budget, HE-standard 128-bit security for
n=8192) on the default JAX device (the real TPU chip under the driver; CPU
otherwise) and prints ONE JSON line:

    {"metric": "bfv_n8192_mul_relin_ops_per_sec", "value": N,
     "unit": "ciphertexts/s", "vs_baseline": N / 750.0}

Baseline: CPU-SEAL single-thread BFV multiply+relinearize at n=8192 is
~150 ops/s (6-7 ms/op); the BASELINE.md target is >= 5x that per chip, so
vs_baseline = value / 750 and >= 1.0 means the north-star target is met.
"""

import json
import time

import numpy as np

BATCH = int(__import__("os").environ.get("TROY_BENCH_BATCH", "16"))
REPS = int(__import__("os").environ.get("TROY_BENCH_REPS", "10"))
TARGET_OPS_PER_SEC = 750.0  # 5x CPU-SEAL (~150 ops/s) per BASELINE.md


def _log(msg):
    import sys

    print(f"[bench] {time.strftime('%H:%M:%S')} {msg}", file=sys.stderr, flush=True)


def main():
    import faulthandler
    import sys

    faulthandler.dump_traceback_later(120, repeat=True, file=sys.stderr)
    import jax

    from __graft_entry__ import _make_step_and_args

    _log("setup (host)...")
    step, (d1, d2, keys), context, batched = _make_step_and_args(
        8192, [30] * 7, batch=BATCH, setup_on_cpu=True
    )
    _log("setup done; moving args to device + compiling...")
    dev = jax.devices()[0]
    d1, d2, keys = jax.device_put((d1, d2, keys), dev)
    fn = jax.jit(step)
    # warmup / compile
    out = fn(d1, d2, keys)
    jax.block_until_ready(out)
    _log("compiled; timing...")
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(d1, d2, keys)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    ops_per_sec = BATCH * REPS / dt
    print(json.dumps({
        "metric": "bfv_n8192_mul_relin_ops_per_sec",
        "value": round(ops_per_sec, 2),
        "unit": "ciphertexts/s",
        "vs_baseline": round(ops_per_sec / TARGET_OPS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
