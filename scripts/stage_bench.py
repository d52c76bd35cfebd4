"""Stage-level profile of the flagship multiply+relinearize step.

Times self-map variants of each pipeline stage with the exact discipline
bench.py uses (single jitted fori_loop chaining data-dependent iterations,
warm run, perturbed input, one-element host readback — see CLAUDE.md on the
axon platform's early block_until_ready), so the per-stage costs can be
subtracted honestly:

    full        multiply + relinearize           (= bench.py flagship)
    mul_only    multiply, drop the c2 poly       (relin cost = full - mul_only)
    ntt_pair    forward + inverse NTT on a ct    (per-transform = ntt_pair/2)
    dyadic      elementwise modmul on a ct
    kswitch     keyswitch inner product alone

Run on the real TPU (default env); TROY_STAGE_CPU=1 dry-runs on CPU.
Prints one JSON line per stage.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("TROY_BENCH_BATCH", "16"))
REPS = int(os.environ.get("TROY_BENCH_REPS", "20"))
N = int(os.environ.get("TROY_BENCH_N", "8192"))
LIMBS = int(os.environ.get("TROY_BENCH_LIMBS", "7"))
QBITS = ([int(b) for b in os.environ["TROY_BENCH_QBITS"].split(",")]
         if os.environ.get("TROY_BENCH_QBITS") else [30] * LIMBS)


def main() -> None:
    import jax

    if os.environ.get("TROY_STAGE_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_CACHE_DIR", "/tmp/jax_ccache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    from jax import lax

    from __graft_entry__ import _build
    from troy_tpu.parallel.batched import BatchedEvaluator
    from troy_tpu.ops import rp as R

    with jax.default_device(jax.devices("cpu")[0]):
        context, keygen, encryptor, evaluator, encoder = _build(
            N, QBITS, 20)
        cd = context.first_context_data()
        rng = np.random.default_rng(7)
        t_val = cd.parms.plain_modulus.value
        ct1 = encryptor.encrypt_symmetric(encoder.encode(
            rng.integers(0, t_val, size=N, dtype=np.uint64)))
        ct2 = encryptor.encrypt_symmetric(encoder.encode(
            rng.integers(0, t_val, size=N, dtype=np.uint64)))
        rlk = keygen.create_relin_keys()
        keys = rlk.key(2)
        batched = BatchedEvaluator(evaluator, cd)
        qtab = cd.qtab()
        pax = R.poly_axis(qtab)
        full = batched.build_mul_relin_step(keys)

        def mul_only(c, b, k):
            return lax.slice_in_dim(batched.multiply(c, b), 0, 2, axis=pax)

        def ntt_pair(c, b, k):
            return R.ntt_inverse(R.ntt_forward(c, qtab), qtab)

        def dyadic(c, b, k):
            return R.dyadic_product(c, b, qtab)

        def kswitch(c, b, k):
            target = jnp.take(c, 0, axis=pax)
            sw = evaluator._switch_key_impl(cd, target, k, out_ntt=False)
            return sw  # (..., 2, L, n) self-map on a size-2 ct

        d1 = jnp.broadcast_to(ct1.data[None], (BATCH,) + ct1.data.shape)
        d2 = jnp.broadcast_to(ct2.data[None], (BATCH,) + ct2.data.shape)

    dev = jax.devices()[0]
    d1, d2, keys = jax.device_put((d1, d2, keys), dev)
    stages = [("full", full), ("mul_only", mul_only),
              ("ntt_pair", ntt_pair), ("dyadic", dyadic),
              ("kswitch", kswitch)]
    only = os.environ.get("TROY_STAGE_ONLY")
    if only:
        pick = set(only.split(","))
        stages = [s for s in stages if s[0] in pick]
    results = {}
    reps_lo = max(2, REPS // 5)
    for name, step in stages:
        def chained(r, step=step):
            def fn(a, b, k):
                return lax.fori_loop(0, r, lambda i, c: step(c, b, k), a)
            return jax.jit(fn)

        hi, lo = chained(REPS), chained(reps_lo)
        d1p = jax.block_until_ready(d1 ^ jnp.uint32(1))
        _ = np.asarray(d1p[(0,) * d1p.ndim])

        def timed(fn):
            t0 = time.perf_counter()
            cur = fn(d1p, d2, keys)
            _ = np.asarray(cur[(0,) * cur.ndim])
            return time.perf_counter() - t0

        for fn in (lo, hi):
            w = fn(d1, d2, keys)
            _ = np.asarray(w[(0,) * w.ndim])
        t_lo = min(timed(lo), timed(lo))
        t_hi = min(timed(hi), timed(hi))
        dt = (t_hi - t_lo) / (REPS - reps_lo)
        results[name] = round(dt * 1e3, 3)
        print(json.dumps({"stage": name, "ms_per_batched_step": results[name],
                          "batch": BATCH, "n": N, "qbits": QBITS}), flush=True)
    if "full" in results and "mul_only" in results:
        print(json.dumps({"stage": "relin(=full-mul_only)",
                          "ms_per_batched_step":
                          round(results["full"] - results["mul_only"], 3)}))


if __name__ == "__main__":
    main()
