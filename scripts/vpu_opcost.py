"""VPU op-cost microbenchmark: what does a u32 multiply cost relative to
add/select, and does the Karatsuba (3-mult) 64x64 pair product beat the
schoolbook (4-mult) one on this chip?

Chained fori_loop + forced readback + two-rep-count slope (bench.py
discipline).  Each case folds its outputs back into the carried state so
XLA cannot dead-code or hoist anything.

Run on the TPU: `python scripts/vpu_opcost.py`
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_ccache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from troy_tpu.ops import u32 as U, u64 as W

SHAPE = (16, 2, 4, 8192)
ELEMS = int(np.prod(SHAPE))


def main():
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.integers(0, 1 << 32, size=SHAPE, dtype=np.uint32))
    y = jnp.asarray(rng.integers(0, 1 << 32, size=SHAPE, dtype=np.uint32))

    one = jnp.uint32(1)

    def fold4(w3, w2, w1, w0):
        return w3 ^ w1, w2 ^ w0

    cases = {
        # name: (step fn on a (a, b) state, u32 mults per elem per iter)
        "raw_mult": (lambda a, b: (a * b, b ^ one), 1),
        "raw_add": (lambda a, b: (a + b, b ^ one), 0),
        "raw_where": (lambda a, b: (jnp.where(a < b, a, b) ^ one, b + one), 0),
        "mul32_wide": (lambda a, b: (lambda h, l: (h ^ l, b ^ one))(
            *U.mul32_wide(a, b)), 4),
        "mul64_wide": (lambda a, b: (*fold4(*W.mul64_wide(a, b, b, a)),), 16),
        "mul64_wide_k": (lambda a, b: (*fold4(*W.mul64_wide_k(a, b, b, a)),), 12),
    }

    reps_hi, reps_lo = 300, 60
    out = {}
    for name, (f, mults) in cases.items():
        def loop(s, R):
            return lax.fori_loop(0, R, lambda i, c: f(*c), s)

        lo_fn = jax.jit(lambda s: loop(s, reps_lo))
        hi_fn = jax.jit(lambda s: loop(s, reps_hi))
        for fn in (lo_fn, hi_fn):
            r = fn((x, y))
            _ = np.asarray(r[0][(0,) * r[0].ndim])

        def timed(fn):
            t0 = time.perf_counter()
            r = fn((x, y))
            _ = np.asarray(r[0][(0,) * r[0].ndim])
            return time.perf_counter() - t0

        t_lo = min(timed(lo_fn), timed(lo_fn))
        t_hi = min(timed(hi_fn), timed(hi_fn))
        dt = (t_hi - t_lo) / (reps_hi - reps_lo)
        rec = {"case": name, "us_per_iter": round(dt * 1e6, 2),
               "ps_per_elem": round(dt / ELEMS * 1e12, 2)}
        if mults:
            rec["G_u32_mults_per_sec"] = round(ELEMS * mults / dt / 1e9, 1)
        out[name] = dt
        print(json.dumps(rec), flush=True)

    if "mul64_wide" in out and "mul64_wide_k" in out:
        print(json.dumps({
            "verdict": "karatsuba_wins" if out["mul64_wide_k"] < out["mul64_wide"]
            else "schoolbook_wins",
            "k_vs_schoolbook": round(out["mul64_wide_k"] / out["mul64_wide"], 3),
        }), flush=True)


if __name__ == "__main__":
    main()
