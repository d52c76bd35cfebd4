"""Microbenchmark: radix-2 vs MXU NTT on the attached device.

Reports ns per single 2^14-coefficient polynomial-limb transform (the
BASELINE.md tracked metric) and per-batch wall time.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from troy_tpu.core.modulus import Modulus
    from troy_tpu.ops.ntt import NTTTables, ntt_forward, ntt_forward_sixstep
    from troy_tpu.ops.ntt_mxu import MxuNTTTables, ntt_forward_mxu
    from troy_tpu.utils import numth

    log_n = int(os.environ.get("NTT_LOG_N", "13"))
    L = int(os.environ.get("NTT_L", "6"))
    B = int(os.environ.get("NTT_B", "16"))
    n = 1 << log_n
    reps = 20

    with jax.default_device(jax.devices("cpu")[0]):
        mods = [Modulus(p) for p in numth.get_primes(2 * n, 30, L)]
        ref = NTTTables(log_n, mods)
        mxu = MxuNTTTables(log_n, mods)
        rng = np.random.default_rng(0)
        q = np.array([m.value for m in mods], dtype=np.uint32)
        x = (rng.integers(0, 1 << 30, size=(B, L, n)).astype(np.uint32)
             % q[None, :, None])
        xj = jnp.asarray(x)
        rpack = ref.pack()
        mpack = mxu.pack()
        sspack = dict(rpack)
        sspack.update(ref._sixstep_pack())

    dev = jax.devices()[0]
    print("device:", dev)
    xj = jax.device_put(xj, dev)

    from troy_tpu.ops.ntt_pallas import ntt_forward_pallas, \
        ntt_forward_pallas_mxu

    from jax import lax

    results = {}
    reps_hi, reps_lo = 5 * reps, reps
    for name, fn, pack in [
        ("radix2", ntt_forward, rpack),
        ("sixstep", ntt_forward_sixstep, sspack),
        ("mxu", lambda a, t: ntt_forward_mxu(a, t), mpack),
        ("pallas", ntt_forward_pallas, sspack),
        ("pallas_mxu", lambda a, t: ntt_forward_pallas_mxu(a, t, prefix=""),
         mpack),
    ]:
        # two-point slope of a jitted fori chain of data-dependent
        # transforms, forced one-element readback (BENCH.md methodology:
        # cancels the ~23 ms tunnel dispatch constant that inflated the
        # round-2 numbers by ~12 us per poly-limb)
        def timed(r):
            loop = jax.jit(lambda a, t=pack, f=fn: lax.fori_loop(
                0, r, lambda i, c: f(c, t), a))
            warm = loop(xj)
            _ = np.asarray(warm[(0,) * warm.ndim])
            xp = jax.block_until_ready(xj ^ jnp.uint32(1))
            _ = np.asarray(xp[(0,) * xp.ndim])
            ts = []
            for _i in range(2):
                t0 = time.perf_counter()
                out = loop(xp)
                _ = np.asarray(out[(0,) * out.ndim])
                ts.append(time.perf_counter() - t0)
            return min(ts)

        dt = (timed(reps_hi) - timed(reps_lo)) / (reps_hi - reps_lo)
        per_poly_ns = dt / (B * L) * (1 << 14) / n * 1e9
        results[name] = per_poly_ns
        print(f"{name:10s}: {dt*1e3:8.3f} ms/batch({B}x{L}x{n})  "
              f"= {per_poly_ns:9.0f} ns per 2^14-poly-limb", flush=True)
    return results


if __name__ == "__main__":
    main()
