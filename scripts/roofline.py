"""Roofline / MFU audit of the flagship BFV multiply+relinearize step.

BASELINE.md promises a "roofline-audited" hot kernel; this script supplies
the audit in two parts:

1. Analytic op/byte model (`--model`, default): walks the BEHZ+keyswitch
   pipeline at the bench config and counts, per stage,
     - poly-limb NTT transforms (the unit the backends are tuned in),
     - u32 multiplies (the VPU's scarce resource: every wide/Shoup/Barrett
       primitive in ops/u32.py decomposes into 16-bit-limb u32 multiplies),
     - minimum HBM traffic (read inputs once + write outputs once per
       fusion barrier; XLA fuses elementwise chains into the NTT stages, so
       barriers are NTT transposes and base-conversion dots).

2. Measured device ceilings (`--measure`, run on the TPU): chained jitted
   kernels for (a) raw elementwise u32 multiply, (b) shoup_mul_lazy,
   (c) barrett mul_mod, (d) a pure HBM-stream xor — the empirical peaks the
   model utilizations are quoted against.  Uses the same two-point-slope
   timing as bench.py (the remote tunnel adds a ~20-25 ms constant per
   measurement).

Output: one JSON line per stage/ceiling, then a summary verdict
(compute-bound vs memory-bound per stage, VPU/MXU utilization).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("TROY_BENCH_BATCH", "16"))
N = int(os.environ.get("TROY_BENCH_N", "8192"))
LIMBS = int(os.environ.get("TROY_BENCH_LIMBS", "7"))

# u32-multiply costs of the ops/u32.py primitives (count of 32x32->32
# hardware multiplies after 16-bit-limb decomposition)
MUL_WIDE = 4          # mul32_wide: t0..t3
MUL_HI = 4            # mul32_hi = mul32_wide[0]
SHOUP_LAZY = MUL_HI + 2   # hi = mulhi, x*w, hi*q
BARRETT64 = MUL_HI + 2 * MUL_WIDE + 2  # h1, a, b, qhat*q, z_hi*ratio_hi
MUL_MOD = MUL_WIDE + BARRETT64


def model():
    """Analytic per-(batched)-step op counts at the bench config."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from __graft_entry__ import _build

    context, keygen, *_ = _build(N, [30] * LIMBS, 20)
    cd = context.first_context_data()
    tool = cd.rns_tool
    L = cd.coeff_modulus_size
    K = tool.base_Bsk.size          # |Bsk|
    O = L + 1                        # keyswitch output base (+ special prime)
    n = N
    logn = n.bit_length() - 1
    B = BATCH

    # one size-n NTT: (n/2)*log n butterflies; forward butterfly =
    # shoup_lazy + 2 csub adds; six-step adds one full-tensor twiddle
    # shoup mul (n mults) between the sub-transforms
    ntt_mults = (n // 2) * logn * SHOUP_LAZY + n * (SHOUP_LAZY + 1)

    stages = []

    def stage(name, transforms, extra_mults, hbm_tensors):
        """transforms: poly-limb NTTs; extra_mults: u32 mults beyond NTTs;
        hbm_tensors: element counts of minimum HBM moves (4 B/elem)."""
        bytes_ = sum(e * 4 for e in hbm_tensors)
        stages.append((name, transforms, extra_mults, bytes_))

    # ---- BEHZ multiply (evaluator.bfv_multiply_impl) ----------------------
    # step 1-2 per operand: mul by m_tilde (MUL_MOD) on (2, L, n), base
    # conversion L->K+1 (shoup per input limb + dot with one barrett per
    # output) then sm_mrq elementwise on (2, K, n)
    conv_mults = (L * SHOUP_LAZY + (K + 1) * (L * MUL_WIDE + BARRETT64)) * 2 * n
    smrq_mults = 2 * n * K * (1 + MUL_MOD + SHOUP_LAZY)
    stage("bconv+sm_mrq (x2 operands)",
          0,
          2 * (2 * n * L * MUL_MOD + conv_mults + smrq_mults),
          [2 * (2 * L * n + 2 * K * n)] * 2)  # read q-limbs, write Bsk-limbs
    # step 3: forward NTT both operands, both bases
    stage("fwd NTT (2 ops x 2 polys x (L+K))",
          2 * 2 * (L + K), 0, [2 * 2 * (L + K) * n * 2])
    # step 4: dyadic convolute (4 products + 1 add per base), 3 outputs
    stage("dyadic convolute (q & Bsk)",
          0, 4 * (L + K) * n * MUL_MOD, [(2 * 2 + 3) * (L + K) * n])
    # step 5: inverse NTT 3 polys both bases (+ n_inv shoup in inverse)
    stage("inv NTT (3 polys x (L+K))",
          3 * (L + K), 0, [3 * (L + K) * n * 2])
    # steps 6-8: x t, fast_floor (conv L->K), fastbconv_sk (K-1 -> L, + m_sk)
    floor_mults = 3 * n * ((L + K) * MUL_MOD            # x t
                           + L * SHOUP_LAZY + K * (L * MUL_WIDE + BARRETT64)
                           + K * (SHOUP_LAZY + 1)       # sub+shoup
                           + (K - 1) * SHOUP_LAZY
                           + (L + 1) * ((K - 1) * MUL_WIDE + BARRETT64)
                           + L * (MUL_MOD + 2))         # sk correction
    stage("fast_floor + fastbconv_sk (3 polys)",
          0, floor_mults, [3 * (L + K) * n, 3 * L * n])

    # ---- relinearize (evaluator._switch_key_impl) -------------------------
    stage("keyswitch digits fwd NTT (L x O)", L * O, 0, [L * n, L * O * n])
    stage("keyswitch dot (L terms -> 2 x O)",
          0, 2 * O * n * (L * MUL_WIDE + BARRETT64),
          [L * O * n, L * 2 * O * n, 2 * O * n])  # digits, keys, out
    stage("keyswitch inv NTT (2 x O)", 2 * O, 0, [2 * O * n * 2])
    stage("sp-divide + add (2 x L)",
          0, 2 * L * n * (BARRETT64 + SHOUP_LAZY + 4), [2 * L * n * 2])

    rows = []
    for name, transforms, mults, bytes_ in stages:
        rows.append({
            "stage": name,
            "poly_limb_ntts": transforms,
            "u32_mults_per_step": int(transforms * ntt_mults + mults) * B,
            "min_hbm_bytes_per_step": int(bytes_) * B,
        })
    tot_mults = sum(r["u32_mults_per_step"] for r in rows)
    tot_bytes = sum(r["min_hbm_bytes_per_step"] for r in rows)
    tot_ntts = sum(r["poly_limb_ntts"] for r in rows)
    for r in rows:
        print(json.dumps(r))
    summary = {
        "config": f"BFV n={N} L={LIMBS} batch={BATCH} (Bsk={K})",
        "poly_limb_ntts_per_ct": tot_ntts,
        "u32_mults_per_step": tot_mults,
        "min_hbm_bytes_per_step": tot_bytes,
        "ntt_share_of_mults": round(
            sum(r["poly_limb_ntts"] for r in rows) * ntt_mults * B / tot_mults, 3),
    }
    ms = os.environ.get("TROY_ROOFLINE_MEASURED_MS")
    if ms:
        dt = float(ms) * 1e-3
        summary["measured_ms_per_step"] = float(ms)
        summary["achieved_u32_mults_per_sec"] = round(tot_mults / dt / 1e9, 1)
        summary["achieved_hbm_GBps_lower_bound"] = round(tot_bytes / dt / 1e9, 1)
        summary["hbm_bound_at_819GBps_ms"] = round(tot_bytes / 819e9 * 1e3, 3)
        ceil = os.environ.get("TROY_ROOFLINE_VPU_GMULS")
        if ceil:
            summary["vpu_mult_utilization"] = round(
                (tot_mults / dt / 1e9) / float(ceil), 3)
    print(json.dumps(summary))
    return summary


def measure():
    """Empirical device ceilings with bench.py's slope discipline."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_CACHE_DIR", "/tmp/jax_ccache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    from troy_tpu.ops import u32 as U

    shape = (BATCH, 2, LIMBS, N)
    elems = int(np.prod(shape))
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.integers(0, 1 << 30, size=shape, dtype=np.uint32))
    q = jnp.asarray(np.full((LIMBS, 1), (1 << 30) - 35, np.uint32))
    w = jnp.uint32(123456789)
    ws = jnp.uint32(((123456789 << 32) // ((1 << 30) - 35)) & 0xFFFFFFFF)
    rhi = jnp.uint32((1 << 64) // ((1 << 30) - 35) >> 32)
    rlo = jnp.uint32(((1 << 64) // ((1 << 30) - 35)) & 0xFFFFFFFF)

    cases = {
        # 1 u32 mult per elem per iter (plus xor to keep the chain honest)
        "raw_mult": (lambda c: (c * c) ^ jnp.uint32(1), 1),
        "shoup_lazy": (lambda c: U.shoup_mul_lazy(c, w, ws, q), 6),
        "barrett_mul_mod": (lambda c: U.mul_mod(c, c ^ jnp.uint32(3), q, rhi, rlo), 18),
        "hbm_xor": (lambda c: c ^ jnp.uint32(5), 0),
    }
    reps_hi, reps_lo = 400, 80
    for name, (f, mults) in cases.items():
        def loop(a, R):
            return lax.fori_loop(0, R, lambda i, c: f(c), a)

        lo = jax.jit(lambda a: loop(a, reps_lo))
        hi = jax.jit(lambda a: loop(a, reps_hi))
        for fn in (lo, hi):
            out = fn(x)
            _ = np.asarray(out[(0,) * out.ndim])

        def timed(fn):
            t0 = time.perf_counter()
            out = fn(x)
            _ = np.asarray(out[(0,) * out.ndim])
            return time.perf_counter() - t0

        t_lo = min(timed(lo), timed(lo))
        t_hi = min(timed(hi), timed(hi))
        dt = (t_hi - t_lo) / (reps_hi - reps_lo)
        rec = {"ceiling": name, "us_per_iter": round(dt * 1e6, 2),
               "elems": elems}
        if mults:
            rec["G_u32_mults_per_sec"] = round(elems * mults / dt / 1e9, 1)
        else:
            rec["GBps_rw"] = round(elems * 4 * 2 / dt / 1e9, 1)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--measure", action="store_true")
    args = ap.parse_args()
    if args.measure:
        measure()
    else:
        model()
