"""Benchmark: BFV ciphertext multiply + relinearize throughput per chip.

Runs the flagship op (SURVEY.md §3.3, BASELINE.md north star) at n=8192 with
a 7x30-bit modulus chain (≈210-bit budget, within the HE-standard 128-bit
bound for n=8192) on the default JAX device (the real TPU chip under the
driver; CPU otherwise) and prints ONE JSON line:

    {"metric": "bfv_n8192_mul_relin_ops_per_sec", "value": N,
     "unit": "ciphertexts/s", "vs_baseline": N / 750.0}

Baseline: CPU-SEAL single-thread BFV multiply+relinearize at n=8192 is
~150 ops/s (6-7 ms/op); the BASELINE.md target is >= 5x that per chip, so
vs_baseline = value / 750 and >= 1.0 means the north-star target is met.

The client-side setup (keygen, encryption) runs eagerly on the host CPU
backend and is cached to TROY_BENCH_CACHE (default /tmp/troy_bench_cache) so
repeated runs skip straight to the jitted device benchmark.
"""

import json
import os
import time

import numpy as np

# fastest measured TPU backend (BENCH.md round 4: balanced-int8 pallas_mxu
# 2.65 ms vs sixstep 3.44 ms at the flagship); bit-identical to every other
# backend and verified against the CPU radix-2 ground truth below.  Library
# default stays sixstep (best on CPU); override with TROY_NTT_BACKEND.
os.environ.setdefault("TROY_NTT_BACKEND", "pallas_mxu")

BATCH = int(os.environ.get("TROY_BENCH_BATCH", "16"))
REPS = int(os.environ.get("TROY_BENCH_REPS", "100"))
N = int(os.environ.get("TROY_BENCH_N", "8192"))
LIMBS = int(os.environ.get("TROY_BENCH_LIMBS", "7"))
OP = os.environ.get("TROY_BENCH_OP", "mul_relin")  # mul_relin | rotate
SCHEME = os.environ.get("TROY_BENCH_SCHEME", "BFV")  # BFV | CKKS
# comma-separated prime bit sizes; overrides LIMBSx30.  "60,40,40,60"
# selects the wide (u64-pair) path — the reference's default bench params
# (ref: test/bench/he_operations.cu:15-50)
QBITS = ([int(b) for b in os.environ["TROY_BENCH_QBITS"].split(",")]
         if os.environ.get("TROY_BENCH_QBITS") else [30] * LIMBS)
CACHE = os.environ.get("TROY_BENCH_CACHE", "/tmp/troy_bench_cache")
TARGET_OPS_PER_SEC = 750.0  # 5x CPU-SEAL (~150 ops/s) per BASELINE.md


def _log(msg):
    import sys

    print(f"[bench] {time.strftime('%H:%M:%S')} {msg}", file=sys.stderr, flush=True)


def _tag():
    s = "" if SCHEME == "BFV" else f"_{SCHEME.lower()}"
    if QBITS != [30] * LIMBS:
        s += "_q" + "-".join(str(b) for b in QBITS)
    return f"n{N}_L{LIMBS}{s}"


def _cache_paths():
    return (os.path.join(CACHE, f"{_tag()}_ct.npy"),
            os.path.join(CACHE, f"{_tag()}_keys.npy"))


def _cache_expected():
    return os.path.join(CACHE, f"{_tag()}_expected.npy")


def setup_cache():
    """Host-side client setup in a pure-CPU subprocess (the axon tunnel makes
    in-process eager CPU work crawl); caches ciphertexts, keys, and the
    expected mul+relin output for the built-in correctness check."""
    import subprocess
    import sys

    ct_path, keys_path = _cache_paths()
    if all(os.path.exists(p) for p in (ct_path, keys_path, _cache_expected())):
        return
    _log("setup (cpu subprocess, cold cache)...")
    # sixstep for the CPU-side ground truth (fastest there; all backends are
    # bit-identical, so the device check below stays valid for any backend)
    env = dict(os.environ, JAX_PLATFORMS="cpu", TROY_NTT_BACKEND="sixstep")
    code = f"""
import bench
bench.N, bench.LIMBS, bench.CACHE = {N}, {LIMBS}, {CACHE!r}
bench.SCHEME = {SCHEME!r}
bench.QBITS = {QBITS!r}
bench._setup_cache_impl()
"""
    subprocess.run([sys.executable, "-c", code], check=True, env=env,
                   cwd=os.path.dirname(os.path.abspath(__file__)))
    _log("setup cached")


def _setup_cache_impl():
    """Runs inside the JAX_PLATFORMS=cpu subprocess."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from __graft_entry__ import _build
    from troy_tpu.parallel.batched import BatchedEvaluator

    rng = np.random.default_rng(7)
    if SCHEME == "CKKS":
        context, keygen, encryptor, evaluator, encoder = _build_ckks(
            N, QBITS)
        n2 = encoder.slot_count
        scale = 2.0 ** 25
        m1 = rng.uniform(-1, 1, n2)
        m2 = rng.uniform(-1, 1, n2)
        ct1 = encryptor.encrypt_symmetric(encoder.encode(m1, scale=scale))
        ct2 = encryptor.encrypt_symmetric(encoder.encode(m2, scale=scale))
        cd = context.first_context_data()
    else:
        context, keygen, encryptor, evaluator, encoder = _build(
            N, QBITS, 20, scheme=SCHEME)
        cd = context.first_context_data()
        t_val = cd.parms.plain_modulus.value
        m1 = rng.integers(0, t_val, size=N, dtype=np.uint64)
        m2 = rng.integers(0, t_val, size=N, dtype=np.uint64)
        ct1 = encryptor.encrypt_symmetric(encoder.encode(m1))
        ct2 = encryptor.encrypt_symmetric(encoder.encode(m2))
    rlk = keygen.create_relin_keys()
    # expected single-op output via the default radix-2 path (ground truth)
    batched = BatchedEvaluator(evaluator, cd)
    keys = rlk.key(2)
    step = batched.build_mul_relin_step(keys)
    import jax as _jax

    expected = np.asarray(_jax.jit(step)(ct1.data[None], ct2.data[None], keys))
    ct_path, keys_path = _cache_paths()
    os.makedirs(CACHE, exist_ok=True)
    np.save(ct_path, np.stack([np.asarray(ct1.data), np.asarray(ct2.data)]))
    np.save(keys_path, np.asarray(keys))
    np.save(_cache_expected(), expected)


def _build_ckks(n: int, q_bits: list[int], seed: int = 0xBEEF):
    from troy_tpu.core.params import EncryptionParameters, SchemeType
    from troy_tpu.core.context import HeContext
    from troy_tpu.core.coeff_modulus import CoeffModulus, SecurityLevel
    from troy_tpu.core.keygen import KeyGenerator
    from troy_tpu.core.encryptor import Encryptor
    from troy_tpu.core.evaluator import Evaluator
    from troy_tpu.core.ckks_encoder import CKKSEncoder

    parms = EncryptionParameters(SchemeType.CKKS)
    parms.set_poly_modulus_degree(n)
    parms.set_coeff_modulus(CoeffModulus.create(n, q_bits))
    context = HeContext.create(parms, True, SecurityLevel.Nil, seed)
    keygen = KeyGenerator(context)
    encryptor = Encryptor(context, pk=keygen.create_public_key(),
                          sk=keygen.secret_key)
    return context, keygen, encryptor, Evaluator(context), CKKSEncoder(context)


def _probe_backend(timeout_s: int = 240):
    """Fail fast (instead of hanging indefinitely) when the remote TPU
    tunnel is unreachable: backend init is probed in a killable subprocess.
    TROY_BENCH_ALLOW_CPU=1 falls back to the CPU backend instead."""
    import subprocess
    import sys

    import jax

    plats = jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", "")
    if plats and "axon" not in plats:
        return  # already pinned to a local backend; nothing to probe
    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            check=True, timeout=timeout_s, env=dict(os.environ),
            cwd=os.path.dirname(os.path.abspath(__file__)),
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        return
    except Exception:
        pass
    if os.environ.get("TROY_BENCH_ALLOW_CPU") == "1":
        _log("backend probe failed; falling back to CPU (TROY_BENCH_ALLOW_CPU=1)")
        import jax

        jax.config.update("jax_platforms", "cpu")
        return
    raise SystemExit(
        f"[bench] backend init did not complete within {timeout_s}s — the "
        "TPU tunnel looks unreachable. Set TROY_BENCH_ALLOW_CPU=1 to run "
        "on the CPU backend instead.")


def main():
    import jax
    import jax.numpy as jnp

    _probe_backend()

    # persistent compilation cache: repeat runs skip the multi-minute XLA
    # compile, so the timed loop can run in a fresh full-speed process
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_CACHE_DIR", "/tmp/jax_ccache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    setup_cache()
    ct_path, keys_path = _cache_paths()
    _log("building step (host tables)...")
    from __graft_entry__ import _build
    from troy_tpu.parallel.batched import BatchedEvaluator
    from troy_tpu.core.params import EncryptionParameters, SchemeType
    from troy_tpu.core.context import HeContext
    from troy_tpu.core.coeff_modulus import CoeffModulus, PlainModulus, SecurityLevel
    from troy_tpu.core.evaluator import Evaluator

    with jax.default_device(jax.devices("cpu")[0]):
        parms = EncryptionParameters(SchemeType[SCHEME])
        parms.set_poly_modulus_degree(N)
        parms.set_coeff_modulus(CoeffModulus.create(N, QBITS))
        if SCHEME != "CKKS":
            parms.set_plain_modulus(PlainModulus.batching(N, 20))
        context = HeContext.create(parms, True, SecurityLevel.Nil, 0xBEEF)
        evaluator = Evaluator(context)
        cd = context.first_context_data()
        batched = BatchedEvaluator(evaluator, cd)
        cts = np.load(ct_path)
        keys_np = np.load(keys_path)
        d1 = jnp.asarray(np.broadcast_to(cts[0][None], (BATCH,) + cts[0].shape))
        d2 = jnp.asarray(np.broadcast_to(cts[1][None], (BATCH,) + cts[1].shape))
        keys = jnp.asarray(keys_np)
        if OP in ("rotate", "rotate_columns"):
            # galois rotation via the prebuilt batched step (permutation
            # gather + keyswitch per NAF component, ref:
            # evaluator_keyswitching.cu:263-292).  TROY_BENCH_ROT_STEP=k
            # benches rotate_rows(k); rotate_columns is the conjugation
            # element (one round).  Timing-only: the cached rlk key stands
            # in for per-element galois keys (identical kernel shape).
            if OP == "rotate_columns":
                gstep, elts = batched.build_rotate_columns_step()
            else:
                rot = int(os.environ.get("TROY_BENCH_ROT_STEP", "1"))
                gstep, elts = batched.build_rotate_rows_step(rot)
                _log(f"rotate({rot}) = {len(elts)} galois round(s)")

            def step(d, _unused, k):
                return gstep(d, (k,) * len(elts))
        else:
            step = batched.build_mul_relin_step(keys)

    _log(f"compiling on {jax.devices()[0]} (batch={BATCH})...")
    dev = jax.devices()[0]
    d1, d2, keys = jax.device_put((d1, d2, keys), dev)
    from jax import lax

    # the timed region is a single jitted fori_loop: one dispatch, REPS
    # data-dependent steps back-to-back on device — immune to host dispatch
    # overhead and to the remote platform's premature block_until_ready
    def chained(a, b, k):
        return lax.fori_loop(0, REPS, lambda i, c: step(c, b, k), a)

    fn = jax.jit(step)
    loop_fn = jax.jit(chained)
    out = fn(d1, d2, keys)
    jax.block_until_ready(out)
    if OP == "mul_relin":
        # correctness gate: device result must match CPU radix-2 ground truth
        expected = np.load(_cache_expected())
        got = np.asarray(out)[:1]
        if not (got == expected).all():
            raise AssertionError("[bench] device output mismatches CPU reference")
        _log("compiled + verified; timing...")
    else:
        _log("compiled; timing (timing-only op, no verification gate)...")
    # chain iterations (output feeds back as input) so the runtime cannot
    # dedupe or overlap identical computations.
    #
    # Two-point slope: the dispatch+readback round trip through the remote
    # tunnel costs a CONSTANT ~20-25 ms per measurement (measured 2026-08-19:
    # the same stage at REPS=20 vs REPS=100 differs by exactly C/R), which at
    # REPS=20 inflates a ~4 ms step by ~25%.  Timing the SAME chained loop at
    # two rep counts and taking the slope (T_hi - T_lo) / (R_hi - R_lo)
    # cancels the constant exactly while keeping every honesty property:
    # data-dependent chaining, warm programs, perturbed inputs, forced
    # one-element readback.
    reps_lo = max(2, REPS // 5)

    def chained_lo(a, b, k):
        return lax.fori_loop(0, reps_lo, lambda i, c: step(c, b, k), a)

    loop_lo = jax.jit(chained_lo)

    def timed(fn_, a):
        t0 = time.perf_counter()
        cur = fn_(a, d2, keys)
        # one-element host readback: block_until_ready alone returns early
        # on the remote platform
        _ = np.asarray(cur[(0,) * cur.ndim])
        return time.perf_counter() - t0

    # warm both loop programs, then time each twice on perturbed inputs
    # (min over repeats rejects tunnel jitter on the constant term)
    d1p = jax.block_until_ready(d1 ^ jnp.uint32(1))
    _ = np.asarray(d1p[(0,) * d1p.ndim])
    for fn_ in (loop_lo, loop_fn):
        w = fn_(d1, d2, keys)
        _ = np.asarray(w[(0,) * w.ndim])
    t_lo = min(timed(loop_lo, d1p), timed(loop_lo, d1p))
    t_hi = min(timed(loop_fn, d1p), timed(loop_fn, d1p))
    dt = (t_hi - t_lo) / (REPS - reps_lo)
    if dt <= 0:
        raise AssertionError(
            f"[bench] non-positive slope (t_lo={t_lo:.4f}, t_hi={t_hi:.4f}); "
            "raise TROY_BENCH_REPS")
    ops_per_sec = BATCH / dt
    _log(f"{dt*1e3:.3f} ms per batched step "
         f"(slope over {REPS}-{reps_lo} reps; constant "
         f"{(t_lo - reps_lo * dt)*1e3:.1f} ms excluded)")
    op_tag = OP
    if OP == "rotate" and os.environ.get("TROY_BENCH_ROT_STEP", "1") != "1":
        op_tag = f"rotate{os.environ['TROY_BENCH_ROT_STEP']}"
    print(json.dumps({
        "metric": (f"{SCHEME.lower()}_n{N}_{op_tag}"
                   + ("_wide" if max(QBITS) > 30 else "")
                   + "_ops_per_sec"),
        "value": round(ops_per_sec, 2),
        "unit": "ciphertexts/s",
        "vs_baseline": round(ops_per_sec / TARGET_OPS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
