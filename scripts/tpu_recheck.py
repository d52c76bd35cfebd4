"""Correctness re-verification sweep on the real TPU.

Run after any change to kernels, jit plumbing (pack_jit/safe_stack), or the
device encoder paths, and whenever the axon tunnel comes back after an
outage: every case executes a jitted flow ON THE DEVICE and compares
BIT-EXACTLY (integer flows) or to tight tolerance (dd float flows) against
expectations computed independently on the CPU backend.

    python scripts/tpu_recheck.py                # full sweep (parent)
    python scripts/tpu_recheck.py --case NAME    # one case, this process

All fixtures are deterministic (fixed context seed -> threefry sampling is
platform-independent), so the CPU expectation and the TPU run rebuild
identical ciphertexts without shipping them.  Each case runs in its own
subprocess so TROY_NTT_BACKEND is picked up at import and a wedged tunnel
cannot hang the whole sweep (per-case timeout).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE = os.environ.get("TROY_RECHECK_CACHE", "/tmp/troy_recheck")
N = 1024
BATCH = 4
BACKENDS = ("radix2", "sixstep", "mxu", "pallas", "pallas_mxu")


# ---------------------------------------------------------------------------
# Deterministic flows (run identically on cpu and tpu)
# ---------------------------------------------------------------------------

def _fixture(wide: bool = False):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tests.core.fixtures import GeneralHeContext

    q = (40, 40, 40) if wide else (30, 30, 30)
    return GeneralHeContext("BFV", N, log_t=18, q_bits=q, seed=0xFACE)


def flow_mul_relin(wide: bool = False):
    """Batched multiply+relinearize -> (B, 2, [2,] L, n) uint32."""
    import jax
    import jax.numpy as jnp

    g = _fixture(wide)
    from troy_tpu.parallel.batched import BatchedEvaluator

    cd = g.context.first_context_data()
    rng = np.random.default_rng(77)
    msgs = rng.integers(0, g.t, size=(2, g.encoder.slot_count), dtype=np.uint64)
    ct1 = g.encrypt(msgs[0])
    ct2 = g.encrypt(msgs[1])
    keys = g.keygen.create_relin_keys().key(2)
    batched = BatchedEvaluator(g.evaluator, cd)
    step = batched.build_mul_relin_step(keys)
    d1 = jnp.broadcast_to(ct1.data[None], (BATCH,) + ct1.data.shape)
    d2 = jnp.broadcast_to(ct2.data[None], (BATCH,) + ct2.data.shape)
    out = jax.jit(step)(d1, d2, keys)
    return np.asarray(jax.block_until_ready(out))


def flow_rotate():
    """rotate_rows(1): galois permutation + keyswitch, single ciphertext."""
    g = _fixture()
    rng = np.random.default_rng(78)
    msg = rng.integers(0, g.t, size=g.encoder.slot_count, dtype=np.uint64)
    glk = g.keygen.create_galois_keys()
    out = g.evaluator.rotate_rows(g.encrypt(msg), 1, glk)
    return np.asarray(out.data)


def flow_matmul():
    """App-layer fused block contraction (multiply_plain_contract)."""
    from troy_tpu.app.matmul import MatmulHelper, MatmulObjective
    from troy_tpu.app.encoder_adapter import BatchEncoderAdapter

    g = _fixture()
    adapter = BatchEncoderAdapter(g.encoder)
    rng = np.random.default_rng(79)
    m, r, c = 4, 8, 5
    x = rng.integers(0, g.t, size=(m, r), dtype=np.uint64)
    w = rng.integers(0, g.t, size=(r, c), dtype=np.uint64)
    helper = MatmulHelper(m, r, c, N, MatmulObjective.EncryptLeft,
                          pack_lwe=False)
    xe = helper.encrypt_inputs(g.encryptor, adapter, x)
    we = helper.encode_weights(adapter, w)
    ye = helper.matmul(g.evaluator, xe, we)
    dec = helper.decrypt_outputs(adapter, g.decryptor, ye)
    expected = (x.astype(object) @ w.astype(object)) % g.t
    assert (dec.astype(object) % g.t == expected).all(), "matmul mismatch"
    return np.asarray(ye.data[0][0].data)


def flow_ckks_device_roundtrip():
    """Device encode -> device decode round trip (dd float paths)."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tests.core.fixtures import GeneralHeContext

    g = GeneralHeContext("CKKS", N, q_bits=(30, 30), seed=0xFACE,
                         scale=2.0 ** 25)
    rng = np.random.default_rng(80)
    v = rng.uniform(-1, 1, g.encoder.slot_count) \
        + 1j * rng.uniform(-1, 1, g.encoder.slot_count)
    pt = g.encoder.encode_device(v, parms_id=g.context.last_parms_id,
                                 scale=g.scale)
    back = g.encoder.decode_device(pt)
    err = float(np.max(np.abs(back - v)))
    assert err < 1e-5, f"device encode/decode round trip err {err}"
    return np.asarray([err])


def flow_ckks_device_fresh():
    """Round-3 gate-lift paths: margin-free device decode of a FRESH
    plaintext (fixed-point fractional CRT, wide L=3, K from the 95-bit
    margin) and the multi-word (W=3) device encode tier at
    scale*max|v| ~ 2^50."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tests.core.fixtures import GeneralHeContext

    g = GeneralHeContext("CKKS", N, q_bits=(50, 40, 40), seed=0xFACE,
                         scale=2.0 ** 35)
    rng = np.random.default_rng(81)
    v = rng.uniform(-1, 1, g.encoder.slot_count) \
        + 1j * rng.uniform(-1, 1, g.encoder.slot_count)
    pt = g.encoder.encode(v, scale=g.scale)
    err = float(np.max(np.abs(g.encoder.decode_device(pt)
                              - g.encoder.decode(pt))))
    assert err < 1e-9, f"fresh-ct device decode err {err}"

    g2 = GeneralHeContext("CKKS", N, q_bits=(60, 60, 60), seed=0xFACE,
                          scale=2.0 ** 40)
    v2 = rng.uniform(-1000.0, 1000.0, g2.encoder.slot_count)
    back = g2.encoder.decode(g2.encoder.encode_device(v2, scale=2.0 ** 40))
    err2 = float(np.max(np.abs(back - v2)))
    assert err2 < 1e-6, f"multi-word device encode err {err2}"
    return np.asarray([err, err2])


CASES = {
    **{f"mul_relin_{b}": (flow_mul_relin, b) for b in BACKENDS},
    "mul_relin_wide": (lambda: flow_mul_relin(wide=True), "sixstep"),
    "rotate": (flow_rotate, "sixstep"),
    "matmul": (flow_matmul, "sixstep"),
    "ckks_device_roundtrip": (flow_ckks_device_roundtrip, "sixstep"),
    "ckks_device_fresh": (flow_ckks_device_fresh, "sixstep"),
}
FLOAT_CASES = {"ckks_device_roundtrip", "ckks_device_fresh"}  # tolerance


def _expected_path(case: str) -> str:
    return os.path.join(CACHE, f"{case}.npy")


def run_case(case: str, device: bool) -> None:
    """Execute one case in THIS process.  device=False computes + caches the
    CPU expectation; device=True runs on the default device and compares."""
    import jax

    if not device or os.environ.get("TROY_RECHECK_CPU") == "1":
        # TROY_RECHECK_CPU=1 dry-runs the whole sweep on the CPU backend
        # (the axon plugin ignores the JAX_PLATFORMS env var)
        jax.config.update("jax_platforms", "cpu")
    if device and os.environ.get("TROY_RECHECK_CPU") != "1":
        # persistent compile cache: reruns skip the ~30 s tunnel compiles.
        # CPU runs deliberately skip it (XLA:CPU AOT entries record machine
        # features and mismatched loads cost ~3 s each — see CLAUDE.md).
        try:
            jax.config.update("jax_compilation_cache_dir",
                              os.environ.get("JAX_CACHE_DIR", "/tmp/jax_ccache"))
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass
    fn, _backend = CASES[case]
    out = fn()
    if not device:
        os.makedirs(CACHE, exist_ok=True)
        np.save(_expected_path(case), out)
        print(f"[expected] {case} cached {out.shape}")
        return
    if case in FLOAT_CASES:
        print(f"PASS {case} (device self-check, err={float(out[0]):.2e})")
        return
    exp = np.load(_expected_path(case))
    if (out == exp).all():
        print(f"PASS {case} (bit-exact, {out.size} words)")
    else:
        bad = int((out != exp).sum())
        print(f"FAIL {case}: {bad}/{out.size} words differ")
        raise SystemExit(1)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--case")
    ap.add_argument("--expected", action="store_true",
                    help="compute the CPU expectation for --case")
    args = ap.parse_args()
    if args.case:
        run_case(args.case, device=not args.expected)
        return

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    results = {}
    for case, (_fn, backend) in CASES.items():
        if case not in FLOAT_CASES and not os.path.exists(_expected_path(case)):
            env = dict(os.environ, JAX_PLATFORMS="cpu",
                       TROY_NTT_BACKEND="sixstep")
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--case", case,
                 "--expected"], env=env, cwd=repo, timeout=600)
            if r.returncode:
                results[case] = "EXPECTED-FAIL"
                continue
        env = dict(os.environ, TROY_NTT_BACKEND=backend)
        env.pop("JAX_PLATFORMS", None)  # default device = the real TPU
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--case", case],
            env=env, cwd=repo,
            timeout=int(os.environ.get("TROY_RECHECK_TIMEOUT", "900")))
        results[case] = "PASS" if r.returncode == 0 else "FAIL"
    print(json.dumps(results))
    if any(v != "PASS" for v in results.values()):
        raise SystemExit(1)


if __name__ == "__main__":
    main()
