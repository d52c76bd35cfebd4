"""BumbleBee matmul wall-time benchmark on the real TPU.

Mirrors the reference matmul bench sweep (ref: test/bench/matmul.cu,
scripts/test_matmul.sh:6-40 — m=100, r=105, n=110): client-side
encode/encrypt runs in a pure-CPU subprocess (the axon tunnel makes eager
host work crawl), the block contraction runs on the TPU as ONE fused jitted
kernel (Evaluator.multiply_plain_contract), outputs round-trip back to the
CPU subprocess for decrypt + exactness check against a plain matmul oracle
— the same client/server protocol seam the reference benches.

Usage (from /root/repo with the default env):
    python scripts/matmul_bench.py            # full pipeline
    TROY_MM_DIMS=100,105,110 TROY_MM_REPS=8 python scripts/matmul_bench.py

Timing: warm call first, then REPS chained calls whose inputs depend on the
previous output (defeats the dispatch-pipeline mirage), one-element host
readback at the end (block_until_ready returns early through the tunnel).
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DIMS = tuple(int(x) for x in os.environ.get("TROY_MM_DIMS", "100,105,110").split(","))
REPS = int(os.environ.get("TROY_MM_REPS", "8"))
N = int(os.environ.get("TROY_MM_N", "8192"))
LIMBS = int(os.environ.get("TROY_MM_LIMBS", "4"))
CACHE = os.environ.get("TROY_MM_CACHE", "/tmp/troy_mm_cache")


def _log(msg):
    print(f"[mm-bench] {time.strftime('%H:%M:%S')} {msg}",
          file=sys.stderr, flush=True)


def _build(seed=0xBEEF):
    import jax

    from troy_tpu.core.params import EncryptionParameters, SchemeType
    from troy_tpu.core.context import HeContext
    from troy_tpu.core.coeff_modulus import CoeffModulus, PlainModulus, SecurityLevel

    parms = EncryptionParameters(SchemeType.BFV)
    parms.set_poly_modulus_degree(N)
    parms.set_coeff_modulus(CoeffModulus.create(N, [30] * LIMBS))
    parms.set_plain_modulus(PlainModulus.batching(N, 20))
    return HeContext.create(parms, True, SecurityLevel.Nil, seed)


def _helper():
    from troy_tpu.app.matmul import MatmulHelper, MatmulObjective

    m, r, o = DIMS
    return MatmulHelper(m, r, o, N, MatmulObjective.EncryptLeft, pack_lwe=False)


def setup():
    """CPU subprocess: encode/encrypt inputs, encode weights, save arrays."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from troy_tpu.core.keygen import KeyGenerator
    from troy_tpu.core.encryptor import Encryptor
    from troy_tpu.app.encoder_adapter import BatchEncoderAdapter
    from troy_tpu.core.batch_encoder import BatchEncoder

    rng = np.random.default_rng(7)
    ctx = _build()
    enc = BatchEncoder(ctx)
    t = enc.t.value
    kg = KeyGenerator(ctx)
    encryptor = Encryptor(ctx, sk=kg.secret_key)
    helper = _helper()
    adapter = BatchEncoderAdapter(enc)
    m, r, o = DIMS
    x = rng.integers(0, t, size=(m, r), dtype=np.uint64)
    w = rng.integers(0, t, size=(r, o), dtype=np.uint64)
    t0 = time.time()
    x_enc = helper.encrypt_inputs(encryptor, adapter, x)
    w_enc = helper.encode_weights(adapter, w)
    _log(f"client encode+encrypt {time.time()-t0:.1f}s "
         f"(blocks: {len(x_enc.data)}x{len(x_enc.data[0])} ct, "
         f"{len(w_enc.data)}x{len(w_enc.data[0])} pt)")
    os.makedirs(CACHE, exist_ok=True)
    A = np.stack([np.stack([np.asarray(c.data) for c in row])
                  for row in x_enc.data])
    Wp = np.stack([np.stack([np.asarray(p.data) for p in row])
                   for row in w_enc.data])
    np.save(f"{CACHE}/A.npy", A)
    np.save(f"{CACHE}/W.npy", Wp)
    np.save(f"{CACHE}/expected.npy",
            (x.astype(object) @ w.astype(object) % t).astype(np.uint64))
    meta = dict(parms_id_hint=str(ctx.first_parms_id))
    with open(f"{CACHE}/meta.json", "w") as f:
        json.dump(meta, f)


def check():
    """CPU subprocess: decrypt server outputs, compare with plain matmul."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from troy_tpu.core.keygen import KeyGenerator
    from troy_tpu.core.decryptor import Decryptor
    from troy_tpu.core.batch_encoder import BatchEncoder
    from troy_tpu.app.encoder_adapter import BatchEncoderAdapter
    from troy_tpu.app.cipher2d import Cipher2d
    from troy_tpu.core.ciphertext import Ciphertext
    import jax.numpy as jnp

    ctx = _build()
    kg = KeyGenerator(ctx)
    dec = Decryptor(ctx, kg.secret_key)
    enc = BatchEncoder(ctx)
    helper = _helper()
    adapter = BatchEncoderAdapter(enc)
    out = np.load(f"{CACHE}/out.npy")
    pid = ctx.first_parms_id
    rows = [[Ciphertext(jnp.asarray(out[b, j]), pid, is_ntt_form=False)
             for j in range(out.shape[1])] for b in range(out.shape[0])]
    got = helper.decrypt_outputs(adapter, dec, Cipher2d(rows))
    want = np.load(f"{CACHE}/expected.npy")
    t = enc.t.value
    assert np.array_equal(got.astype(object) % t, want.astype(object)), \
        "matmul output MISMATCH"
    _log("decrypt check: exact match")


def run():
    """Main process (TPU under the driver): the timed server-side matmul."""
    import jax
    import jax.numpy as jnp

    from troy_tpu.core.evaluator import Evaluator
    from troy_tpu.core.ciphertext import Ciphertext
    from troy_tpu.core.plaintext import Plaintext
    _log(f"backend: {jax.default_backend()}")
    ctx = _build()
    ev = Evaluator(ctx)
    helper = _helper()
    A = np.load(f"{CACHE}/A.npy")     # (bs, is_, 2, L, n)
    Wp = np.load(f"{CACHE}/W.npy")    # (is_, os_, 1, n)
    pid = ctx.first_parms_id
    bs, is_ = A.shape[0], A.shape[1]
    os_ = Wp.shape[1]
    cts = [[Ciphertext(jnp.asarray(A[b, i]), pid, is_ntt_form=False)
            for i in range(is_)] for b in range(bs)]
    pls = [[Plaintext(jnp.asarray(Wp[i, j])) for j in range(os_)]
           for i in range(is_)]
    t0 = time.time()
    out = ev.multiply_plain_contract(cts, pls)
    np.asarray(out[0][0].data[(0,) * out[0][0].data.ndim])  # force
    _log(f"first (compile) {time.time()-t0:.1f}s")
    # timed: one jitted fori_loop chaining REPS matmuls, each input perturbed
    # by the previous output (data dependency defeats the dispatch pipeline;
    # XOR of two < q values stays within the [0, 2q) lazy NTT tolerance)
    from jax import lax

    Aj = jnp.asarray(A)
    Wj = jnp.asarray(Wp)
    fn = ctx.get_context_data(pid)._jit_ops["mm_contract"]
    out0 = fn(Aj, Wj)

    @jax.jit
    def chain(A0):
        def body(_, carry):
            cur, _last = carry
            last = fn(cur, Wj)
            delta = (last[0, 0, 0] % 2).astype(cur.dtype)
            cur = cur.at[0, 0, 0].set(cur[0, 0, 0] ^ delta)
            return (cur, last)
        return lax.fori_loop(0, REPS, body, (A0, out0))

    _cur, _last = chain(Aj)                                 # warm / compile
    np.asarray(_last[(0,) * _last.ndim])
    t0 = time.time()
    _cur, last = chain(Aj ^ jnp.uint32(1))                  # perturbed input
    np.asarray(last[(0,) * last.ndim])                      # force completion
    dt = (time.time() - t0) / REPS
    m, r, o = DIMS
    _log(f"matmul [{m}x{r}]x[{r}x{o}] n={N} L={LIMBS}: {dt*1e3:.1f} ms/call")
    np.save(f"{CACHE}/out.npy",
            np.stack([np.stack([np.asarray(c.data) for c in row])
                      for row in out]))
    print(json.dumps({
        "metric": f"bfv_matmul_{m}x{r}x{o}_n{N}_ms",
        "value": round(dt * 1e3, 2),
        "unit": "ms/matmul",
    }), flush=True)


def main():
    need = [f"{CACHE}/A.npy", f"{CACHE}/W.npy", f"{CACHE}/expected.npy"]
    if not all(os.path.exists(p) for p in need):
        _log("setup (cpu subprocess)...")
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        subprocess.run([sys.executable, __file__, "setup"], check=True,
                       env=env, cwd=REPO)
    run()
    _log("check (cpu subprocess)...")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    subprocess.run([sys.executable, __file__, "check"], check=True,
                   env=env, cwd=REPO)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "setup":
        setup()
    elif len(sys.argv) > 1 and sys.argv[1] == "check":
        check()
    else:
        main()
