"""Two-PROCESS distributed execution of a sharded HE op stream (CPU).

The honest stand-in for a multi-host TPU pod that this environment cannot
provide: two separate OS processes each own 4 virtual CPU devices, join one
jax.distributed system, build the SAME (host, data, limb) mesh over all 8
global devices (parallel/mesh.make_multihost_mesh — identical code path a
real pod uses after jax.distributed.initialize), jit the batched BFV
multiply+relinearize step over it, and each process verifies its OWN
addressable output shards bit-exactly against a single-device oracle.

This goes beyond tests/parallel/test_mesh.py (single-process virtual mesh +
compiled-HLO collective proofs): here cross-process coordination, compile
consistency, and per-process shard execution actually happen over sockets.

Run:  python scripts/multiproc_cpu_demo.py            (parent, spawns 2 workers)
      TROY_MP_ROLE=worker TROY_MP_PID=0/1 ...         (worker, internal)

Reference analog: multi-GPU independent replicas (SURVEY.md §2.10); the
reference has no cross-device protocol — here the mesh additionally shards
RNS limbs inside each host's ICI domain.
"""

from __future__ import annotations

import os
import subprocess
import sys

PORT = int(os.environ.get("TROY_MP_PORT", "51423"))
NPROC = 2
LOCAL_DEVICES = 4
N = 64
BATCH = 8


def worker(pid: int) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", LOCAL_DEVICES)
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{PORT}",
        num_processes=NPROC,
        process_id=pid,
    )
    assert jax.process_count() == NPROC, jax.process_count()
    assert len(jax.devices()) == NPROC * LOCAL_DEVICES  # global view
    assert len(jax.local_devices()) == LOCAL_DEVICES

    import numpy as np
    import jax.numpy as jnp

    from tests.core.fixtures import GeneralHeContext
    from troy_tpu.parallel.batched import BatchedEvaluator
    from troy_tpu.parallel import mesh as M

    # identical deterministic setup in both processes (same seed -> same
    # keys/ciphertexts -> same expected shards; a real deployment would
    # broadcast serialized keys instead)
    g = GeneralHeContext("BFV", N, log_t=20, q_bits=(30, 30, 30), seed=0xD15)
    cd = g.context.first_context_data()
    rng = np.random.default_rng(33)
    m1 = rng.integers(0, g.t, size=(BATCH, g.encoder.slot_count), dtype=np.uint64)
    m2 = rng.integers(0, g.t, size=(BATCH, g.encoder.slot_count), dtype=np.uint64)
    cts1 = np.stack([np.asarray(g.encrypt(m).data) for m in m1])
    cts2 = np.stack([np.asarray(g.encrypt(m).data) for m in m2])
    rlk = g.keygen.create_relin_keys()
    keys = np.asarray(rlk.key(2))

    batched = BatchedEvaluator(g.evaluator, cd)
    step = batched.build_mul_relin_step(jnp.asarray(keys))

    # single-device oracle (local)
    expected = np.asarray(jax.jit(step)(
        jnp.asarray(cts1), jnp.asarray(cts2), jnp.asarray(keys)))

    # distributed: (host=2, data=2, limb=2) mesh over all 8 global devices
    mesh = M.make_multihost_mesh(hosts=NPROC, limb=2)
    spec = M.ct_batch_spec(mesh, ndim=cts1.ndim)
    rep = jax.NamedSharding(mesh, jax.sharding.PartitionSpec())

    def put(host_arr, sharding):
        # build a globally-sharded array from process-local shards
        return jax.make_array_from_callback(
            host_arr.shape, sharding, lambda idx: host_arr[idx])

    d1 = put(cts1, spec)
    d2 = put(cts2, spec)
    dk = put(keys, rep)
    out = jax.jit(step, in_shardings=(spec, spec, rep),
                  out_shardings=spec)(d1, d2, dk)
    jax.block_until_ready(out)

    # every process checks its OWN shards bit-exactly
    checked = 0
    for shard in out.addressable_shards:
        got = np.asarray(shard.data)
        exp = expected[shard.index]
        assert (got == exp).all(), f"proc {pid} shard {shard.index} mismatch"
        checked += 1
    assert checked > 0
    print(f"[worker {pid}] {checked} local shards verified bit-exact "
          f"({jax.process_count()} processes x {LOCAL_DEVICES} devices)",
          flush=True)
    jax.distributed.shutdown()


def parent() -> None:
    procs = []
    for pid in range(NPROC):
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env = dict(os.environ, TROY_MP_ROLE="worker", TROY_MP_PID=str(pid),
                   TROY_MP_PORT=str(PORT), PYTHONPATH=repo)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)], env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
    rcs = [p.wait(timeout=300) for p in procs]
    if any(rcs):
        raise SystemExit(f"worker exit codes: {rcs}")
    print("multiproc demo OK: 2-process distributed mul+relin verified")


if __name__ == "__main__":
    if os.environ.get("TROY_MP_ROLE") == "worker":
        worker(int(os.environ["TROY_MP_PID"]))
    else:
        parent()
