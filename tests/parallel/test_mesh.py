"""Multi-chip sharding tests on the virtual 8-device CPU mesh
(the TPU analog of reference test/multithread.cu multi-device cases,
SURVEY.md §2.10)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.core.fixtures import GeneralHeContext
from troy_tpu.parallel import mesh as M
from troy_tpu.parallel.batched import BatchedEvaluator

RNG = np.random.default_rng(616)

needs_8 = pytest.mark.skipif(jax.device_count() < 8,
                             reason="needs 8 virtual devices")


def _setup(n=32, q_bits=(30, 30, 30, 30, 30)):
    h = GeneralHeContext("BFV", n, log_t=20, q_bits=q_bits)
    cd = h.context.first_context_data()
    batched = BatchedEvaluator(h.evaluator, cd)
    rlk = h.keygen.create_relin_keys()
    return h, cd, batched, rlk


@needs_8
def test_sharded_mul_relin_matches_single_device():
    h, cd, batched, rlk = _setup()
    B = 8
    ms1 = [h.random_simd(RNG) for _ in range(B)]
    ms2 = [h.random_simd(RNG) for _ in range(B)]
    cts1 = [h.encrypt(m) for m in ms1]
    cts2 = [h.encrypt(m) for m in ms2]
    d1, d2 = batched.stack(cts1), batched.stack(cts2)
    keys = rlk.key(2)
    step = batched.build_mul_relin_step(keys)

    ref = jax.jit(step)(d1, d2, keys)

    # data x limb mesh: batch over 4 devices, L=4 limbs over 2 devices
    m = M.make_mesh(data=4, limb=2)
    d1s = M.shard_batch(d1, m)
    d2s = M.shard_batch(d2, m)
    keys_r = M.replicate(keys, m)
    out = jax.jit(step)(d1s, d2s, keys_r)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    # decrypt a couple to confirm end-to-end correctness through sharding
    for i in (0, B - 1):
        ct = cts1[0].clone()
        ct.data = jnp.asarray(np.asarray(out)[i])
        dec = h.decrypt(ct)
        np.testing.assert_array_equal(dec, ms1[i] * ms2[i] % h.t)


@needs_8
def test_data_parallel_scaling_shapes():
    h, cd, batched, rlk = _setup()
    m = M.make_mesh(data=8, limb=1)
    B = 16
    ct = h.encrypt(h.random_simd(RNG))
    d = jnp.tile(ct.data[None], (B, 1, 1, 1))
    ds = M.shard_batch(d, m, shard_limbs=False)
    assert ds.sharding.spec[0] == "data"
    keys = M.replicate(rlk.key(2), m)
    out = jax.jit(batched.build_mul_relin_step(keys))(ds, ds, keys)
    assert out.shape == (B, 2, cd.coeff_modulus_size, h.n)


def test_mesh_construction():
    m = M.make_mesh(data=2, limb=2)
    assert m.axis_names == ("data", "limb")
    assert m.devices.shape == (2, 2)


@needs_8
def test_sharded_step_contains_collectives():
    """The limb-sharded keyswitch inner product must COMMUNICATE across the
    mesh — assert collectives in the compiled HLO, not just equal results
    (a plan that all-gathers everything would pass the equality test)."""
    h, cd, batched, rlk = _setup()
    B = 8
    d = batched.stack([h.encrypt(h.random_simd(RNG)) for _ in range(B)])
    keys = rlk.key(2)
    step = batched.build_mul_relin_step(keys)
    m = M.make_mesh(data=4, limb=2)
    ds = M.shard_batch(d, m)
    keys_r = M.replicate(keys, m)
    compiled = jax.jit(step).lower(ds, ds, keys_r).compile()
    stats = M.collective_stats(compiled)
    assert stats["total"] >= 1, f"no collectives in sharded HLO: {stats}"
    assert stats["approx_bytes"] > 0
    # pure data-parallel plan needs NO cross-device traffic for the
    # elementwise/NTT work (any collectives would be a sharding bug)
    m1 = M.make_mesh(data=8, limb=1)
    ds1 = M.shard_batch(d, m1, shard_limbs=False)
    compiled1 = jax.jit(step).lower(ds1, ds1, M.replicate(keys, m1)).compile()
    stats1 = M.collective_stats(compiled1)
    assert stats1["total"] <= stats["total"]


@needs_8
def test_sharded_inputs_actually_partition_memory():
    """Per-device bytes of a sharded batch are 1/(data*limb) of the whole —
    the live-memory proof that sharding is not replication."""
    h, cd, batched, rlk = _setup()
    B = 8
    d = batched.stack([h.encrypt(h.random_simd(RNG)) for _ in range(B)])
    full = d.size * d.dtype.itemsize
    m = M.make_mesh(data=4, limb=2)
    ds = M.shard_batch(d, m)
    # L=5 limbs over 2 devices -> ceil(5/2)=3 of 5 limbs resident per device
    per = M.per_device_bytes(ds)
    assert per <= full // 4 * 3 // 5 + 1
    assert per < full // 4  # strictly better than data-sharding alone
    m1 = M.make_mesh(data=8, limb=1)
    per1 = M.per_device_bytes(M.shard_batch(d, m1, shard_limbs=False))
    assert per1 == full // 8


@needs_8
def test_wide_sharded_mul_relin_matches_single_device():
    """Wide (40-60-bit) stacked batches shard over (data x limb) too: the
    (B, size, 2, L, n) word-pair layout keeps the limb axis second from
    last (mesh.ct_batch_spec ndim-aware)."""
    h = GeneralHeContext("BFV", 32, log_t=20, q_bits=(60, 40, 40, 40, 60))
    cd = h.context.first_context_data()
    batched = BatchedEvaluator(h.evaluator, cd)
    rlk = h.keygen.create_relin_keys()
    B = 4
    ms1 = [h.random_simd(RNG) for _ in range(B)]
    ms2 = [h.random_simd(RNG) for _ in range(B)]
    d1 = batched.stack([h.encrypt(m) for m in ms1])
    d2 = batched.stack([h.encrypt(m) for m in ms2])
    assert d1.ndim == 5  # (B, size, 2, L, n)
    keys = rlk.key(2)
    step = batched.build_mul_relin_step(keys)
    ref = jax.jit(step)(d1, d2, keys)

    m = M.make_mesh(data=4, limb=2)
    out = jax.jit(step)(M.shard_batch(d1, m), M.shard_batch(d2, m),
                        M.replicate(keys, m))
    assert out.sharding.spec[0] == "data"
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@needs_8
def test_multihost_data_parallel_no_dcn_traffic():
    """Simulated 2-host x 4-device hierarchical mesh: batch-parallel
    mul+relin must compile with ZERO collectives (nothing crosses hosts OR
    devices — HE batch parallelism is embarrassingly parallel), and the
    per-device footprint must be 1/8 of the batch."""
    h, cd, batched, rlk = _setup()
    B = 8
    d = batched.stack([h.encrypt(h.random_simd(RNG)) for _ in range(B)])
    keys = rlk.key(2)
    step = batched.build_mul_relin_step(keys)
    m = M.make_multihost_mesh(hosts=2, limb=1)
    assert m.axis_names == ("host", "data", "limb")
    ds = M.shard_batch(d, m, shard_limbs=False)
    compiled = jax.jit(step).lower(ds, ds, M.replicate(keys, m)).compile()
    stats = M.collective_stats(compiled)
    assert stats["total"] == 0, f"unexpected cross-device traffic: {stats}"
    full = d.size * d.dtype.itemsize
    assert M.per_device_bytes(ds) == full // 8


@needs_8
def test_multihost_limb_sharding_collectives_within_host():
    """(host=2, data=2, limb=2): limb-sharded keyswitch induces collectives,
    and replica groups only pair devices of the same host row (ICI, not
    DCN)."""
    h, cd, batched, rlk = _setup(q_bits=(30, 30, 30, 30, 30))
    B = 4
    d = batched.stack([h.encrypt(h.random_simd(RNG)) for _ in range(B)])
    keys = rlk.key(2)
    step = batched.build_mul_relin_step(keys)
    m = M.make_multihost_mesh(hosts=2, limb=2)
    ds = M.shard_batch(d, m)
    compiled = jax.jit(step).lower(ds, ds, M.replicate(keys, m)).compile()
    stats = M.collective_stats(compiled)
    assert stats["total"] >= 1
    # device ids are laid out (host, data, limb) row-major: limb partners
    # differ by 1 and share the host block of 4
    import re

    hlo = compiled.as_text()
    groups = re.findall(r"replica_groups=\{\{([0-9,{} ]+)\}\}", hlo)
    assert groups, "no replica_groups parsed from the sharded HLO"
    for g in groups:
        for pair in g.split("},{"):
            ids = [int(x) for x in pair.replace("{", "").replace("}", "").split(",")]
            hosts = {i // 4 for i in ids}
            assert len(hosts) == 1, f"collective crosses hosts: {ids}"


@needs_8
def test_poly_sharded_single_ct_latency_path():
    """Single-ciphertext latency scaling: the coefficient axis shards over
    all 8 devices and the FULL BEHZ multiply+relinearize stays bit-exact
    with 1/8 per-device footprint; the NTT stage transposes appear as
    collective-permutes in the compiled HLO (SURVEY §7 step 8)."""
    h = GeneralHeContext("BFV", 1024, log_t=20, q_bits=(30,) * 4)
    cd = h.context.first_context_data()
    batched = BatchedEvaluator(h.evaluator, cd)
    rlk = h.keygen.create_relin_keys()
    v1, v2 = h.random_simd(RNG), h.random_simd(RNG)
    d1 = batched.stack([h.encrypt(v1)])
    d2 = batched.stack([h.encrypt(v2)])
    keys = rlk.key(2)
    step = batched.build_mul_relin_step(keys)
    ref = np.asarray(jax.jit(step)(d1, d2, keys))

    m = M.make_latency_mesh()
    d1s, d2s, keys_s = (M.shard_poly(x, m) for x in (d1, d2, keys))
    fn = jax.jit(step, out_shardings=M.poly_spec(m, d1.ndim))
    compiled = fn.lower(d1s, d2s, keys_s).compile()
    stats = M.collective_stats(compiled)
    assert stats["counts"].get("collective-permute", 0) > 0, stats
    out = fn(d1s, d2s, keys_s)
    np.testing.assert_array_equal(np.asarray(out), ref)
    assert M.per_device_bytes(out) == out.size * out.dtype.itemsize // 8


@needs_8
def test_limb_sharding_collective_byte_ceiling():
    """Pin the collective budget of the limb-sharded step (the falsifiable
    on-paper half of the scaling claim, scripts/scaling_stats.py): pure
    batch parallelism moves zero bytes; (data x limb) = (4, 2) sharding must
    stay under 6x the operand bytes per step (measured ~4.2x at n=2048 and
    n=32 alike — the ratio is scale-invariant)."""
    h, cd, batched, rlk = _setup()
    B = 8
    d = batched.stack([h.encrypt(h.random_simd(RNG)) for _ in range(B)])
    keys = rlk.key(2)
    step = batched.build_mul_relin_step(keys)
    operand_bytes = d.size * d.dtype.itemsize

    m_dp = M.make_mesh(data=8, limb=1)
    c_dp = jax.jit(step).lower(
        M.shard_batch(d, m_dp, shard_limbs=False),
        M.shard_batch(d, m_dp, shard_limbs=False),
        M.replicate(keys, m_dp)).compile()
    assert M.collective_stats(c_dp)["approx_bytes"] == 0

    m = M.make_mesh(data=4, limb=2)
    compiled = jax.jit(step).lower(
        M.shard_batch(d, m), M.shard_batch(d, m),
        M.replicate(keys, m)).compile()
    stats = M.collective_stats(compiled)
    assert stats["total"] >= 1
    assert stats["approx_bytes"] <= 6 * operand_bytes, stats
