"""Multi-chip mesh sharding for batched HE workloads.

TPU-native replacement for the reference's multi-GPU story (SURVEY.md §2.10:
per-device memory pools, independent replicas, NO cross-device collectives).
Here scaling is declarative: a jax.sharding.Mesh with

  'data' axis — ciphertext-batch parallelism (embarrassingly parallel; the
                reference's "independent multi-GPU" maps here),
  'limb' axis — RNS-limb parallelism within one ciphertext (NTT and all
                elementwise ops are limb-independent; base conversion and
                keyswitch inner products induce all-gather / psum collectives
                that XLA GSPMD inserts automatically from the shardings).

Usage:
    mesh = make_mesh(data=2, limb=4)
    step = jax.jit(batched.build_mul_relin_step(rlk), ...)
    d1 = shard_batch(d1, mesh)     # (B, size, L, n): B over 'data', L over 'limb'
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PSpec


def make_mesh(data: int | None = None, limb: int = 1,
              devices: list | None = None) -> Mesh:
    """Create a (data, limb) mesh over the available devices."""
    devs = devices if devices is not None else jax.devices()
    if data is None:
        data = len(devs) // limb
    if data * limb > len(devs):
        raise ValueError(
            f"[make_mesh] need {data * limb} devices, have {len(devs)}"
        )
    arr = np.array(devs[: data * limb]).reshape(data, limb)
    return Mesh(arr, ("data", "limb"))


def make_multihost_mesh(hosts: int | None = None, limb: int = 1,
                        devices: list | None = None) -> Mesh:
    """Hierarchical (host, data, limb) mesh for multi-host deployments.

    Ciphertext batches shard over BOTH 'host' (DCN) and 'data' (ICI): HE
    batch parallelism is embarrassingly parallel, so a correct plan moves
    ZERO bytes across hosts for the batched op stream (asserted by
    tests/parallel/test_mesh.py::test_multihost_data_parallel_no_dcn_traffic)
    while 'limb' collectives stay within a host's ICI domain.  On real
    multi-host pods call jax.distributed.initialize() first and pass
    jax.devices(); process-local hosts are inferred from device.process_index
    (the virtual CPU mesh simulates hosts by slicing the device list).
    """
    devs = devices if devices is not None else jax.devices()
    if hosts is None:
        hosts = max(1, len({getattr(d, "process_index", 0) for d in devs}))
    per_host = len(devs) // hosts
    data = per_host // limb
    if hosts * data * limb > len(devs) or data < 1:
        raise ValueError(
            f"[make_multihost_mesh] need {hosts}x{data}x{limb} devices, "
            f"have {len(devs)}")
    arr = np.array(devs[: hosts * data * limb]).reshape(hosts, data, limb)
    return Mesh(arr, ("host", "data", "limb"))


def ct_batch_spec(mesh: Mesh, shard_limbs: bool = True,
                  ndim: int = 4) -> NamedSharding:
    """Sharding for a stacked ciphertext batch — (B, size, L, n) fast path
    or (B, size, 2, L, n) wide path (the extra axis is the (hi, lo) word
    pair, ops/rp.py): batch over 'data', the RNS limb axis (always second
    from last) over 'limb'."""
    limb = "limb" if shard_limbs else None
    batch = ("host", "data") if "host" in mesh.axis_names else "data"
    spec = [batch] + [None] * (ndim - 3) + [limb, None]
    return NamedSharding(mesh, PSpec(*spec))


def table_spec(mesh: Mesh) -> NamedSharding:
    """Tables (L, n) replicate over 'data', shard limbs over 'limb'."""
    return NamedSharding(mesh, PSpec("limb", None))


def make_latency_mesh(poly: int | None = None,
                      devices: list | None = None) -> Mesh:
    """1-D ('poly',) mesh for SINGLE-ciphertext latency scaling: the
    polynomial coefficient axis (last) shards across devices and the
    six-step NTT's stage transposes ride ICI as collective-permutes
    (GSPMD derives them from the reshape-only NTT formulation; SURVEY §7
    step 8 'poly sharding for single-ct latency').  Verified bit-exact for
    the full BEHZ multiply+relinearize in tests/parallel/test_mesh.py."""
    devs = devices if devices is not None else jax.devices()
    poly = poly or len(devs)
    return Mesh(np.array(devs[:poly]).reshape(poly), ("poly",))


def poly_spec(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Sharding that splits the coefficient (last) axis over 'poly'."""
    return NamedSharding(mesh, PSpec(*([None] * (ndim - 1) + ["poly"])))


def shard_poly(data, mesh: Mesh):
    """Shard any (..., n) array (ciphertexts, keys, stacked batches) along
    the coefficient axis."""
    return jax.device_put(data, poly_spec(mesh, data.ndim))


def shard_batch(data, mesh: Mesh, shard_limbs: bool = True):
    return jax.device_put(data, ct_batch_spec(mesh, shard_limbs, data.ndim))


def replicate(x, mesh: Mesh):
    return jax.device_put(x, NamedSharding(mesh, PSpec()))


# ---------------------------------------------------------------------------
# partition diagnostics
# ---------------------------------------------------------------------------

_COLLECTIVES = ("all-reduce", "all-gather", "all-to-all",
                "collective-permute", "reduce-scatter")

_DTYPE_BYTES = {"pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2,
                "f16": 2, "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8,
                "f64": 8}


def collective_stats(compiled) -> dict:
    """Count collective ops (and estimate the bytes they move) in a lowered+
    compiled executable's HLO — the proof that a sharded program actually
    communicates across the mesh instead of running replicated.  The
    app-level analog is Timer.add_communication (ref: timer.h:82
    print_communication); this covers the intra-op collectives XLA GSPMD
    inserts from the shardings."""
    import re

    op_re = re.compile(r"\b(" + "|".join(_COLLECTIVES) + r")(?:-start)?\(")
    shape_re = re.compile(r"([a-z]+\d*)\[([\d,]*)\]")
    counts: dict[str, int] = {}
    nbytes = 0
    for line in compiled.as_text().splitlines():
        m = op_re.search(line)
        if m is None or "=" not in line:
            continue
        op = m.group(1)
        counts[op] = counts.get(op, 0) + 1
        # result shape(s) sit between '=' and the op name
        eq = line.index("=")
        for dt, dims in shape_re.findall(line[eq + 1 : m.start()]):
            elems = 1
            for d in dims.split(","):
                if d:
                    elems *= int(d)
            nbytes += elems * _DTYPE_BYTES.get(dt, 4)
    return {"counts": counts, "total": sum(counts.values()),
            "approx_bytes": nbytes}


def per_device_bytes(x) -> int:
    """Bytes of x actually resident on ONE device under its sharding."""
    sh = x.addressable_shards[0].data
    return int(np.prod(sh.shape)) * x.dtype.itemsize
