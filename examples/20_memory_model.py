"""Memory model: what replaced the reference's memory pools.

The reference (examples/20_memory_pools.cu, readme.md:135-200) exposes
MemoryPool handles because CUDA needs explicit caching allocators, per-thread
pools, and per-device pools.  In this build XLA owns device memory:

  * allocations are managed by the runtime arena — there is no pool object,
    nothing to create per thread, and nothing to synchronize on handoff;
  * "one pool per device" becomes jax.device_put / shardings: an array's
    placement IS its pool;
  * temporary buffers inside jitted ops are planned by the XLA scheduler
    (the analog of the reference's Buffer/polynomial_buffer.h).

This example just demonstrates explicit placement control.
"""

import common  # noqa: F401
import jax
import jax.numpy as jnp

devs = jax.devices()
print("devices:", devs)
x = jnp.arange(8, dtype=jnp.uint32)
print("default placement:", x.device)
y = jax.device_put(x, devs[0])
print("explicit placement:", y.device)
print("memory stats:", {k: v for k, v in (devs[0].memory_stats() or {}).items()
                        if "bytes_in_use" in k} if hasattr(devs[0], "memory_stats") else "n/a")
