"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Mirrors the reference's strategy of using the host execution path as the
always-available oracle (SURVEY.md §4): tests run on CPU devices so CI needs
no TPU; multi-chip sharding tests use the 8 virtual devices.

Note: the harness pre-sets jax_platforms to "axon,cpu" (remote TPU tunnel);
eager dispatch through the tunnel costs ~1s/op, so tests must explicitly pin
the CPU backend via jax.config, not just the environment variable.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the wide (u64-pair) paths compile slowly on
# CPU (tens of seconds per level); caching compiled executables across test
# processes keeps re-runs within the terminal's foreground time budget.
jax.config.update("jax_compilation_cache_dir", "/tmp/troy_jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
