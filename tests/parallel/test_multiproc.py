"""Two-process jax.distributed execution (scripts/multiproc_cpu_demo.py).

Each OS process owns 4 virtual CPU devices; both join one distributed
system, jit the batched mul+relin step over a global (host, data, limb)
mesh, and verify their own output shards bit-exactly.  This exercises the
real multi-host code path (jax.distributed.initialize +
make_multihost_mesh + make_array_from_callback) over actual sockets/Gloo —
the execution-level complement to test_mesh.py's compiled-HLO proofs.

No throughput assertion on purpose: this host has 4 physical cores, so 8
virtual devices oversubscribe and timing would be meaningless; the
zero-DCN-traffic property is asserted structurally in test_mesh.py.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_two_process_distributed_mul_relin():
    env = dict(os.environ, TROY_MP_PORT="51437")
    env.pop("TROY_MP_ROLE", None)
    # the workers pin their own platform/devices; scrub inherited overrides
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "multiproc_cpu_demo.py")],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=270)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "multiproc demo OK" in proc.stdout
