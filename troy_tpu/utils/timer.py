"""Timing / profiling utilities.

TPU-native rebuild of reference src/utils/timer.{h,cpp}: named registered
timer entries with tab-indented autoscaled duration printing (timer.h:18-33)
and communication byte counters (timer.h:82), plus a TimerOnce scoped timer.
The output format matches what scripts/compare_bench.py parses.

TPU specifics: `tick` calls jax.block_until_ready on a probe value when one
is provided — JAX dispatch is asynchronous, so without a sync the measured
time is launch overhead only (the analog of the reference's
TROY_STREAM_SYNC_AFTER_KERNEL_CALLS build flag, CMakeLists.txt:14).
For kernel-level traces use jax.profiler.trace alongside this.
"""

from __future__ import annotations

import time


def _format_duration(ns: float) -> str:
    """ns -> autoscaled string (ref: timer.h:18-33)."""
    if ns < 1e3:
        return f"{ns:.0f} ns"
    if ns < 1e6:
        return f"{ns / 1e3:.2f} us"
    if ns < 1e9:
        return f"{ns / 1e6:.2f} ms"
    return f"{ns / 1e9:.3f} s"


def profile_trace(log_dir: str):
    """jax.profiler trace context for kernel-level timelines (the TPU
    analog of nvtx/nsight, absent in the reference — SURVEY.md §5).
    View with TensorBoard or xprof."""
    import jax

    return jax.profiler.trace(log_dir)


class TimerOnce:
    """Scoped one-shot timer (ref: timer.h:110)."""

    def __init__(self, name: str = "", print_on_exit: bool = True):
        self.name = name
        self.print_on_exit = print_on_exit
        self.start = time.perf_counter_ns()
        self.elapsed_ns = 0

    def finish(self) -> int:
        self.elapsed_ns = time.perf_counter_ns() - self.start
        if self.print_on_exit:
            print(f"{self.name}: {_format_duration(self.elapsed_ns)}")
        return self.elapsed_ns

    def __enter__(self):
        self.start = time.perf_counter_ns()
        return self

    def __exit__(self, *exc):
        self.finish()
        return False


class Timer:
    """Named accumulating timers (ref: timer.h Timer with registered entries)."""

    def __init__(self):
        self._entries: dict[str, list] = {}  # name -> [total_ns, count, start]
        self._comm: dict[str, int] = {}

    def register(self, name: str) -> str:
        self._entries.setdefault(name, [0, 0, None])
        return name

    def tick(self, name: str):
        e = self._entries.setdefault(name, [0, 0, None])
        e[2] = time.perf_counter_ns()

    def tock(self, name: str, probe=None):
        if probe is not None:
            import jax

            jax.block_until_ready(probe)
        e = self._entries[name]
        if e[2] is None:
            raise ValueError(f"[Timer.tock] {name} not ticked")
        e[0] += time.perf_counter_ns() - e[2]
        e[1] += 1
        e[2] = None

    def add_communication(self, name: str, nbytes: int):
        self._comm[name] = self._comm.get(name, 0) + nbytes

    # -- printing (parsed by scripts/compare_bench.py) ----------------------
    def print(self, indent: int = 1):
        for name, (total, count, _) in self._entries.items():
            avg = total / max(count, 1)
            print("\t" * indent + f"{name}: {_format_duration(avg)}"
                  f" ({count} runs, total {_format_duration(total)})")

    def print_communication(self, indent: int = 1):
        """ref: timer.h:82"""
        for name, nbytes in self._comm.items():
            mb = nbytes / (1024 * 1024)
            print("\t" * indent + f"{name}: {mb:.3f} MB")

    def clear(self):
        self._entries.clear()
        self._comm.clear()
