"""Parse troybench output tables and build comparison/speedup tables.

TPU-native rebuild of reference scripts/compare_bench.py:6-31 (which parses
the timer-format output of two bench runs — host vs device, or 1 vs N
threads — and prints per-op speedup ratios).

Usage:
  python scripts/troybench.py --device cpu > /tmp/a.txt
  python scripts/troybench.py > /tmp/b.txt           # TPU
  python scripts/compare_bench.py /tmp/a.txt /tmp/b.txt
"""

from __future__ import annotations

import re
import sys

_LINE = re.compile(r"^\t(?P<name>[\w()+-]+): (?P<val>[\d.]+) (?P<unit>ns|us|ms|s)")
# troybench_tpu markdown rows: "| op name | 1.234 | 77.1 |" (ms / batched
# step, with an optional "(B=1)" suffix on host rows)
_MD = re.compile(r"^\| (?P<name>[^|]+?) \| (?P<val>[\d.]+)(?: \(B=1\))? \|")
_SCALE = {"ns": 1.0, "us": 1e3, "ms": 1e6, "s": 1e9}


def parse(path: str) -> dict[str, float]:
    """op name -> nanoseconds.  Accepts both the troybench.py timer format
    and the troybench_tpu.py markdown tables (ms / batched step column)."""
    out = {}
    for line in open(path):
        m = _LINE.match(line)
        if m:
            out[m.group("name")] = float(m.group("val")) * _SCALE[m.group("unit")]
            continue
        m = _MD.match(line)
        if m and m.group("name") not in ("op", "---"):
            out[m.group("name").strip()] = float(m.group("val")) * 1e6
    return out


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(1)
    a = parse(sys.argv[1])
    b = parse(sys.argv[2])
    ops = [k for k in a if k in b]
    width = max(len(k) for k in ops) if ops else 10
    print(f"{'op':<{width}}  {'A (ns)':>12}  {'B (ns)':>12}  {'A/B speedup':>12}")
    for k in ops:
        print(f"{k:<{width}}  {a[k]:>12.0f}  {b[k]:>12.0f}  {a[k] / b[k]:>12.2f}")


if __name__ == "__main__":
    main()
