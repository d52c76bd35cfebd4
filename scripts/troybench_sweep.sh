#!/bin/bash
# Full per-op TPU matrix (VERDICT r03 item 4): the reference troybench op
# list x BFV/BGV/CKKS x fast/wide widths, slope-honest timing (see
# scripts/troybench_tpu.py).  Appends markdown to stdout; run on the real
# TPU from /root/repo.
set -e
cd "$(dirname "$0")/.."
for scheme in bfv bgv ckks; do
  python scripts/troybench_tpu.py --scheme $scheme -n 8192 --batch 16 --reps 100
done
# wide width: the reference's own default bench parameters
for scheme in bfv bgv ckks; do
  python scripts/troybench_tpu.py --scheme $scheme -n 8192 --batch 16 \
      --reps 60 --q-bits 60,40,40,60
done
