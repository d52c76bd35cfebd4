#!/bin/bash
# Full TPU benchmark matrix — one command for every BENCH.md row.
# Run from /root/repo with the default env (axon TPU). Each bench.py run
# prints one JSON line; failures print FAILED and continue.
set -u
cd "$(dirname "$0")/.."
run() {
  echo "== $*" >&2
  env "$@" timeout 900 python bench.py || echo "FAILED: $*" >&2
}

# flagship + backends
run TROY_NTT_BACKEND=sixstep
run TROY_NTT_BACKEND=pallas_mxu
# schemes / sizes (bench.py defaults to pallas_mxu since round 4)
run TROY_BENCH_SCHEME=CKKS
run TROY_BENCH_SCHEME=BGV
run TROY_BENCH_N=16384 TROY_BENCH_LIMBS=8 TROY_BENCH_BATCH=8
run TROY_BENCH_SCHEME=CKKS TROY_BENCH_N=16384 TROY_BENCH_LIMBS=8 TROY_BENCH_BATCH=8
run TROY_BENCH_N=32768 TROY_BENCH_LIMBS=9 TROY_BENCH_BATCH=4
# single-ciphertext latency
run TROY_BENCH_BATCH=1
# rotation sweep (rows 1 / NAF multi-step / columns; BGV rows)
run TROY_BENCH_OP=rotate
run TROY_BENCH_OP=rotate TROY_BENCH_ROT_STEP=5
run TROY_BENCH_OP=rotate TROY_BENCH_ROT_STEP=123
run TROY_BENCH_OP=rotate_columns
# wide (reference-default params {60,40,40,60})
run TROY_BENCH_QBITS=60,40,40,60 TROY_BENCH_LIMBS=4
run TROY_BENCH_SCHEME=CKKS TROY_BENCH_QBITS=60,40,40,60 TROY_BENCH_LIMBS=4
# NTT latency + per-op matrix + app-layer wall time
timeout 900 python scripts/ntt_bench.py || echo "FAILED: ntt_bench" >&2
bash scripts/troybench_sweep.sh || echo "FAILED: troybench_sweep" >&2
bash scripts/app_bench_sweep.sh /tmp/app_bench_sweep.log || echo "FAILED: app_bench_sweep" >&2
