#!/bin/bash
# Full app-layer bench sweep (mirrors reference scripts/test_matmul.sh +
# test/bench/{matmul,conv2d}.cu).  Each line: one config through
# scripts/app_bench.py (setup cached under /tmp/troy_app_cache, server
# pipeline timed on the TPU with slope timing, decrypt-checked on CPU).
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/app_bench_sweep.log}
: > "$LOG"

run() {
  echo "=== $* ===" >> "$LOG"
  env "$@" python scripts/app_bench.py >> "$LOG" 2>&1
  echo "--- exit $? ---" >> "$LOG"
}

run TROY_APP_SCHEME=BFV
run TROY_APP_SCHEME=BFV TROY_APP_PACK=1
run TROY_APP_SCHEME=BFV TROY_APP_MODSWITCH=1
run TROY_APP_SCHEME=BFV TROY_APP_PACK=1 TROY_APP_MODSWITCH=1
run TROY_APP_SCHEME=CKKS
run TROY_APP_SCHEME=ring2k32
run TROY_APP_SCHEME=ring2k64
run TROY_APP_SCHEME=ring2k128
run TROY_APP_OP=conv2d TROY_APP_SCHEME=BFV
run TROY_APP_OP=conv2d TROY_APP_SCHEME=BFV TROY_APP_CONV=1,64,64,16,16,3,3
echo "SWEEP DONE" >> "$LOG"
