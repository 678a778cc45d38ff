#!/bin/bash
# Same-era batch/remat sweep of bench.py on the TPU (BENCH.md r2: absolutes
# across eras are unreliable over the shared tunnel — sweep back-to-back).
# Usage: bash tools/batch_sweep.sh [iters]
set -u
cd /root/repo
ITERS=${1:-60}
run() {
  local tag=$1; shift
  echo "=== $tag ==="
  env "$@" BENCH_ITERS=$ITERS timeout 2400 python bench.py 2>/tmp/sweep_${tag}.err
  local rc=$?
  [ $rc -ne 0 ] && echo "FAILED rc=$rc (tail of log):" && tail -3 /tmp/sweep_${tag}.err
}
run b8_ctrl    BENCH_BATCH=8
run b16        BENCH_BATCH=16
run b16_pads   BENCH_BATCH=16 BENCH_REMAT=pads
run b32_pads   BENCH_BATCH=32 BENCH_REMAT=pads
run b8_ctrl2   BENCH_BATCH=8
