#!/bin/bash
# Round-3 measurement batch 8: the WIDE pipeline (lane-padded G-buffer
# end-to-end, no per-field pad copies) + de-stacked pixel windows.
# (1) glue split — did inputs-cut drop?  (2) FULL G sweep, (3) parity,
# (4) bench.
set -u
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "$(date +%T) START $name" | tee -a /root/r3log/session.log
  timeout 3000 python -u "$@" > "/root/r3log/$name.log" 2>&1
  rc=$?
  echo "$(date +%T) END $name rc=$rc" | tee -a /root/r3log/session.log
}

run glue_wide tools/prof_shadow_ablate.py --kernel shadow \
    --frames 64 --rows 40 --groups 2 --trace-rows 40 --iters 5 \
    --ablate cut:prep inputs empty None
run gsweep_wide tools/prof_pipeline.py --frames 64 --rows 40 \
    --groups 1 2 --trace-rows 40 --iters 4
run verify_wide tools/verify_tpu.py
run bench_wide bench.py
echo "$(date +%T) ALL DONE 11" | tee -a /root/r3log/session.log
