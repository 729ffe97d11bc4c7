#!/bin/bash
# Round-3 measurement batch 4: the merged-operand-window shadow kernel
# (8 pixel windows -> 2, param tables -> 1, counts+szrange -> 1, box
# folded into ptab: 17 input windows -> 7).  (1) empty-vs-full ablation
# (did the window floor drop?), (2) FULL interleaved G sweep, (3) bench.
set -u
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "$(date +%T) START $name" | tee -a /root/r3log/session.log
  timeout 2400 python -u "$@" > "/root/r3log/$name.log" 2>&1
  rc=$?
  echo "$(date +%T) END $name rc=$rc" | tee -a /root/r3log/session.log
}

run ablate_shadow_merged tools/prof_shadow_ablate.py --kernel shadow \
    --frames 64 --rows 40 --groups 2 --trace-rows 40 \
    --ablate None empty nobody
run gsweep_merged tools/prof_pipeline.py --frames 64 --rows 40 \
    --groups 1 2 --trace-rows 40 --iters 4
run verify_merged tools/verify_tpu.py
run bench_merged bench.py
echo "$(date +%T) ALL DONE 7" | tee -a /root/r3log/session.log
