#!/bin/bash
# Round-3 measurement batch 3: (1) fresh bench with the new defaults
# (slot compaction off, incremental keys, on-demand bitmaps), (2) shadow
# lane-group sweep including G=1 (the kernel is fixed-cost bound since
# the word-change cache — fewer, wider grid steps may now win), (3)
# "empty" kernel ablations to bound the pure grid-step/window floor.
set -u
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "$(date +%T) START $name" | tee -a /root/r3log/session.log
  timeout 2400 python -u "$@" > "/root/r3log/$name.log" 2>&1
  rc=$?
  echo "$(date +%T) END $name rc=$rc" | tee -a /root/r3log/session.log
}

run bench2 bench.py
run gsweep tools/prof_pipeline.py --frames 64 --rows 40 --groups 1 2 \
    --trace-rows 40 --iters 4
run ablate_empty_shadow tools/prof_shadow_ablate.py --kernel shadow \
    --frames 64 --rows 40 --groups 2 --trace-rows 40 \
    --ablate None empty nobody
run ablate_empty_trace tools/prof_shadow_ablate.py --kernel trace \
    --frames 64 --rows 40 --groups 2 --trace-rows 40 \
    --ablate None empty nop3
echo "$(date +%T) ALL DONE 6" | tee -a /root/r3log/session.log
