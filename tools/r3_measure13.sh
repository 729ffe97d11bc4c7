#!/bin/bash
# Round-3 measurement batch 13: clean TPU parity with the full new default
# stack (kexp + G=1 + dot-based shade), fresh census, fresh stage cuts,
# box-pack re-measure at G=1 (SMEM fill is now a floor item).
set -u
cd "$(dirname "$0")/.."
LOG=/root/repo/.r3log

run() {
  name=$1; shift
  echo "$(date +%T) START $name" | tee -a $LOG/session.log
  timeout 3000 python -u "$@" > "$LOG/$name.log" 2>&1
  rc=$?
  echo "$(date +%T) END $name rc=$rc" | tee -a $LOG/session.log
}

run verify2 tools/verify_tpu.py
run boxpack2 tools/prof_pipeline.py --frames 64 --rows 40 --groups 1 \
    --trace-rows 40 --iters 6 --box-pack-sweep
run stages2 tools/prof_pipeline.py --frames 64 --rows 40 --groups 1 \
    --trace-rows 40 --iters 4 --stages
run cost2 tools/prof_cost.py --frames 64 --rows 40 --groups 1 \
    --trace-rows 40 --top 40 --dump /root/repo/.r3log/hlo_full.txt
echo "$(date +%T) ALL DONE 13" | tee -a $LOG/session.log
