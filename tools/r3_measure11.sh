#!/bin/bash
# Round-3 measurement batch 11 (fresh container): remaining-traffic census
# + post-winner-direct lane-group sweep.
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

# (1) XLA cost census of the FULL batched program (defaults)
run cost_full tools/prof_cost.py --frames 64 --rows 40 --groups 2 \
    --trace-rows 40 --top 40
# (2) interleaved lane-group sweep at FULL (G=1 halves shadow grid steps)
run gsweep tools/prof_pipeline.py --frames 64 --rows 40 --groups 1 2 \
    --trace-rows 40 --iters 6
echo "$(date +%T) ALL DONE 11" | tee -a $LOG/session.log
