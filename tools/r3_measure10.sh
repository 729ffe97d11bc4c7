#!/bin/bash
# Round-3 measurement batch 10 (fresh container): recover the lost glue
# split + fresh post-winner-direct stage cuts.
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

# (1) shadow stage split: prep-cut vs inputs-glue vs empty vs full
run glue_split tools/prof_shadow_ablate.py --kernel shadow \
    --frames 64 --rows 40 --groups 2 --trace-rows 40 --iters 5 \
    --ablate cut:prep inputs empty None
# (2) fresh stage cuts, post-winner-direct defaults
run stages tools/prof_pipeline.py --frames 64 --rows 40 --groups 2 \
    --trace-rows 40 --iters 4 --stages
echo "$(date +%T) ALL DONE 10" | tee -a $LOG/session.log
