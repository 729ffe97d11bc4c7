#!/bin/bash
# Round-3 measurement batch 6: window-by-window decomposition of the
# shadow kernel's 0.114 ms/f empty floor (same-process, interleaved):
# which operand window's per-step DMA/fill is the fixed cost?  Plus the
# same split at G=1 (half the grid steps) anchored by cut:prep.
set -u
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "$(date +%T) START $name" | tee -a /root/r3log/session.log
  timeout 3000 python -u "$@" > "/root/r3log/$name.log" 2>&1
  rc=$?
  echo "$(date +%T) END $name rc=$rc" | tee -a /root/r3log/session.log
}

run floor_wins tools/prof_shadow_ablate.py --kernel shadow \
    --frames 64 --rows 40 --groups 2 --trace-rows 40 --iters 5 \
    --ablate cut:prep empty emptynoptab emptynolists emptynopix emptynotrow
run floor_g1 tools/prof_shadow_ablate.py --kernel shadow \
    --frames 64 --rows 40 --groups 1 --trace-rows 40 --iters 5 \
    --ablate cut:prep empty None
echo "$(date +%T) ALL DONE 9" | tee -a /root/r3log/session.log
