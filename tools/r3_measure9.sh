#!/bin/bash
# Round-3 measurement batch 9: winner-direct shadow inputs (A/B masked
# packed picks ride straight into the shadow kernel; szidx/bg/ent/oy/oz
# derive in VMEM) + half-pair membership tables (no XLA combine pass).
# (1) interleaved winner-vs-legacy x G sweep, (2) fresh glue split,
# (3) TPU parity, (4) bench.
set -u
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "$(date +%T) START $name" | tee -a /root/r3log/session.log
  timeout 3000 python -u "$@" > "/root/r3log/$name.log" 2>&1
  rc=$?
  echo "$(date +%T) END $name rc=$rc" | tee -a /root/r3log/session.log
}

run winner_sweep tools/prof_pipeline.py --frames 64 --rows 40 \
    --groups 1 2 --trace-rows 40 --iters 4 --winner-sweep
run glue_winner tools/prof_shadow_ablate.py --kernel shadow \
    --frames 64 --rows 40 --groups 2 --trace-rows 40 --iters 5 \
    --ablate cut:prep inputs empty None
run verify_winner tools/verify_tpu.py
run bench_winner bench.py
echo "$(date +%T) ALL DONE 12" | tee -a /root/r3log/session.log
