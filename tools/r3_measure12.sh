#!/bin/bash
# Round-3 measurement batch 12: kernel-side trace-table lane expansion
# (A/B + TPU parity with the new defaults kexp=on, G=1).
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

# (1) TPU parity with the new defaults (kexp on, G=1) — Mosaic lowering
#     of the in-kernel HIGHEST dot must both compile and agree bit-exact.
run verify_kexp tools/verify_tpu.py
# (2) interleaved kexp A/B at FULL
run kexp_sweep tools/prof_pipeline.py --frames 64 --rows 40 --groups 1 \
    --trace-rows 40 --iters 6 --kexp-sweep
echo "$(date +%T) ALL DONE 12" | tee -a $LOG/session.log
