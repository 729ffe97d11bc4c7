#!/bin/bash
# Round-3 measurement batch 5 (waits for batch 4): same-process
# decomposition of the shadow stage — upto=prep cut vs empty kernel vs
# full kernel, interleaved.  Splits the stage into (a) XLA prep->kernel
# glue (pads/stacks/meta/szr), (b) window/grid floor, (c) kernel body.
set -u
cd "$(dirname "$0")/.."

for i in $(seq 1 240); do
  grep -q "ALL DONE 7" /root/r3log/session.log 2>/dev/null && break
  sleep 30
done

run() {
  name=$1; shift
  echo "$(date +%T) START $name" | tee -a /root/r3log/session.log
  timeout 2400 python -u "$@" > "/root/r3log/$name.log" 2>&1
  rc=$?
  echo "$(date +%T) END $name rc=$rc" | tee -a /root/r3log/session.log
}

run floor_split tools/prof_shadow_ablate.py --kernel shadow \
    --frames 64 --rows 40 --groups 2 --trace-rows 40 --iters 5 \
    --ablate cut:prep empty None
run floor_split_trace tools/prof_shadow_ablate.py --kernel trace \
    --frames 64 --rows 40 --groups 2 --trace-rows 40 --iters 5 \
    --ablate cut:geom cut:texp empty None
echo "$(date +%T) ALL DONE 8" | tee -a /root/r3log/session.log
