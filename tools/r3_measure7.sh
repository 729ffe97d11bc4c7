#!/bin/bash
# Round-3 measurement batch 7 (waits for batch 6): glue-vs-kernel split
# of the shadow stage floor — "inputs" assembles + reads every kernel
# operand without launching the kernel.  empty - inputs = pure grid +
# window floor; inputs - cut:prep = XLA glue (stacks/pads/builds) + one
# read of the operand bytes.
set -u
cd "$(dirname "$0")/.."

for i in $(seq 1 120); do
  grep -q "ALL DONE 9" /root/r3log/session.log 2>/dev/null && break
  sleep 30
done

run() {
  name=$1; shift
  echo "$(date +%T) START $name" | tee -a /root/r3log/session.log
  timeout 3000 python -u "$@" > "/root/r3log/$name.log" 2>&1
  rc=$?
  echo "$(date +%T) END $name rc=$rc" | tee -a /root/r3log/session.log
}

run floor_glue tools/prof_shadow_ablate.py --kernel shadow \
    --frames 64 --rows 40 --groups 2 --trace-rows 40 --iters 5 \
    --ablate cut:prep inputs empty None
echo "$(date +%T) ALL DONE 10" | tee -a /root/r3log/session.log
