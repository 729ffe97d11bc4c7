#!/bin/bash
# Round-3 follow-up measurement session: waits for r3_measure.sh's sweep to
# finish, then (1) re-verifies TPU parity with the new kernel code paths,
# (2) interleaved-A/Bs the on-demand bitmap build, (3) breaks down the
# shadow-prep XLA chain.  Logs into /root/r3log/.
set -u
cd "$(dirname "$0")/.."

for i in $(seq 1 240); do
  grep -q "ALL DONE" /root/r3log/session.log 2>/dev/null && break
  sleep 30
done

run() {
  name=$1; shift
  echo "$(date +%T) START $name" | tee -a /root/r3log/session.log
  timeout 2400 python -u "$@" > "/root/r3log/$name.log" 2>&1
  rc=$?
  echo "$(date +%T) END $name rc=$rc" | tee -a /root/r3log/session.log
}

run verify tools/verify_tpu.py
run bitmap_ab tools/prof_pipeline.py --frames 64 --rows 40 --groups 2 \
    --trace-rows 40 --bitmap-sweep --iters 4
run prep_loop tools/prof_prep_loop.py --frames 8 --n 17
echo "$(date +%T) ALL DONE 2" | tee -a /root/r3log/session.log
