#!/bin/bash
# Round-3 measurement session: waits for the TPU tunnel, then runs the
# profiling + bench sequence unbuffered into /root/r3log/.
# Usage: bash tools/r3_measure.sh [max_wait_probes]
set -u
cd "$(dirname "$0")/.."
mkdir -p /root/r3log

probes=${1:-200}
echo "$(date +%T) waiting for device (up to $probes probes)..."
ok=0
for i in $(seq 1 "$probes"); do
  r=$(timeout 90 python -c "
from pixel_art_raytracer_tpu.utils.device import require_device
print(require_device(75))" 2>/dev/null | tail -1)
  if [ -n "$r" ] && [ "$r" != "cpu" ]; then
    echo "$(date +%T) device up: $r (probe $i)"; ok=1; break
  fi
  sleep 90
done
if [ "$ok" != 1 ]; then echo "$(date +%T) device never came up"; exit 1; fi

run() {
  name=$1; shift
  echo "$(date +%T) START $name" | tee -a /root/r3log/session.log
  timeout 2400 python -u "$@" > "/root/r3log/$name.log" 2>&1
  rc=$?
  echo "$(date +%T) END $name rc=$rc" | tee -a /root/r3log/session.log
}

run bench bench.py
run stages tools/prof_pipeline.py --stages --frames 64 --rows 40 \
    --groups 2 --trace-rows 40 --iters 3
run geom tools/prof_geom.py 64
run sweep tools/prof_pipeline.py --frames 64 --rows 40 8 --groups 2 4 \
    --trace-rows 40 --iters 3
echo "$(date +%T) ALL DONE" | tee -a /root/r3log/session.log
