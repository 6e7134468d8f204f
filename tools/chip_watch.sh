#!/bin/bash
# Chip-return watcher (round 7). The axon relay chip has been through multi-
# day outages (see CLAUDE.md round-5/6 logs); this script probes every 5 min
# in a SUBPROCESS (in-process init hangs ~20 min and poisons the backend
# cache) and, on first success, runs the post-outage checklist serially:
#   bench.py -> tpu_checks -> dense_ab -> engine_ab -> corpus_e2e
#   -> latency_profile (both wires)
# logging to /tmp/r7_*.{out,err} and writing /tmp/chip_return.status.
# It waits on /tmp/host_busy (touch while running pytest or other host load
# so the CPU baseline inside bench.py stays quiet-host).
#
# Launch:  setsid nohup bash tools/chip_watch.sh > /tmp/chip_watch.log 2>&1 &
set -u
cd /root/repo

HORIZON_S=$((24 * 3600))
START=$(date +%s)
STATUS=/tmp/chip_return.status

probe() {
  timeout 150 python - <<'EOF' >/dev/null 2>&1
import jax
import jax.numpy as jnp
d = jax.devices()
assert d and d[0].platform != "cpu", d
x = jnp.ones((128, 128))
assert float(jnp.sum(x @ x)) == 128.0 * 128 * 128
EOF
}

echo "watcher start $(date -u +%FT%TZ)" > "$STATUS"

while true; do
  NOW=$(date +%s)
  if (( NOW - START > HORIZON_S )); then
    echo "horizon reached $(date -u +%FT%TZ), chip never returned" >> "$STATUS"
    exit 0
  fi
  if probe; then
    echo "chip UP $(date -u +%FT%TZ)" >> "$STATUS"
    break
  fi
  echo "probe fail $(date -u +%FT%TZ)" >> "$STATUS"
  sleep 300
done

# Wait for a quiet host before timing anything (pytest etc. touch this).
while [ -e /tmp/host_busy ]; do
  echo "host busy, waiting $(date -u +%FT%TZ)" >> "$STATUS"
  sleep 60
done

run() {
  local name=$1; shift
  echo "RUN $name $(date -u +%FT%TZ)" >> "$STATUS"
  timeout 3600 "$@" > "/tmp/r7_${name}.out" 2> "/tmp/r7_${name}.err"
  echo "DONE $name rc=$? $(date -u +%FT%TZ)" >> "$STATUS"
}

run bench          python bench.py
run tpu_checks     python tools/tpu_checks.py
run dense_ab       python tools/dense_ab.py
run engine_ab      python tools/engine_ab.py
run corpus_e2e     python tools/corpus_e2e.py
run latency_i32    python tools/latency_profile.py --wire i32 --depth 1000
run latency_c48    python tools/latency_profile.py --wire compact48 --depth 1000
run ann_ab         python tools/ann_ab.py
run live_ab        python tools/live_ab.py
echo "ALL DONE $(date -u +%FT%TZ)" >> "$STATUS"
