#!/bin/bash
# Stage-2 chip-return checklist: runs AFTER tools/chip_watch.sh finishes its
# serial post-outage suite (that script was already mid-execution when the
# serving layer landed, and appending to a running bash script is unsafe).
# Waits for "ALL DONE" in /tmp/chip_return.status, then load-tests the
# online serving stack on the real chip.
#
# Launch:  setsid nohup bash tools/chip_watch_stage2.sh > /tmp/chip_watch2.log 2>&1 &
set -u
cd /root/repo

STATUS=/tmp/chip_return.status
HORIZON_S=$((26 * 3600))
START=$(date +%s)

while ! grep -q "ALL DONE" "$STATUS" 2>/dev/null; do
  if (( $(date +%s) - START > HORIZON_S )); then
    echo "stage2: horizon reached, stage1 never finished" >> "$STATUS"
    exit 0
  fi
  sleep 120
done

while [ -e /tmp/host_busy ]; do sleep 60; done

run() {
  local name=$1; shift
  echo "RUN $name $(date -u +%FT%TZ)" >> "$STATUS"
  timeout 3600 "$@" > "/tmp/r7_${name}.out" 2> "/tmp/r7_${name}.err"
  echo "DONE $name rc=$? $(date -u +%FT%TZ)" >> "$STATUS"
}

# Serving-stack load tests (tools/serve_loadtest.py): HTTP end-to-end and
# in-process, hybrid and sparse. per-request 16 amortizes Python JSON cost;
# the per_request=1 leg measures the worst-case single-query deployment.
# The text legs drive the LIVE model-encode path (tiny family).
run serve_hybrid_http   python tools/serve_loadtest.py --mode hybrid --transport http --per-request 16
run serve_hybrid_http1  python tools/serve_loadtest.py --mode hybrid --transport http --n-queries 4096
run serve_sparse_inproc python tools/serve_loadtest.py --mode sparse --transport inproc
run serve_text_hybrid   python tools/serve_loadtest.py --mode hybrid --transport http --query-kind text --docs 5000 --n-queries 4096 --per-request 16
run serve_text_inproc   python tools/serve_loadtest.py --mode sparse --transport inproc --query-kind text --docs 5000 --n-queries 4096
echo "STAGE2 DONE $(date -u +%FT%TZ)" >> "$STATUS"
