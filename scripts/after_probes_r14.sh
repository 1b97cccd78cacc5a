#!/bin/bash
# Round-14 follow-up chain: waits for probes_r14.sh, recompiles (the
# dense-batch prune skip + HEALTH_DIR/PUBLISH_DIR hooks land here),
# captures the SPARSE-batch serving regime the rate-50 pair showed the
# pruning win actually lives in (5 probes/s -> ~5*nprobe of k=200
# cells per batch), then hands off to the 100M decade probe.
# Usage: scripts/after_probes_r14.sh [outDir]
set -euo pipefail
OUT="${1:-/root/repo}"
cd /root/repo

echo "=== waiting for probes_r14 to finish ==="
while ! grep -q ALL_PROBES_DONE /tmp/probes_r14.log 2>/dev/null; do sleep 30; done
echo "=== compiling HEAD (prune skip + probe hooks) ==="
sbt -batch compile > /tmp/after_probes_compile.log 2>&1

wait_idle() {
  while :; do
    local l
    l=$(cut -d' ' -f1 /proc/loadavg)
    awk -v l="$l" 'BEGIN{exit !(l < 8)}' && break
    echo "    (load $l >= 8, cooling down)"; sleep 20
  done
}

cap() { # outfile rate extra-env...
  local outfile="$1" rate="$2"; shift 2
  if [ -f "$OUT/$outfile" ] && head -c 120 "$OUT/$outfile" | grep -q '"degraded":false'; then
    echo "=== $outfile clean, skipping ==="; return
  fi
  wait_idle
  echo "=== st_ann sparse @ $rate -> $outfile ($*) ==="
  env "$@" SPARK_GRAFT_HEALTH_ADAPTIVE=1 SPARK_DRIVER_MEM=48g scripts/run_main.sh \
    graft.tools.StreamThroughputProbe st_ann /tmp/vec2m "$rate" 110 \
    "$OUT/$outfile" > "/tmp/tput_$(basename "$outfile" .json).log" 2>&1
  echo "--- $outfile: $(head -c 300 "$OUT/$outfile")"
}

cap STREAMPROBE_ANN5_K200_PART_r14.json 5 SPARK_GRAFT_ANN_PARTITIONED=1
cap STREAMPROBE_ANN5_K200_CTRL_r14.json 5

echo "=== handing off to the 100M decade probe ==="
exec scripts/ann100m_r14.sh "$OUT"
