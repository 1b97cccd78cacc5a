#!/bin/bash
# Round-15 ANN decade probe (VERDICT r14 Next #1 — the retracted r14
# claim, now actually run): 100M vectors, adaptive k = semDedupCells
# (1e8) = 1414, nprobe = sqrt(k) ~ 38, via the DISK-PUBLISHED
# lifecycle (SPARK_GRAFT_ANN_PUBLISH_DIR): bounded-sample Lloyd ->
# full map-side assignment -> IvfStore.save's versioned publish ->
# served from the artifact. The health capture then boots from the
# SAME artifact (SPARK_GRAFT_HEALTH_DIR) — build once, serve from
# storage.
# Usage: scripts/ann100m_r15.sh [outDir]
set -euo pipefail
OUT="${1:-/root/repo}"
cd /root/repo

free_gb() { df -BG --output=avail / | tail -1 | tr -dc 0-9; }
# effective headroom counts what this script can reclaim or has
# already paid for: the stale index is rm'd before the rebuild, and a
# finished corpus (25G) no longer needs to fit in "free"
RECLAIM=$(du -sBG /tmp/ivf100m 2>/dev/null | tr -dc 0-9); RECLAIM=${RECLAIM:-0}
EFF=$(( $(free_gb) + RECLAIM ))
if [ -f /tmp/vec100m/.done ]; then NEED=50; else NEED=75; fi
if [ "$EFF" -lt "$NEED" ]; then
  echo "ABORT: need >=${NEED}G effective (free+reclaimable index) for the 100M lifecycle, have ${EFF}G"
  exit 1
fi

if [ ! -f /tmp/vec100m/.done ]; then
  echo "=== gen /tmp/vec100m (factor 50000, vectors) ==="
  SPARK_DRIVER_MEM=64g scripts/run_main.sh graft.tools.GenScale \
    /root/testdata/sf0.1 /tmp/vec100m 50000 vectors > /tmp/gen_vec100m.log 2>&1
  touch /tmp/vec100m/.done
fi
du -sh /tmp/vec100m

wait_idle() {
  while :; do
    local l
    l=$(cut -d' ' -f1 /proc/loadavg)
    awk -v l="$l" 'BEGIN{exit !(l < 8)}' && break
    echo "    (load $l >= 8, cooling down)"; sleep 20
  done
}

if ! { [ -f "$OUT/ANNPROBE_VEC100M_r15.json" ] && \
       head -c 120 "$OUT/ANNPROBE_VEC100M_r15.json" | grep -q '"degraded":false'; }; then
  wait_idle
  echo "=== AnnProbe 100M (disk-published) ==="
  # 64 probes, not the 1000 default: the search window exchanges
  # n_probes*nprobe*n/k candidate rows, and at 100M/k=1414/nprobe=38
  # even 200 probes (~13 GB raw + map/reduce sort spill) overran the
  # ~14 GB this host has free beside the 25G corpus + 39G index —
  # both r15 attempts died there. 64 probes keep per-probe cost (the
  # measured number) identical at ~4 GB of shuffle. The published
  # index is REUSED if present (AnnProbe build_reused) — a retry must
  # not pay the rebuild; rm -rf /tmp/ivf100m to force one.
  SPARK_GRAFT_ANN_PUBLISH_DIR=/tmp/ivf100m \
  SPARK_GRAFT_ANN_PROBES=64 \
  SPARK_GRAFT_ANN_RECALL_PROBES=50 SPARK_GRAFT_ANN_RUNS=1 \
  SPARK_DRIVER_MEM=64g scripts/run_main.sh graft.sim.AnnProbe \
    /tmp/vec100m "$OUT/ANNPROBE_VEC100M_r15.json" > /tmp/annprobe_100m.log 2>&1
  echo "--- $(head -c 400 "$OUT/ANNPROBE_VEC100M_r15.json")"
fi

# 60k vec/s, not the r14-planned 100k: the health row's marginal cost
# is a k-row agg, but the batch's own assignment is ~90k MACs/row at
# k=1414 — this host's measured assignment capacity is ~1.7e5 rows/s
# (the 100M build: 1e8 rows in ~10 min), so 100k/s has no headroom
# and the first slow batch starts a backlog death spiral (observed:
# 4 batches in 18 min). 60k/s ≈ 35% capacity is the honest stable
# point for ONE 32-core host serving a k=1414 index.
if ! { [ -f "$OUT/STREAMPROBE_HEALTH60K_VEC100M_r15.json" ] && \
       head -c 120 "$OUT/STREAMPROBE_HEALTH60K_VEC100M_r15.json" | grep -q '"degraded":false'; }; then
  wait_idle
  echo "=== st_index_health @ 60k vec/s against the 100M/k=1414 artifact ==="
  SPARK_GRAFT_HEALTH_DIR=/tmp/ivf100m SPARK_DRIVER_MEM=48g scripts/run_main.sh \
    graft.tools.StreamThroughputProbe st_index_health /tmp/vec100m 60000 110 \
    "$OUT/STREAMPROBE_HEALTH60K_VEC100M_r15.json" > /tmp/tput_health100m.log 2>&1
  echo "--- $(head -c 400 "$OUT/STREAMPROBE_HEALTH60K_VEC100M_r15.json")"
fi
echo ANN100M_DONE
