#!/bin/bash
# Round-16 100M-vector captures, serialized AFTER probes_r16.sh
# (timed captures never overlap). Reuses the r15-published flat index
# at /tmp/ivf100m (AnnProbe build_reused) for steps 1-2, then — and
# only then — trades it for a cid-PARTITIONED republish for step 3
# (this host cannot hold two 39 GB layouts at once).
#  1. The 100M health-stream capture (VERDICT r15 Next #2): the
#     missing half of r14 Next #1, at the measured-sustainable
#     60k vec/s against the k=1414 artifact.
#  2. recall_adc adjudication at the 100M regime (VERDICT r15 Next
#     #5): one shortlist point at divisor 8 (cand/8 = 335926 vs the
#     rule's cand/12 = 223950 that read 0.947) — either recall_adc@3
#     >= 0.95 and the rule gets amended, or the decade knee is
#     documented. FETCH_BC=1 pins the slim-shortlist broadcast fetch
#     (344 MB raw is past the 256 MB rule cutoff, but local mode
#     holds ONE copy; the artifact records fetch_broadcast).
#  3. Sparse-batch serving at 100M (VERDICT r15 Next #6): republish
#     cid-partitioned (IvfPublish, map-side layout — the exchange
#     variant needs corpus + ~35 GB shuffle + 39 GB stage at once),
#     then st_ann booted from the artifact at rate 1 — pruned
#     (deploy-rule side) vs PRUNE=0 flat-scan control on the SAME
#     artifact, p50/p95 batch latency.
# Usage: scripts/ann100m_r16.sh [outDir]
set -euo pipefail
OUT="${1:-/root/repo}"
cd /root/repo

wait_idle() {
  while :; do
    local l
    l=$(cut -d' ' -f1 /proc/loadavg)
    awk -v l="$l" 'BEGIN{exit !(l < 8)}' && break
    echo "    (load $l >= 8, cooling down)"; sleep 20
  done
}

have_clean() {
  [ -f "$OUT/$1" ] && head -c 120 "$OUT/$1" | grep -q '"degraded":false'
}

[ -f /tmp/vec100m/.done ] || { echo "ABORT: /tmp/vec100m corpus missing"; exit 1; }

# 1. 100M health stream at 60k vec/s. RATE_PARTS=32: the rate
# source's partitions ARE the map-side parallelism of the k=1414
# assignment (~90k MACs/row) — at the probe's historical 4 source
# partitions the capture is a 4-core measurement (~33k rows/s
# observed, a backlog spiral at 60k); sized to the host's cores the
# same assignment sustains ~8x that, and 60k/s is ~30% utilization.
if ! have_clean STREAMPROBE_HEALTH60K_VEC100M_r16.json; then
  wait_idle
  echo "=== st_index_health @ 60k vec/s against the 100M/k=1414 artifact ==="
  SPARK_GRAFT_HEALTH_DIR=/tmp/ivf100m SPARK_GRAFT_RATE_PARTS=32 \
  SPARK_DRIVER_MEM=48g scripts/run_main.sh \
    graft.tools.StreamThroughputProbe st_index_health /tmp/vec100m 60000 110 \
    "$OUT/STREAMPROBE_HEALTH60K_VEC100M_r16.json" > /tmp/tput_health100m_r16.log 2>&1
  echo "--- $(head -c 400 "$OUT/STREAMPROBE_HEALTH60K_VEC100M_r16.json")"
fi

# 2. ADC shortlist divisor-8 point (cand/8; the rule's cand/12 read
# 0.947 at this geometry). Reuses the published flat index.
if ! have_clean ANNPROBE_VEC100M_SL8_r16.json; then
  wait_idle
  echo "=== AnnProbe 100M, shortlist cand/8 ==="
  SPARK_GRAFT_ANN_PUBLISH_DIR=/tmp/ivf100m \
  SPARK_GRAFT_ANN_PROBES=64 SPARK_GRAFT_ANN_SHORTLIST=335926 \
  SPARK_GRAFT_ANN_FETCH_BC=1 \
  SPARK_GRAFT_ANN_RECALL_PROBES=50 SPARK_GRAFT_ANN_RUNS=1 \
  SPARK_DRIVER_MEM=64g scripts/run_main.sh graft.sim.AnnProbe \
    /tmp/vec100m "$OUT/ANNPROBE_VEC100M_SL8_r16.json" > /tmp/annprobe_100m_sl8.log 2>&1
  echo "--- $(head -c 400 "$OUT/ANNPROBE_VEC100M_SL8_r16.json")"
fi

# 3. Sparse-batch serving A/B on a cid-partitioned 100M artifact.
# The republish DESTROYS the flat index first (steps 1-2 must be
# clean; disk cannot hold both layouts).
if ! { have_clean ANNSERVE_VEC100M_PRUNED_r16.json && \
       have_clean ANNSERVE_VEC100M_FLAT_r16.json; }; then
  if [ ! -f /tmp/ivf100m_part/manifest/0 ]; then
    have_clean STREAMPROBE_HEALTH60K_VEC100M_r16.json || \
      { echo "ABORT: health capture not clean; not destroying flat index"; exit 1; }
    have_clean ANNPROBE_VEC100M_SL8_r16.json || \
      { echo "ABORT: SL8 capture not clean; not destroying flat index"; exit 1; }
    echo "=== republish 100M cid-partitioned (map-side layout) ==="
    rm -rf /tmp/ivf100m /tmp/ivf100m_part
    SPARK_GRAFT_IVF_NO_EXCHANGE=1 SPARK_GRAFT_IVF_WRITE_PARTS=32 \
    SPARK_DRIVER_MEM=64g scripts/run_main.sh graft.sim.IvfPublish \
      /tmp/vec100m /tmp/ivf100m_part partitioned > /tmp/ivfpub_100m.log 2>&1
    tail -1 /tmp/ivfpub_100m.log
  fi
  # rate 1 keeps even backlogged batches SPARSE (a 30 s batch
  # accumulates 30 probes x nprobe 38 = 1140 cells < k=1414, so the
  # pruning branch stays live); 40 batches, 30 steady after warmup.
  if ! have_clean ANNSERVE_VEC100M_PRUNED_r16.json; then
    wait_idle
    echo "=== st_ann pruned serve (deploy-rule side) ==="
    SPARK_GRAFT_HEALTH_DIR=/tmp/ivf100m_part \
    SPARK_GRAFT_TPUT_TIMEOUT_MS=3600000 SPARK_DRIVER_MEM=48g scripts/run_main.sh \
      graft.tools.StreamThroughputProbe st_ann /tmp/vec100m 1 40 \
      "$OUT/ANNSERVE_VEC100M_PRUNED_r16.json" > /tmp/annserve_pruned.log 2>&1
    echo "--- $(head -c 400 "$OUT/ANNSERVE_VEC100M_PRUNED_r16.json")"
  fi
  if ! have_clean ANNSERVE_VEC100M_FLAT_r16.json; then
    wait_idle
    echo "=== st_ann flat-scan control (PRUNE=0, same artifact) ==="
    SPARK_GRAFT_HEALTH_DIR=/tmp/ivf100m_part SPARK_GRAFT_ANN_PRUNE=0 \
    SPARK_GRAFT_TPUT_TIMEOUT_MS=3600000 SPARK_DRIVER_MEM=48g scripts/run_main.sh \
      graft.tools.StreamThroughputProbe st_ann /tmp/vec100m 1 40 \
      "$OUT/ANNSERVE_VEC100M_FLAT_r16.json" > /tmp/annserve_flat.log 2>&1
    echo "--- $(head -c 400 "$OUT/ANNSERVE_VEC100M_FLAT_r16.json")"
  fi
fi
echo ANN100M_R16_DONE
