#!/bin/bash
# Round-17 100M captures — runs FIRST this round (before
# probes_r17.sh), because step 2 frees the ~64 GB of resident 100M
# artifacts that the r16 sf10 sweep died beside (t_domain_rank,
# IOException in stage materialization at ~14 GB free disk — VERDICT
# r16 What's-wrong #1). Order is therefore: take the one capture that
# still needs the artifacts, then delete them, then let probes_r17.sh
# run the disk-hungry sf10 sweeps on a ~78 GB-free host.
#  1. ADC serving confirmation at 100M (VERDICT r16 Next #6): st_ann
#     in ADC mode (SPARK_GRAFT_ANN_ADC=1) boots from the r16
#     cid-partitioned artifact and serves the production composition
#     (route x PQ ADC scan x exact re-rank) per micro-batch under the
#     REGISTERED divisor-8 shortlist rule — no env override; the
#     artifact self-describes the resolved rule. Fixed 8-probe batches
#     (rate-micro-batch pacing: per-probe cost x any wall-clock rate
#     > 1 here, so a rate source would spiral by construction), p50/
#     p95 batch latency from the stream, then the served-recall eval
#     AFTER the stream drives the SAME serve function over the
#     standard corpus-drawn recall probes (vec_id in [2000,2050)) vs
#     exact brute force — recall_adc_served is directly comparable to
#     ANNPROBE_VEC100M_RULE8_r16's search-side 0.993.
#  2. Artifact cleanup, gated on step 1 being clean.
# Usage: scripts/ann100m_r17.sh [outDir]
set -euo pipefail
OUT="${1:-/root/repo}"
cd /root/repo
. scripts/lib_r17.sh

# 1. ADC serve from the partitioned decade artifact.
if ! have_clean_probe "$OUT/ANNSERVE_ADC_VEC100M_RULE8_r17.json"; then
  [ -f /tmp/vec100m/.done ] || { echo "ABORT: /tmp/vec100m corpus missing"; exit 1; }
  [ -f /tmp/ivf100m_part/manifest/0 ] || \
    { echo "ABORT: /tmp/ivf100m_part artifact missing"; exit 1; }
  wait_idle
  echo "=== st_ann ADC serve (divisor-8 rule) from the partitioned 100M artifact ==="
  SPARK_GRAFT_HEALTH_DIR=/tmp/ivf100m_part SPARK_GRAFT_ANN_ADC=1 \
  SPARK_GRAFT_ROWS_PER_BATCH=8 SPARK_GRAFT_TPUT_WARMUP=3 \
  SPARK_GRAFT_RATE_PARTS=32 SPARK_GRAFT_ANN_RECALL_PROBES=50 \
  SPARK_GRAFT_TPUT_TIMEOUT_MS=3600000 SPARK_DRIVER_MEM=64g scripts/run_main.sh \
    graft.tools.StreamThroughputProbe st_ann /tmp/vec100m 1 13 \
    "$OUT/ANNSERVE_ADC_VEC100M_RULE8_r17.json" > /tmp/annserve_adc_r17.log 2>&1
  echo "--- $(head -c 500 "$OUT/ANNSERVE_ADC_VEC100M_RULE8_r17.json")"
fi

# 2. Free the decade artifacts for the sf10 sweeps — only once the
# capture above is clean (these took ~50 min of build time to stage;
# deleting them under a dirty capture would force a full rebuild to
# retry).
if have_clean_probe "$OUT/ANNSERVE_ADC_VEC100M_RULE8_r17.json"; then
  echo "=== freeing 100M artifacts (capture clean) ==="
  rm -rf /tmp/ivf100m_part /tmp/vec100m
  rm -rf /tmp/graft_es_sink* /tmp/graft_kafka_sink* /tmp/graft_ivf_pub* \
    /tmp/adc_large* /tmp/dedup_store_hot* /tmp/embed_clustered* \
    /tmp/cd1* /tmp/cd4* /tmp/cd5* /tmp/cont1* /tmp/cont4* 2>/dev/null || true
  df -h / | tail -1
fi
echo ANN100M_R17_DONE
