#!/bin/bash
# Round-17 100M captures. The harness /tmp was WIPED between the r17
# code session and this capture session, so the r16 decade artifacts
# this script originally planned to reuse (25 GB corpus + 39 GB
# cid-partitioned index) no longer exist. That inverts the documented
# order: the disk-hungry sf10 sweeps (probes_r17.sh) now run FIRST on
# the ~78 GB-free host — which is itself the cleanest possible
# adjudication of the r16 t_domain_rank IOException (same query, same
# geometry, no resident artifacts) — and THEN this script rebuilds the
# decade artifacts and takes the one capture that needs them:
#  1. Rebuild: vec100m corpus (GenScale factor 50000 vectors, ~25 GB,
#     clustered distribution — identical generator + seed to r15/r16,
#     so k=1414 geometry and cid skew reproduce), then IvfPublish
#     cid-partitioned map-side layout (SPARK_GRAFT_IVF_NO_EXCHANGE=1,
#     ~39 GB), the same build the r16 serving A/B measured.
#  2. ADC serving confirmation at 100M (VERDICT r16 Next #6): st_ann
#     in ADC mode (SPARK_GRAFT_ANN_ADC=1) boots from the partitioned
#     artifact and serves the production composition (route x PQ ADC
#     scan x exact re-rank) per micro-batch under the REGISTERED
#     divisor-8 shortlist rule — no env override; the artifact
#     self-describes the resolved rule. Fixed 8-probe batches
#     (rate-micro-batch pacing: per-probe cost x any wall-clock rate
#     > 1 here, so a rate source would spiral by construction), p50/
#     p95 batch latency from the stream, then the served-recall eval
#     AFTER the stream drives the SAME serve function over the
#     standard corpus-drawn recall probes (vec_id in [2000,2050)) vs
#     exact brute force — recall_adc_served is directly comparable to
#     ANNPROBE_VEC100M_RULE8_r16's search-side 0.993.
#  3. Artifact cleanup, gated on step 2 being clean.
# Usage: scripts/ann100m_r17.sh [outDir]
set -euo pipefail
OUT="${1:-/root/repo}"
cd /root/repo
. scripts/lib_r17.sh

free_gb() { df -BG --output=avail / | tail -1 | tr -dc 0-9; }

# 1. Rebuild the decade artifacts (corpus, then partitioned publish).
if ! have_clean_probe "$OUT/ANNSERVE_ADC_VEC100M_RULE8_r17.json"; then
  if [ ! -f /tmp/vec100m/.done ]; then
    [ "$(free_gb)" -ge 70 ] || \
      { echo "ABORT: need >=70G free for corpus+index, have $(free_gb)G"; exit 1; }
    echo "=== gen /tmp/vec100m (factor 50000, vectors) ==="
    SPARK_DRIVER_MEM=64g scripts/run_main.sh graft.tools.GenScale \
      /root/testdata/sf0.1 /tmp/vec100m 50000 vectors > /tmp/gen_vec100m.log 2>&1
    touch /tmp/vec100m/.done
  fi
  du -sh /tmp/vec100m
  if [ ! -f /tmp/ivf100m_part/manifest/0 ]; then
    echo "=== publish 100M cid-partitioned (map-side layout) ==="
    rm -rf /tmp/ivf100m_part
    SPARK_GRAFT_IVF_NO_EXCHANGE=1 SPARK_GRAFT_IVF_WRITE_PARTS=32 \
    SPARK_DRIVER_MEM=64g scripts/run_main.sh graft.sim.IvfPublish \
      /tmp/vec100m /tmp/ivf100m_part partitioned > /tmp/ivfpub_100m_r17.log 2>&1
    tail -1 /tmp/ivfpub_100m_r17.log
  fi

  # 2. ADC serve from the partitioned decade artifact.
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

# 3. Free the decade artifacts — only once the capture above is clean
# (they take ~50 min of build time to stage; deleting them under a
# dirty capture would force a full rebuild to retry).
if have_clean_probe "$OUT/ANNSERVE_ADC_VEC100M_RULE8_r17.json"; then
  echo "=== freeing 100M artifacts (capture clean) ==="
  rm -rf /tmp/ivf100m_part /tmp/vec100m
  rm -rf /tmp/graft_es_sink* /tmp/graft_kafka_sink* /tmp/graft_ivf_pub* \
    /tmp/adc_large* /tmp/dedup_store_hot* /tmp/embed_clustered* \
    /tmp/cd1* /tmp/cd4* /tmp/cd5* /tmp/cont1* /tmp/cont4* 2>/dev/null || true
  df -h / | tail -1
fi
echo ANN100M_R17_DONE
