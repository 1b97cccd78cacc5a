#!/bin/bash
# Round-9 evidence runs (VERDICT r8 #1): ANN + text-graph family
# probes at 10x and 100x, serialized so no run contends with another.
# Usage: scripts/probes_r9.sh <outDir>
set -euo pipefail
OUT="${1:-/tmp/probes_r9}"
mkdir -p "$OUT"

ANN=s_brute_topk,s_lsh_ann,s_ivf_search,s_ivf_adc,s_ivf_adc_residual,s_filtered_ann,st_ann
TG=t_domain_rank,t_bpe_merges,t_bpe_encode

run() { # name sfdir subset mem
  echo "=== probe $1 ($2) ==="
  SPARK_GRAFT_SF_DIR="$2" SPARK_GRAFT_ONLY="$3" SPARK_DRIVER_MEM="$4" \
    SPARK_GRAFT_BENCH_OUT="$OUT/$1.json" \
    scripts/run_main.sh graft.Bench > "$OUT/$1.log" 2>&1
  echo "--- $1 done"
}

run ann_sf1       /tmp/sf1       "$ANN" 24g
run ann_sf10      /tmp/sf10      "$ANN" 48g
run tg_sf1_fresh  /tmp/sf1_fresh "$TG"  24g
run tg_sf10       /tmp/sf10      "$TG"  48g
echo ALL_PROBES_DONE
