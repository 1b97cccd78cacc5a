#!/bin/bash
# Round-12 corpus regeneration (the harness /tmp was wiped again):
# only the corpora this round's evidence plan needs —
#   sf1 (10x replica)   : sf1 bench series
#   sf10 (100x fresh)   : full sweep + the three spike adjudications
#   docs1000 (1000x docs): pair-family decade (d_minhash_lsh /
#                          d_containment / d_incremental) + t_dsir heap
#   vec200k / vec2m     : IvfStore.add staleness probe (ADDPROBE)
# Serialized; each writes a .done marker so a partial run is visible.
# Usage: scripts/gen_r12.sh
set -euo pipefail
SRC=/root/testdata/sf0.1
cd /root/repo
gen() { # out factor mode mem
  local out="$1" factor="$2" mode="$3" mem="$4"
  if [ -f "$out/.done" ]; then echo "=== $out exists, skipping ==="; return; fi
  echo "=== gen $out (factor $factor, $mode) ==="
  SPARK_DRIVER_MEM="$mem" scripts/run_main.sh graft.tools.GenScale \
    "$SRC" "$out" "$factor" "$mode" > "/tmp/gen_$(basename "$out").log" 2>&1
  touch "$out/.done"
  echo "--- $out done"
}
gen /tmp/sf10      100   fresh   24g
gen /tmp/sf1       10    replica 16g
gen /tmp/docs1000  1000  docs    32g
gen /tmp/vec200k   100   vectors 16g
gen /tmp/vec2m     1000  vectors 24g
echo ALL_GEN_DONE
