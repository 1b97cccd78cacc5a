#!/bin/bash
# Round-14 corpus regeneration (the harness /tmp was wiped again):
# only the corpora this round's evidence plan needs —
#   sf1 (10x replica)   : sf1 bench series + host-band A/B (#4)
#   sf10 (100x fresh)   : full sweeps + d_embed_dup adjudication (#1)
#   vec2m               : ANN layout serving capture (#3)
#   vec20m              : base for the >=100M-vector decade probe (#6)
# Serialized; each writes a .done marker so a partial run is visible.
# Usage: scripts/gen_r14.sh
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
gen /tmp/vec2m     1000  vectors 24g
echo ALL_GEN_DONE
