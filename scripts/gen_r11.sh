#!/bin/bash
# Round-11 corpus regeneration (the harness /tmp was wiped): the same
# recipes as r9/r10 — replica 10x, fresh 100x, events 300x, clustered
# vectors at 100x/1000x/2500x, plus the NEW 10000x (20M-vector) point
# the r10 verdict asked for. Serialized; each writes a marker so a
# partial run is visible.
# Usage: scripts/gen_r11.sh
set -euo pipefail
SRC=/root/testdata/sf0.1
gen() { # out factor mode mem
  local out="$1" factor="$2" mode="$3" mem="$4"
  if [ -f "$out/.done" ]; then echo "=== $out exists, skipping ==="; return; fi
  echo "=== gen $out (factor $factor, $mode) ==="
  SPARK_DRIVER_MEM="$mem" scripts/run_main.sh graft.tools.GenScale \
    "$SRC" "$out" "$factor" "$mode" > "/tmp/gen_$(basename "$out").log" 2>&1
  touch "$out/.done"
  echo "--- $out done"
}
gen /tmp/sf1       10    replica 16g
gen /tmp/sf1_fresh 10    fresh   16g
gen /tmp/sf10      100   fresh   24g
gen /tmp/ev300     300   events  24g
gen /tmp/vec200k   100   vectors 16g
gen /tmp/vec2m     1000  vectors 24g
gen /tmp/vec5m     2500  vectors 32g
gen /tmp/vec20m    10000 vectors 48g
echo ALL_GEN_DONE
