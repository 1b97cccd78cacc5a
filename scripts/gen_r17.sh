#!/bin/bash
# Round-17 corpus regeneration — the harness /tmp was wiped between the
# r17 code session and this capture session, so sf1/sf10 (and the 100M
# artifacts, see ann100m_r17.sh) must be re-staged:
#   sf10 (100x fresh)  : t_domain_rank adjudication + streaming-tail
#                        isolations + the full sweep (probes_r17.sh)
#   sf1  (10x replica) : sf1 bench series
# Usage: scripts/gen_r17.sh
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
gen /tmp/sf10 100 fresh   24g
gen /tmp/sf1  10  replica 16g
echo ALL_GEN_DONE
