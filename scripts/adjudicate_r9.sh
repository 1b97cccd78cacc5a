#!/bin/bash
# Round-9 adjudication runs (VERDICT r8 #3, #4, #6), serialized:
#  - d_simhash vs d_simhash_compact at sf1, min-of-3 matched load
#  - d_prefix_containment isolated at sf1, min-of-3
#  - st_sessions/st_alerts at 100x: in-memory vs tuned RocksDB
# Usage: scripts/adjudicate_r9.sh <outDir>
set -euo pipefail
OUT="${1:-/tmp/adj_r9}"
mkdir -p "$OUT"

run() { # name sfdir subset mem runs extra-env...
  local name="$1" sfdir="$2" subset="$3" mem="$4" runs="$5"; shift 5
  echo "=== $name ($sfdir runs=$runs $*) ==="
  env "$@" SPARK_GRAFT_SF_DIR="$sfdir" SPARK_GRAFT_ONLY="$subset" \
    SPARK_DRIVER_MEM="$mem" SPARK_GRAFT_RUNS="$runs" \
    SPARK_GRAFT_BENCH_OUT="$OUT/$name.json" \
    scripts/run_main.sh graft.Bench > "$OUT/$name.log" 2>&1
  echo "--- $name done"
}

run simhash_sf1   /tmp/sf1  d_simhash,d_simhash_compact 24g 3
run prefix_sf1    /tmp/sf1  d_prefix_containment        24g 3
run sess_mem_100x /tmp/sf10 st_sessions,st_alerts       48g 2
run sess_rdb_100x /tmp/sf10 st_sessions,st_alerts       48g 2 SPARK_GRAFT_ROCKSDB=1
echo ALL_ADJ_DONE
