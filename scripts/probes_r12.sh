#!/bin/bash
# Round-12 evidence captures, serialized, designed for an IDLE host
# (every artifact self-flags via degraded/load_avg_start — re-running
# the script redoes only captures that are missing or flagged):
#  1. STREAMPROBE — sustained multi-batch streaming throughput
#     (VERDICT r11 Next #1, the one unmeasured streaming dimension):
#     100 steady micro-batches at a fixed rate behind 10 warmup
#     batches; st_pipeline at 2 rates, st_sessions at 2 rates across
#     both state providers, st_dedup_ingest at 2 rates. Stability
#     criterion in-artifact: batch-duration p95 <= trigger interval.
#  2. Spike adjudication (VERDICT r11 #2): isolated min-of-3 at sf10
#     for the three unadjudicated r11B sweep spikes.
#  3. ADDPROBE — IvfStore.add online-index staleness (VERDICT r11 #3):
#     stale-vs-fresh recall at 2x/5x/10x appends, stationary (same)
#     and shifted (drift) regimes at 200k base, drift at 2M base.
#  4. Pair-family 1000x decade (VERDICT r11 #5) + t_dsir GC share at
#     1000x (VERDICT r11 #6), one subset bench on /tmp/docs1000.
#  5. Round bench series: sf0.1 / sf1 / sf10 full sweep, min-of-2.
# NOTE: the committed r12 evidence also includes knee-search points
# captured ad hoc beyond this script's bracketing set
# (STREAMPROBE_{PIPE200K,PIPE400K,PIPE1M,PIPE2M,SESS50K,SESS100K,
# SESS200K}_{MEM,RDB}, INGEST{3K,3K5}, SESS5K_MEM_B — same tput
# invocation shape, rate/provider varied) and the rotated re-sweep
# BENCH_SF10_FULL_r12B (same bench invocation, second capture).
# Usage: scripts/probes_r12.sh [outDir]
set -euo pipefail
OUT="${1:-/root/repo}"
cd /root/repo

# Each JVM samples the 1-min load average at entry; wait out the
# previous capture's decay so no artifact starts above the limit.
wait_idle() {
  local limit="${SPARK_GRAFT_LOAD_LIMIT:-8}"
  while :; do
    local l
    l=$(cut -d' ' -f1 /proc/loadavg)
    awk -v l="$l" -v lim="$limit" 'BEGIN{exit !(l < lim)}' && break
    echo "    (load $l >= $limit, cooling down)"
    sleep 20
  done
}

have_clean() {
  [ -f "$OUT/$1" ] && head -c 120 "$OUT/$1" | grep -q '"degraded":false'
}

tput() { # outfile query rate batches mem extra-env...
  local outfile="$1" query="$2" rate="$3" batches="$4" mem="$5"; shift 5
  if have_clean "$outfile"; then echo "=== $outfile clean, skipping ==="; return; fi
  wait_idle
  echo "=== tput $query @ $rate rows/s -> $outfile ==="
  env "$@" SPARK_DRIVER_MEM="$mem" scripts/run_main.sh \
    graft.tools.StreamThroughputProbe "$query" /root/testdata/sf0.1 \
    "$rate" "$batches" "$OUT/$outfile" \
    > "/tmp/tput_$(basename "$outfile" .json).log" 2>&1
  echo "--- $outfile: $(head -c 300 "$OUT/$outfile")"
}

addprobe() { # corpus regime mem outfile
  local corpus="$1" regime="$2" mem="$3" outfile="$4"
  if have_clean "$outfile"; then echo "=== $outfile clean, skipping ==="; return; fi
  wait_idle
  echo "=== addprobe $corpus $regime -> $outfile ==="
  SPARK_DRIVER_MEM="$mem" scripts/run_main.sh graft.sim.AddProbe \
    "$corpus" "$regime" "$OUT/$outfile" \
    > "/tmp/addprobe_$(basename "$outfile" .json).log" 2>&1
  echo "--- $outfile: $(head -c 300 "$OUT/$outfile")"
}

bench() { # name sfdir subset mem runs extra-env...
  local name="$1" sfdir="$2" subset="$3" mem="$4" runs="$5"; shift 5
  if have_clean "$name.json"; then echo "=== $name clean, skipping ==="; return; fi
  wait_idle
  echo "=== bench $name ($sfdir runs=$runs $*) ==="
  env "$@" SPARK_GRAFT_SF_DIR="$sfdir" ${subset:+SPARK_GRAFT_ONLY="$subset"} \
    SPARK_DRIVER_MEM="$mem" SPARK_GRAFT_RUNS="$runs" \
    SPARK_GRAFT_BENCH_OUT="$OUT/$name.json" \
    scripts/run_main.sh graft.Bench > "/tmp/bench_$name.log" 2>&1
  echo "--- $name done: $(head -c 200 "$OUT/$name.json")"
}

# 1. Sustained streaming throughput — 110 batches (10 warmup + 100
# steady) per point; rates bracket each query's expected capacity.
tput STREAMPROBE_PIPE20K_r12.json    st_pipeline     20000  110 16g
tput STREAMPROBE_PIPE100K_r12.json   st_pipeline     100000 110 16g
tput STREAMPROBE_SESS5K_MEM_r12.json  st_sessions    5000   110 24g
tput STREAMPROBE_SESS20K_MEM_r12.json st_sessions    20000  110 24g
tput STREAMPROBE_SESS5K_RDB_r12.json  st_sessions    5000   110 24g SPARK_GRAFT_ROCKSDB=1
tput STREAMPROBE_SESS20K_RDB_r12.json st_sessions    20000  110 24g SPARK_GRAFT_ROCKSDB=1
tput STREAMPROBE_INGEST2K_r12.json   st_dedup_ingest 2000   110 24g
tput STREAMPROBE_INGEST5K_r12.json   st_dedup_ingest 5000   110 24g

# 2. Spike adjudication: the three r11B sweep spikes, isolated
# min-of-3 at low load on the current binary.
bench BENCH_SF10_SPIKES_ISO_r12 /tmp/sf10 \
  d_minhash_lsh,st_sinks,d_prefix_containment 48g 3

# 3. IvfStore.add staleness.
addprobe /tmp/vec200k same  24g ADDPROBE_VEC200K_SAME_r12.json
addprobe /tmp/vec200k drift 24g ADDPROBE_VEC200K_DRIFT_r12.json
addprobe /tmp/vec2m   drift 48g ADDPROBE_VEC2M_DRIFT_r12.json

# 4. Inverted-index pair family at the 1000x decade + d_dup_profile's
# pair-volume prediction + t_dsir GC share, min-of-2.
bench BENCH_DOCS1000_PAIRS_r12 /tmp/docs1000 \
  d_minhash_lsh,d_containment,d_incremental,d_dup_profile,t_dsir 48g 2

# 5. Round bench series.
bench BENCH_SF01_r12 /root/testdata/sf0.1 "" 24g 2
bench BENCH_SF1_r12  /tmp/sf1  "" 24g 2
bench BENCH_SF10_FULL_r12 /tmp/sf10 "" 48g 2
echo ALL_PROBES_DONE
