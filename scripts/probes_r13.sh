#!/bin/bash
# Round-13 evidence captures, serialized, designed for an IDLE host
# (every artifact self-flags via degraded/load_avg_start — re-running
# the script redoes only captures that are missing or flagged):
#  1. Inflation adjudication (VERDICT r12 Next #2): isolated min-of-3
#     at sf10 for the five un-adjudicated >1.5x best-of-round queries
#     (d_components is the 2.06x `weak`; st_sinks already adjudicated
#     as the disk band and now self-normalizes via sink_io).
#  2. st_dedup_ingest knee attribution (VERDICT r12 Next #4):
#     stage-stripped A/B at the 3k docs/s knee point — window-hash
#     explode / +bloom probe / +exact-confirm semi-join / full chain —
#     per-stage cost is the delta between successive runs.
#  3. RocksDB sessions tuning at the 100k gap point (VERDICT r12
#     Next #5): merge-path-targeted variants (4x write buffers,
#     bounded off-heap budget) vs the r12 default-tuned baseline.
#  4. Round bench series: sf0.1 / sf1 / sf10 full sweep (141 queries
#     incl. the new st_index_health), min-of-2, sink_io fields live.
#  5. PLANS_r13.txt (diff target vs PLANS_r12.txt: the one expected
#     delta is the added st_index_health plan).
# NOTE: the committed r13 evidence also includes ad-hoc captures
# beyond this script: the stream-partitions A/B behind the size-keyed
# rule (SPARK_GRAFT_STREAM_PARTS={unset,32} x {sf0.1,sf1,sf10} on
# SPARK_GRAFT_ONLY=st_stateful_rate,st_dedup,st_sessions,st_hopping),
# the post-rule full sweep BENCH_SF10_FULL_r13C, the rotated sweep
# BENCH_SF10_FULL_r13B, and the AddProbe rule-validation pair
# ADDPROBE_VEC200K_{SAME,DRIFT}_RULE_r13 (same AddProbe invocation as
# probes_r12.sh, new retrain_due fields).
# Usage: scripts/probes_r13.sh [outDir]
set -euo pipefail
OUT="${1:-/root/repo}"
cd /root/repo

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

# 1. Inflation adjudication: the five >1.5x best-of-round queries from
# the r12 verdict table, isolated min-of-3 at matched (idle) load.
bench BENCH_SF10_INFL_ISO_r13 /tmp/sf10 \
  d_components,d_canonical,d_dup_profile,d_substring_spans,st_quality_probe 48g 3

# 2. st_dedup_ingest per-stage attribution at the 3k knee point.
tput STREAMPROBE_INGEST3K_WIN_r13.json     st_dedup_ingest 3000 110 24g SPARK_GRAFT_INGEST_STAGE=window
tput STREAMPROBE_INGEST3K_BLOOM_r13.json   st_dedup_ingest 3000 110 24g SPARK_GRAFT_INGEST_STAGE=bloom
tput STREAMPROBE_INGEST3K_CONFIRM_r13.json st_dedup_ingest 3000 110 24g SPARK_GRAFT_INGEST_STAGE=confirm
tput STREAMPROBE_INGEST3K_FULL_r13.json    st_dedup_ingest 3000 110 24g SPARK_GRAFT_INGEST_STAGE=full
# knee re-bracket at idle (r12's 2-3k bracket was host-banded) + the
# measured-null confirm-join lift attempt (partsort vs shipped bcast)
tput STREAMPROBE_INGEST4K_FULL_r13.json    st_dedup_ingest 4000 110 24g SPARK_GRAFT_INGEST_STAGE=full
tput STREAMPROBE_INGEST5K_FULL_r13.json    st_dedup_ingest 5000 110 24g SPARK_GRAFT_INGEST_STAGE=full
tput STREAMPROBE_INGEST3K_CONFIRM_PS_r13.json st_dedup_ingest 3000 110 24g \
  SPARK_GRAFT_INGEST_STAGE=confirm SPARK_GRAFT_INGEST_CONFIRM=partsort

# 2b. st_index_health serving capacity (knee between 300k and 500k
# vectors/s/node; the health agg is ~free on top of assignment).
tput STREAMPROBE_HEALTH100K_r13.json st_index_health 100000 110 24g
tput STREAMPROBE_HEALTH200K_r13.json st_index_health 200000 110 24g
tput STREAMPROBE_HEALTH300K_r13.json st_index_health 300000 110 24g
tput STREAMPROBE_HEALTH500K_r13.json st_index_health 500000 110 24g
# production-k regime: the 2M-vector adaptive index (k=200). These use
# /tmp/vec2m as the corpus dir, so they bypass the tput() helper's
# fixed sfDir; have_clean-guarded the same way.
healthk() { # outfile rate
  local outfile="$1" rate="$2"
  if have_clean "$outfile"; then echo "=== $outfile clean, skipping ==="; return; fi
  wait_idle
  echo "=== health@k200 $rate vec/s -> $outfile ==="
  env SPARK_GRAFT_HEALTH_ADAPTIVE=1 SPARK_DRIVER_MEM=48g scripts/run_main.sh \
    graft.tools.StreamThroughputProbe st_index_health /tmp/vec2m "$rate" 110 \
    "$OUT/$outfile" > "/tmp/tput_$(basename "$outfile" .json).log" 2>&1
  echo "--- $outfile: $(head -c 300 "$OUT/$outfile")"
}
healthk STREAMPROBE_HEALTH100K_K200_r13.json 100000
healthk STREAMPROBE_HEALTH200K_K200_r13.json 200000

# 2c. sustained ANN-serving capacity: st_ann mode (knee 200-300
# probes/s/node at sf0.1/k=8; 50-75 at the 2M/k=200 geometry).
tput STREAMPROBE_ANN100_r13.json st_ann 100 110 24g
tput STREAMPROBE_ANN200_r13.json st_ann 200 110 24g
tput STREAMPROBE_ANN300_r13.json st_ann 300 110 24g
annk() { # outfile rate
  local outfile="$1" rate="$2"
  if have_clean "$outfile"; then echo "=== $outfile clean, skipping ==="; return; fi
  wait_idle
  echo "=== ann@k200 $rate probes/s -> $outfile ==="
  env SPARK_GRAFT_HEALTH_ADAPTIVE=1 SPARK_DRIVER_MEM=48g scripts/run_main.sh \
    graft.tools.StreamThroughputProbe st_ann /tmp/vec2m "$rate" 110 \
    "$OUT/$outfile" > "/tmp/tput_$(basename "$outfile" .json).log" 2>&1
  echo "--- $outfile: $(head -c 300 "$OUT/$outfile")"
}
annk STREAMPROBE_ANN50_K200_r13.json 50
annk STREAMPROBE_ANN75_K200_r13.json 75

# 2d. index-layout A/B: flat scan vs cid-partitioned (+ explicit
# driver-known cell IN-filter = static partition pruning; DPP itself
# does not fire for a filterless probe relation).
if ! have_clean ANNLAYOUT_AB_VEC2M_r13.json; then
  wait_idle
  SPARK_DRIVER_MEM=48g scripts/run_main.sh graft.tools.AnnLayoutAb \
    /tmp/vec2m "$OUT/ANNLAYOUT_AB_VEC2M_r13.json" > /tmp/annlayout.log 2>&1
  echo "--- ANNLAYOUT_AB: $(head -c 300 "$OUT/ANNLAYOUT_AB_VEC2M_r13.json")"
fi

# 3. RocksDB sessions at 100k: merge-path tuning variants.
tput STREAMPROBE_SESS100K_RDB_BIGBUF_r13.json st_sessions 100000 110 24g \
  SPARK_GRAFT_ROCKSDB=1 SPARK_GRAFT_RDB_WRITEBUF_MB=256 SPARK_GRAFT_RDB_NBUF=6
tput STREAMPROBE_SESS100K_RDB_BOUNDED_r13.json st_sessions 100000 110 24g \
  SPARK_GRAFT_ROCKSDB=1 SPARK_GRAFT_RDB_BOUNDED_MB=4096

# 4. Round bench series (141 queries).
bench BENCH_SF01_r13 /root/testdata/sf0.1 "" 24g 2
bench BENCH_SF1_r13  /tmp/sf1  "" 24g 2
bench BENCH_SF10_FULL_r13 /tmp/sf10 "" 48g 2

# 5. Plan dump (no timing — run last, any load).
SPARK_DRIVER_MEM=16g scripts/run_main.sh graft.tools.PlanDump \
  /root/testdata/sf0.01 "$OUT/PLANS_r13.txt" > /tmp/plandump_r13.log 2>&1
echo "--- PLANS_r13.txt: $(wc -l < "$OUT/PLANS_r13.txt") lines"
echo ALL_PROBES_DONE
