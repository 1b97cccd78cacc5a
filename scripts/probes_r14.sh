#!/bin/bash
# Round-14 evidence captures, serialized, designed for an IDLE host
# (every artifact self-flags via degraded/load_avg_start; re-running
# the script redoes only captures that are missing or flagged):
#  1. d_embed_dup adjudication (VERDICT r13 Next #1): isolated
#     min-of-3 at sf10 on the R13 BINARY (target/classes_r13 — the
#     binary that produced the 22.5/33.3/49.3 s monotone readings),
#     plus one in-suite sf10 sweep on the same binary with
#     SPARK_GRAFT_STREAM_PARTS=8 forced (reverting the co-residency
#     change, to separate host band from a rule-induced memory
#     interaction with the tile kernel).
#  2. Small-scale host-band pin (VERDICT r13 Next #4): same-session
#     A/B of the r11 binary (git worktree at 98093e3, /tmp/r11wt) vs
#     HEAD at sf0.1 and sf1, min-of-3 each, idle — attributes the
#     71->91 s drift to host or code.
#  3. cid-partitioned ANN serving re-capture (VERDICT r13 Next #3):
#     STREAMPROBE st_ann at the 2M/k=200 geometry with
#     SPARK_GRAFT_ANN_PARTITIONED=1 (publish partitioned, serve from
#     the artifact with static cell pruning) vs a same-day default
#     control — the sparse-batch latency lift the r13 layout A/B
#     measured at 1.33x.
#  4. Round bench series: sf0.1 / sf1 / sf10 full sweep (141 queries),
#     min-of-2, on HEAD.
#  5. PLANS_r14.txt (diff target vs PLANS_r13.txt: expected EMPTY —
#     the partitioned serving path is opt-in).
# The >=100M-vector ANN decade probe (Next #6) runs separately
# (scripts at the end, guarded by disk headroom) — see probes log.
# Usage: scripts/probes_r14.sh [outDir]
set -euo pipefail
OUT="${1:-/root/repo}"
cd /root/repo

HEAD_CP=/root/repo/target/scala-2.13/classes
R13_CP=/root/repo/target/classes_r13
R11_CP=/tmp/r11wt/target/scala-2.13/classes

OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

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

bench_cp() { # name cp sfdir subset mem runs extra-env...
  local name="$1" cp="$2" sfdir="$3" subset="$4" mem="$5" runs="$6"; shift 6
  if have_clean "$name.json"; then echo "=== $name clean, skipping ==="; return; fi
  wait_idle
  echo "=== bench $name ($sfdir runs=$runs $*) ==="
  env "$@" SPARK_GRAFT_SF_DIR="$sfdir" ${subset:+SPARK_GRAFT_ONLY="$subset"} \
    SPARK_GRAFT_RUNS="$runs" SPARK_GRAFT_BENCH_OUT="$OUT/$name.json" \
    java -Xmx"$mem" $OPENS \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -Duser.language=en -Duser.country=US \
    -cp "$cp:/opt/spark/jars/*" graft.Bench \
    > "/tmp/bench_$name.log" 2>&1
  echo "--- $name done: $(head -c 200 "$OUT/$name.json")"
}

tput_env() { # outfile query sfdir rate batches mem extra-env...
  local outfile="$1" query="$2" sfdir="$3" rate="$4" batches="$5" mem="$6"; shift 6
  if have_clean "$outfile"; then echo "=== $outfile clean, skipping ==="; return; fi
  wait_idle
  echo "=== tput $query @ $rate -> $outfile ($*) ==="
  env "$@" SPARK_DRIVER_MEM="$mem" scripts/run_main.sh \
    graft.tools.StreamThroughputProbe "$query" "$sfdir" "$rate" "$batches" \
    "$OUT/$outfile" > "/tmp/tput_$(basename "$outfile" .json).log" 2>&1
  echo "--- $outfile: $(head -c 300 "$OUT/$outfile")"
}

# 1. d_embed_dup adjudication on the r13 binary.
bench_cp BENCH_SF10_EMBEDDUP_ISO_r14 "$R13_CP" /tmp/sf10 d_embed_dup 48g 3
bench_cp BENCH_SF10_FULL_SP8_R13BIN_r14 "$R13_CP" /tmp/sf10 "" 48g 1 \
  SPARK_GRAFT_STREAM_PARTS=8

# 2. Small-scale host-band pin: r11 binary vs HEAD, min-of-3, idle.
bench_cp BENCH_SF01_R11BIN_r14 "$R11_CP" /root/testdata/sf0.1 "" 24g 3
bench_cp BENCH_SF01_HEADBIN_r14 "$HEAD_CP" /root/testdata/sf0.1 "" 24g 3
bench_cp BENCH_SF1_R11BIN_r14 "$R11_CP" /tmp/sf1 "" 24g 3
bench_cp BENCH_SF1_HEADBIN_r14 "$HEAD_CP" /tmp/sf1 "" 24g 3

# 3. cid-partitioned ANN serving vs same-day default control
# (2M vectors, adaptive k=200; rates bracket the r13 knee).
tput_env STREAMPROBE_ANN50_K200_PART_r14.json st_ann /tmp/vec2m 50 110 48g \
  SPARK_GRAFT_HEALTH_ADAPTIVE=1 SPARK_GRAFT_ANN_PARTITIONED=1
tput_env STREAMPROBE_ANN75_K200_PART_r14.json st_ann /tmp/vec2m 75 110 48g \
  SPARK_GRAFT_HEALTH_ADAPTIVE=1 SPARK_GRAFT_ANN_PARTITIONED=1
tput_env STREAMPROBE_ANN50_K200_CTRL_r14.json st_ann /tmp/vec2m 50 110 48g \
  SPARK_GRAFT_HEALTH_ADAPTIVE=1
tput_env STREAMPROBE_ANN75_K200_CTRL_r14.json st_ann /tmp/vec2m 75 110 48g \
  SPARK_GRAFT_HEALTH_ADAPTIVE=1

# 4. Round bench series (141 queries) on HEAD.
bench_cp BENCH_SF01_r14 "$HEAD_CP" /root/testdata/sf0.1 "" 24g 2
bench_cp BENCH_SF1_r14 "$HEAD_CP" /tmp/sf1 "" 24g 2
bench_cp BENCH_SF10_FULL_r14 "$HEAD_CP" /tmp/sf10 "" 48g 2

# 5. Plan dump (no timing — run last, any load). NOTE the committed
# PLANS_r14.txt was regenerated at sf0.001 with SPARK_GRAFT_CPUS=8 —
# the session geometry the driver's PLANS_r13.txt used — so the
# round-over-round diff compares plans, not shuffle widths (at 32
# CPUs every Exchange prints 32 instead of 8 and the diff drowns).
SPARK_GRAFT_CPUS=8 SPARK_DRIVER_MEM=16g scripts/run_main.sh graft.tools.PlanDump \
  /root/testdata/sf0.001 "$OUT/PLANS_r14.txt" > /tmp/plandump_r14.log 2>&1
echo "--- PLANS_r14.txt: $(wc -l < "$OUT/PLANS_r14.txt") lines"
echo ALL_PROBES_DONE
