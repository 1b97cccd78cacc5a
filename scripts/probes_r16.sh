#!/bin/bash
# Round-16 evidence captures — the pass the r15 verdict flagged as
# specified-but-never-run (probes_r15.sh), serialized for an IDLE
# host; every artifact self-flags via degraded/load_avg_start and
# re-running redoes only captures that are missing or flagged:
#  1. Serving-default confirmation (VERDICT r15 Next #4): STREAMPROBE
#     st_ann at the sparse 2M/k=200 geometry (rate 5) with NO layout
#     env — the deploy rule must pick the PARTITIONED publish
#     ("partitioned_serve":true), plus a dense control (rate 2000)
#     where the rule must pick flat.
#  2. Same-session binary A/B at sf0.1 (VERDICT r15 Next #1): the r14
#     snapshot binary (git worktree at 0043d30, /tmp/r14wt) vs HEAD,
#     min-of-3 each — adjudicates the driver's 135.7 s r15 reading
#     (uniform ~1.74x vs r14-idle) as host band or real regression.
#  3. Round bench series: sf0.1 / sf1 / sf10 full sweep (141 queries),
#     min-of-2, on a SNAPSHOT of the HEAD classes — the sf10 sweep's
#     in-suite d_incremental reading is the r14 weak-item
#     adjudication datum (exits weak at <= ~16 s per VERDICT #1).
#  4. PLANS_r16.txt at the driver geometry (sf0.001, CPUS=8); diff
#     target vs PLANS_r15.txt is EMPTY (this round's code changes are
#     probe-tool/store-claim paths, not registered-operator plans).
# The 100M captures run separately (scripts/ann100m_r16.sh).
# Usage: scripts/probes_r16.sh [outDir]
set -euo pipefail
OUT="${1:-/root/repo}"
cd /root/repo

# benches run from a frozen copy of the compiled classes so a
# mid-pass recompile can't shift the measured binary
HEAD_CP=/tmp/headcp_r16
if [ ! -d "$HEAD_CP" ]; then
  cp -r /root/repo/target/scala-2.13/classes "$HEAD_CP"
fi
R14_CP=/tmp/r14wt/target/scala-2.13/classes
if [ ! -d "$R14_CP" ]; then
  git worktree add -f /tmp/r14wt 0043d30 >/dev/null
  (cd /tmp/r14wt && sbt -batch compile > /tmp/r14wt_build.log 2>&1)
fi

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

# 1. Serving-default confirmation at the sparse geometry (the rule
# must pick partitioned: 5 probes x nprobe 14 < k=200) and a dense
# control (20 x 14 >= 200 -> flat). Rate 20, NOT probes_r15.sh's
# planned 2000 or r14's 50-75: the rule boundary is expProbes >=
# k/nprobe ~ 15, and past-critical rates spiral on this host — an
# overrun batch accumulates rate x batch-seconds extra probes, each
# probe costs ~0.02-0.05 s of candidate sort, so at rate x cost > 1
# probes/batch grow without bound (observed: 59 s -> 105 s batches
# at rate 75, a 1.1B-row sort, and the spill ate the 12 GB this host
# has free beside the 64 GB of resident 100M artifacts). Rate 20
# keeps the loop contractive while still being decisively dense.
tput_env STREAMPROBE_ANN5_K200_DEFAULT_r16.json st_ann /tmp/vec2m 5 110 24g \
  SPARK_GRAFT_HEALTH_ADAPTIVE=1
tput_env STREAMPROBE_ANN20_K200_DEFAULT_r16.json st_ann /tmp/vec2m 20 110 48g \
  SPARK_GRAFT_HEALTH_ADAPTIVE=1

# 2. Same-session binary A/B at sf0.1, min-of-3, idle.
bench_cp BENCH_SF01_R14BIN_r16 "$R14_CP" /root/testdata/sf0.1 "" 24g 3
bench_cp BENCH_SF01_HEADBIN_r16 "$HEAD_CP" /root/testdata/sf0.1 "" 24g 3

# 3. Round bench series (141 queries) on HEAD.
bench_cp BENCH_SF01_r16 "$HEAD_CP" /root/testdata/sf0.1 "" 24g 2
bench_cp BENCH_SF1_r16 "$HEAD_CP" /tmp/sf1 "" 24g 2
bench_cp BENCH_SF10_FULL_r16 "$HEAD_CP" /tmp/sf10 "" 48g 2

# 4. Plan dump (no timing — run last, any load) at the driver session
# geometry so the r15 diff compares plans, not shuffle widths.
SPARK_GRAFT_CPUS=8 SPARK_DRIVER_MEM=16g scripts/run_main.sh graft.tools.PlanDump \
  /root/testdata/sf0.001 "$OUT/PLANS_r16.txt" > /tmp/plandump_r16.log 2>&1
echo "--- PLANS_r16.txt: $(wc -l < "$OUT/PLANS_r16.txt") lines"
echo ALL_PROBES_DONE
