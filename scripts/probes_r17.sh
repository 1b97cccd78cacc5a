#!/bin/bash
# Round-17 evidence captures — runs FIRST this round: the harness
# /tmp wipe already freed the ~64 GB of resident 100M artifacts the
# r16 sf10 sweep's t_domain_rank died beside (at ~14 GB free disk),
# so the disk-hungry sf10 sweeps get the clean ~78 GB-free host and
# scripts/ann100m_r17.sh rebuilds the decade artifacts afterwards.
# Serialized for an IDLE host; every artifact self-flags and
# re-running redoes only
# captures that are missing or flagged — with the FIXED gate
# (lib_r17.sh): bench artifacts must declare BOTH "n_errors":0 and
# "degraded":false in the head bytes, which the r16 gate could not see
# (VERDICT r16 What's-wrong #2).
#  0. Gate demonstration: the new gate must flag the r16 sf10 artifact
#     (n_errors:1, landed as "clean" under the old gate) as DIRTY.
#  1. Clean sf10 t_domain_rank (VERDICT r16 Next #1): isolated
#     min-of-2 first (the adjudication datum: r14-idle 18.5 s,
#     host-banded <= ~26 s), then the full sweep carries the in-suite
#     point with n_errors:0.
#  2. sf10 streaming-tail adjudication (VERDICT r16 Next #3): isolated
#     min-of-2 for st_join (in-suite read 4.14x r14 vs the 1.398x host
#     band) and st_ewma (2.63x) — isolated ~ band => suite pressure;
#     isolated ~ in-suite => a real leak at the release boundary.
#  3. Same-session binary A/B at sf0.1 vs the r16 snapshot (65f9c48),
#     min-of-3 — the only valid cross-round comparison on a host with
#     measured 3.8x within-day noise phases.
#  4. Round bench series: sf0.1 / sf1 / sf10 full sweeps, min-of-2.
#  5. PLANS_r17.txt at the driver geometry; diff target vs
#     PLANS_r16.txt is EMPTY outside the st_ann probe tool (this
#     round's registered-operator surface is unchanged).
# Usage: scripts/probes_r17.sh [outDir]
set -euo pipefail
OUT="${1:-/root/repo}"
cd /root/repo
. scripts/lib_r17.sh

# 0. The r16 hole, demonstrated closed: the artifact that
# self-certified clean under the old gate must read DIRTY under the
# new one (its head bytes predate Bench's n_errors/degraded emission).
if [ -f "$OUT/BENCH_SF10_FULL_r16.json" ]; then
  if have_clean_bench "$OUT/BENCH_SF10_FULL_r16.json"; then
    echo "GATE_DEMO: BENCH_SF10_FULL_r16.json passes the new gate — BUG"
    exit 1
  else
    echo "GATE_DEMO: BENCH_SF10_FULL_r16.json is DIRTY under the r17 gate (expected)"
  fi
fi

# Benches run from a frozen copy of the compiled classes so a mid-pass
# recompile can't shift the measured binary — and the snapshot is taken
# AFTER a compile, so an edited tree can't snapshot stale classes
# (ADVICE r16 #4).
HEAD_CP=/tmp/headcp_r17
if [ ! -d "$HEAD_CP" ]; then
  sbt -batch compile > /tmp/headcp_r17_build.log 2>&1
  cp -r /root/repo/target/scala-2.13/classes "$HEAD_CP"
fi
R16_CP=/tmp/r16wt/target/scala-2.13/classes
if [ ! -d "$R16_CP" ]; then
  git worktree add -f /tmp/r16wt 65f9c48 >/dev/null
  (cd /tmp/r16wt && sbt -batch compile > /tmp/r16wt_build.log 2>&1)
fi

OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

bench_cp() { # name cp sfdir subset mem runs extra-env...
  local name="$1" cp="$2" sfdir="$3" subset="$4" mem="$5" runs="$6"; shift 6
  if have_clean_bench "$OUT/$name.json"; then
    echo "=== $name clean, skipping ==="; return
  fi
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

# 1. The adjudication datum first, isolated (cheapest clean point).
bench_cp BENCH_SF10_TDOMRANK_ISO_r17 "$HEAD_CP" /tmp/sf10 t_domain_rank 48g 2

# 2. Streaming-tail isolation (r9 precedent: in-suite >> isolated was
# a REAL leak twice; isolated ~ band is suite pressure).
bench_cp BENCH_SF10_STJOIN_ISO_r17 "$HEAD_CP" /tmp/sf10 st_join 48g 2
bench_cp BENCH_SF10_STEWMA_ISO_r17 "$HEAD_CP" /tmp/sf10 st_ewma 48g 2

# 3. Same-session binary A/B at sf0.1, min-of-3, idle.
bench_cp BENCH_SF01_R16BIN_r17 "$R16_CP" /root/testdata/sf0.1 "" 24g 3
bench_cp BENCH_SF01_HEADBIN_r17 "$HEAD_CP" /root/testdata/sf0.1 "" 24g 3

# 4. Round bench series (141 queries) on HEAD.
bench_cp BENCH_SF01_r17 "$HEAD_CP" /root/testdata/sf0.1 "" 24g 2
bench_cp BENCH_SF1_r17 "$HEAD_CP" /tmp/sf1 "" 24g 2
bench_cp BENCH_SF10_FULL_r17 "$HEAD_CP" /tmp/sf10 "" 48g 2

# 5. Plan dump (no timing — any load) at the driver session geometry.
SPARK_GRAFT_CPUS=8 SPARK_DRIVER_MEM=16g scripts/run_main.sh graft.tools.PlanDump \
  /root/testdata/sf0.001 "$OUT/PLANS_r17.txt" > /tmp/plandump_r17.log 2>&1
echo "--- PLANS_r17.txt: $(wc -l < "$OUT/PLANS_r17.txt") lines"
echo ALL_PROBES_DONE
