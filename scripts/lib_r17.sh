# Shared capture hygiene for the r17 round scripts (sourced, not run).
#
# wait_idle: one idle gate for BOTH scripts — r16's two scripts
# disagreed (probes honored SPARK_GRAFT_LOAD_LIMIT, ann100m hardcoded
# 8; ADVICE r16 #3), and the 100M captures are the most load-sensitive.
#
# have_clean_bench / have_clean_probe: the r16 sweep landed an ERRORED
# sf10 artifact as clean evidence because the gate head-grepped for
# "degraded":false — a field graft.Bench never emitted — and n_errors
# sat at the tail of the line (VERDICT r16 What's-wrong #2). Bench now
# emits BOTH n_errors and degraded in the first ~120 bytes by contract
# (BenchSpec pins it), and the bench gate requires both. Probe lines
# (StreamThroughputProbe / AnnProbe) carry no n_errors field — a probe
# that errors dies before writing any artifact, so existence +
# not-degraded is the full contract there.

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

have_clean_bench() {
  [ -f "$1" ] \
    && head -c 160 "$1" | grep -q '"degraded":false' \
    && head -c 160 "$1" | grep -q '"n_errors":0'
}

have_clean_probe() {
  [ -f "$1" ] && head -c 160 "$1" | grep -q '"degraded":false'
}
