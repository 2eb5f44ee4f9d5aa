#!/usr/bin/env bash
# Executor-loss chaos runner (dev/driver-side tooling): launch a harness
# main (typically under SPARK_GRAFT_MASTER=local-cluster[...] +
# SPARK_GRAFT_RELIABLE_CKPT_DIR — the preemptible-cluster configuration),
# kill -9 one executor JVM at each requested offset, and report the
# main's exit code. The caller asserts survival (exit 0 + downstream
# oracle check); this script only injects the failures, mimicking what a
# spot/preemptible cluster does to executors mid-query.
#
# Victims are scoped to DESCENDANTS of the launched main (sbt → driver
# JVM → executor JVMs), so a concurrent Spark app on the same host can
# never be collateral damage.
#
# Usage: chaos_run.sh <logfile> <kill_at_s> <kill_at_s> -- <cmd...>
set -u
LOG=$1
K1=$2
K2=$3
shift 4

if [ "$K2" -le "$K1" ]; then
  echo "[chaos] K2 ($K2) must be > K1 ($K1)" >&2
  exit 2
fi

"$@" >"$LOG" 2>&1 &
MAIN=$!

descendants() { # transitive child pids of $1, space-separated
  local k
  for k in $(pgrep -P "$1" 2>/dev/null); do
    printf '%s ' "$k"
    descendants "$k"
  done
}

kill_one() {
  # Newest executor first: the replacement executor a standalone worker
  # respawns after the first kill must not be the only process we ever
  # target, and the driver-side backend is not named ExecutorBackend.
  local desc victim p
  desc=" $(descendants "$MAIN")"
  victim=""
  for p in $(pgrep -f CoarseGrainedExecutorBackend); do
    case "$desc" in *" $p "*) victim=$p ;; esac
  done
  if [ -n "${victim:-}" ]; then
    kill -9 "$victim" && echo "[chaos] killed executor pid $victim at T+$1s"
  else
    echo "[chaos] no executor process found at T+$1s (nothing killed)"
  fi
}

sleep "$K1" && kill_one "$K1"
sleep $((K2 - K1)) && kill_one "$K2"

wait "$MAIN"
RC=$?
echo "[chaos] main exited rc=$RC (log: $LOG)"
exit $RC
