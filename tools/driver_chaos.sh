#!/usr/bin/env bash
# Driver kill/restart chaos runner (dev/driver-side tooling): run a
# harness command, kill -9 the ENTIRE driver process tree (a process
# crash, not a graceful stop — executors included), then re-run the
# SAME command to completion and report its exit code. Exactly-once
# across the restart holds when the command's streaming drains run with
# pinned checkpoints + pinned durable sinks
# (spark.graft.streaming.pinnedCkptRoot / pinnedSinkRoot): the restart
# resumes from the killed run's offsets/state instead of reprocessing
# from zero, and per-batch idempotent sink writes absorb the one batch
# that may have written without committing.
#
# <kill_at> is either a fixed offset in seconds, or "commits:N" —
# poll $CHAOS_CKPT_ROOT (the pinnedCkptRoot) until some drain's commit
# log holds >= N entries while the drain is still RUNNING (its pinned
# checkpoint not yet cleaned), then kill. The commit-triggered mode
# guarantees the kill lands MID-STREAM with real progress to resume
# from, independent of host timing.
#
# Usage: driver_chaos.sh <log_run1> <log_run2> <kill_at> -- <cmd...>
set -u
LOG1=$1
LOG2=$2
KILLAT=$3
shift 4

descendants() { # transitive child pids of $1, space-separated
  local k
  for k in $(pgrep -P "$1" 2>/dev/null); do
    printf '%s ' "$k"
    descendants "$k"
  done
}

"$@" >"$LOG1" 2>&1 &
MAIN=$!

case "$KILLAT" in
  commits:*)
    WANT=${KILLAT#commits:}
    : "${CHAOS_CKPT_ROOT:?commit-triggered kill needs CHAOS_CKPT_ROOT}"
    TRIGGERED=""
    while kill -0 "$MAIN" 2>/dev/null; do
      for c in "$CHAOS_CKPT_ROOT"/*/commits; do
        [ -d "$c" ] || continue
        n=$(ls "$c" 2>/dev/null | grep -cv '\.tmp')
        if [ "${n:-0}" -ge "$WANT" ]; then
          TRIGGERED="$c ($n commits)"
          break 2
        fi
      done
      sleep 0.2
    done
    if [ -z "$TRIGGERED" ]; then
      echo "[chaos] main finished before any drain reached $WANT commits — nothing killed"
      wait "$MAIN"
      exit $?
    fi
    echo "[chaos] commit trigger hit: $TRIGGERED"
    ;;
  *)
    sleep "$KILLAT"
    ;;
esac

TREE="$MAIN $(descendants "$MAIN")"
echo "[chaos] kill -9 driver tree: $TREE"
# shellcheck disable=SC2086
kill -9 $TREE 2>/dev/null
wait "$MAIN" 2>/dev/null
"$@" >"$LOG2" 2>&1
RC=$?
echo "[chaos] restarted run exited rc=$RC (logs: $LOG1 $LOG2)"
exit $RC
