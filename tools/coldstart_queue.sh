#!/usr/bin/env bash
# Cold-start measurement queue (VERDICT r2 #9): waits for the re-eval queue
# marker, then times process-start -> first audio for the three serving
# paths (pallas / warm-cache / conv), one python-with-jax process at a time.
#
# Usage: nohup tools/coldstart_queue.sh > .runs/coldstart.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

REEVAL_LOG=${REEVAL_LOG:-.runs/reeval.log}
COOLDOWN_S=${COOLDOWN_S:-75}
QDIR=.runs/coldstart
mkdir -p "$QDIR"

say() { echo "[coldstart $(date -u +%H:%M:%S)] $*" >&2; }

say "waiting for 'reeval queue complete' in $REEVAL_LOG"
while ! grep -q "reeval queue complete" "$REEVAL_LOG" 2>/dev/null; do
    sleep 30
done
say "reeval done; cooling down ${COOLDOWN_S}s"
sleep "$COOLDOWN_S"

run_step() {  # run_step <name> <timeout_s> <cmd...>
    local name=$1 tmo=$2; shift 2
    say "step $name: $*"
    timeout "$tmo" "$@" > "$QDIR/$name.log" 2>&1
    local rc=$?
    say "step $name exit $rc"
    # CLAUDE.md TPU runtime: a crashed/killed TPU process (timeout kills
    # count) needs a >=120 s quiet period before the next claimant.
    if [ "$rc" -ne 0 ]; then sleep "${CRASH_COOLDOWN_S:-130}"; else sleep "$COOLDOWN_S"; fi
    return 0
}

run_step cold_pallas 1800 python tools/bench_cold_start.py --mode pallas
run_step cold_warm 1200 python tools/bench_cold_start.py --mode warm
run_step cold_conv 2400 python tools/bench_cold_start.py --mode conv

say "coldstart queue complete"
