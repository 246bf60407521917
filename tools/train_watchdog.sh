#!/usr/bin/env bash
# Supervise a long TPU training run through this image's flaky axon relay.
#
# The relay tunnel can die mid-run (observed 2026-08-18): the trainer then
# hangs forever in the PJRT plugin's connect loop with no error and no
# timeout.  This watchdog watches the trainer's log mtime; if the log goes
# quiet for STALL_MIN minutes (the trainer prints every 50 steps ~= 15 s,
# and the longest legitimate silence is the cold fwd+bwd compile), it kills
# the exact PID, waits out the single-tenant cool-down, and relaunches with
# --resume (Orbax checkpoint).  Pure bash: safe to run while a TPU job owns
# the device (never imports jax).
#
# Usage: train_watchdog.sh <pidfile> <logfile> <done_marker> -- <relaunch cmd...>
#   pidfile      file holding the trainer PID (rewritten on relaunch)
#   logfile      trainer's stdout/stderr log (mtime = liveness signal)
#   done_marker  string that appears in the log when the run is complete
set -u

PIDFILE=$1; LOGFILE=$2; DONE_MARKER=$3; shift 3
[ "$1" = "--" ] && shift
RELAUNCH=("$@")

STALL_MIN=${STALL_MIN:-25}      # minutes of log silence => wedged
COOLDOWN_S=${COOLDOWN_S:-130}   # single-tenant cool-down after a kill
MAX_RESTARTS=${MAX_RESTARTS:-12}

restarts=0
while :; do
    sleep 60
    if grep -q "$DONE_MARKER" "$LOGFILE" 2>/dev/null; then
        echo "[watchdog $(date -u +%H:%M:%S)] done marker found; exiting" >&2
        exit 0
    fi
    pid=$(cat "$PIDFILE" 2>/dev/null || echo "")
    alive=false
    [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null && alive=true

    now=$(date +%s)
    mt=$(stat -c %Y "$LOGFILE" 2>/dev/null || echo "$now")
    quiet_min=$(( (now - mt) / 60 ))

    if $alive && [ "$quiet_min" -lt "$STALL_MIN" ]; then
        continue
    fi

    if [ "$restarts" -ge "$MAX_RESTARTS" ]; then
        echo "[watchdog] giving up after $MAX_RESTARTS restarts" >&2
        exit 1
    fi
    restarts=$((restarts + 1))

    if $alive; then
        echo "[watchdog $(date -u +%H:%M:%S)] log quiet ${quiet_min}m (>=${STALL_MIN}m): killing PID $pid (restart $restarts)" >&2
        kill "$pid" 2>/dev/null
        sleep 10
        kill -9 "$pid" 2>/dev/null
    else
        echo "[watchdog $(date -u +%H:%M:%S)] trainer PID $pid not running and no done marker (restart $restarts)" >&2
    fi

    echo "[watchdog] cooling down ${COOLDOWN_S}s (single-tenant TPU)" >&2
    sleep "$COOLDOWN_S"

    echo "[watchdog $(date -u +%H:%M:%S)] relaunching: ${RELAUNCH[*]}" >&2
    nohup "${RELAUNCH[@]}" >> "$LOGFILE" 2>&1 < /dev/null &
    echo $! > "$PIDFILE"
done
