#!/usr/bin/env bash
# Round-4 measurement queue: waits for the v3 train chain to finish, then
# runs the TPU measurements VERDICT r3 asks for, one python-with-jax process
# at a time (single-tenant TPU; see CLAUDE.md "TPU runtime"):
#
#   warm1/warm2   cold-start reconciliation (r3 #3): leg 1 primes .jax_cache
#                 with the SERVING program (and logs cache misses), leg 2 is
#                 the real warm-start measurement.
#   longform      r3 #5: single-stream 60 s scan with Pallas auto-routing now
#                 live inside the scan body (B=1 chunk programs).
#   chunk_sweep   re-probe chunk size with the Pallas-routed scan body.
#   serving       r3 #6: default-coalescing serving bench (device rate for
#                 8+ concurrent requests out of the box).
#   bench         headline refresh for BENCH_r04.
#
# Usage: nohup tools/measure_queue_r4.sh > .runs/measure_r4.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

CHAIN_LOG=${CHAIN_LOG:-.runs/chain_r4.log}
COOLDOWN_S=${COOLDOWN_S:-90}
QDIR=.runs/measure_r4
mkdir -p "$QDIR"

say() { echo "[measure-r4 $(date -u +%H:%M:%S)] $*" >&2; }

say "waiting for 'chain complete' in $CHAIN_LOG"
while ! grep -q "chain complete" "$CHAIN_LOG" 2>/dev/null; do
    sleep 60
done
say "chain done; cooling down ${COOLDOWN_S}s"
sleep "$COOLDOWN_S"

run_step() {  # run_step <name> <timeout_s> <cmd...>
    local name=$1 tmo=$2; shift 2
    # DEADLINE_TS (epoch seconds): the driver's end-of-round bench needs the
    # single-tenant TPU free — don't START a leg past the deadline, and clamp
    # a leg's timeout so it cannot RUN past it either.
    if [ -n "${DEADLINE_TS:-}" ]; then
        local left=$(( DEADLINE_TS - $(date +%s) ))
        if [ "$left" -le 120 ]; then
            say "step $name SKIPPED (past deadline)"
            return 0
        fi
        if [ "$tmo" -gt "$left" ]; then tmo=$left; fi
    fi
    say "step $name: $*"
    timeout "$tmo" "$@" > "$QDIR/$name.log" 2>&1
    local rc=$?
    say "step $name exit $rc"
    # AUTOCOMMIT=1: the measurement logs live in gitignored .runs/ and a
    # workspace reset between sessions destroys them (it happened to this
    # exact queue on 2026-08-20) — force-track each leg's log as it lands.
    if [ "${AUTOCOMMIT:-0}" = "1" ]; then
        git add -f "$QDIR/$name.log" >/dev/null 2>&1 && \
            git commit -q -m "measure-r4: $name leg log" >/dev/null 2>&1 || true
    fi
    # CLAUDE.md TPU runtime: a crashed/killed TPU process (timeout kills
    # count) needs a >=120 s quiet period before the next claimant.
    if [ "$rc" -ne 0 ]; then sleep "${CRASH_COOLDOWN_S:-130}"; else sleep "$COOLDOWN_S"; fi
    return 0
}

# Leg order = judge-item priority under a deadline: cold-start recipe
# (r3 #3), longform single-stream (r3 #5), serving coalescing row (r3 #6),
# then the secondary chunk sweep and schedule experiments.
run_step warm1 1800 python tools/bench_cold_start.py --mode warm --explain
run_step warm2 1200 python tools/bench_cold_start.py --mode warm
run_step longform 3600 python bench.py --longform
run_step serving 1800 python tools/bench_serving.py --n 16 --frames 400
run_step chunk_sweep 3600 python bench.py --longform --chunk_sweep

# b32 Pallas schedule experiments (headline push): the auto default routes
# b32 to the XLA conv path (Pallas measured -9% there with the b1-tuned
# schedule). These legs test whether a different group/tile schedule beats
# the conv stack at b32; bench.py --one prints step_ms for the 32x128 shape.
run_step pallas_b32_default 1200 env MBEXWN_PALLAS_WN=1 python bench.py --one 32 128
run_step pallas_b32_g2 1200 env MBEXWN_PALLAS_WN=1 MBEXWN_PALLAS_GROUP=2 python bench.py --one 32 128
run_step pallas_b32_t1600 1200 env MBEXWN_PALLAS_WN=1 MBEXWN_PALLAS_TILE=1600 python bench.py --one 32 128
run_step pallas_b32_g2_t1600 1200 env MBEXWN_PALLAS_WN=1 MBEXWN_PALLAS_GROUP=2 MBEXWN_PALLAS_TILE=1600 python bench.py --one 32 128

run_step bench 2400 python bench.py

say "measure-r4 queue complete"
